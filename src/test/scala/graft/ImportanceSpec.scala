package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Importance

class ImportanceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val B = 16

  /** Driver-side mirror of the bucket hash — independently composed. */
  private def bucket(tok: String): Long = {
    val p = 2147483647L
    tok.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31L + (b & 0xff)) % p) % B
  }

  test("hashedBucketCounts matches a driver-side recompute (incl. multibyte tokens)") {
    val corpus = Seq("alpha beta beta", "gamma Δδ alpha", null, "  ").toDF("text")
    val got = Importance.hashedBucketCounts(corpus, "text", B)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("cnt")).toMap
    val want = Seq("alpha", "beta", "beta", "gamma", "Δδ", "alpha")
      .groupBy(bucket).view.mapValues(_.size.toLong).toMap
    assert(got === want)
  }

  test("pooledImportance: masses and ratio match the recurrence; zero-token docs present with zeros") {
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "gamma gamma"),
      (3L, null.asInstanceOf[String]),
      (4L, "   ")).toDF("doc_id", "text")
    val target = Importance.hashedBucketCounts(docs.where(col("doc_id") === 1L), "text", B)
    val source = Importance.hashedBucketCounts(docs, "text", B)
    val out = Importance.pooledImportance(docs, "doc_id", "text", target, source, B)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("num_mass"), r.getAs[Long]("den_mass"),
          r.getAs[Double]("importance"), r.getAs[Boolean]("selected")))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    // driver recompute
    val tCounts = Seq("alpha", "beta").groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val sCounts = Seq("alpha", "beta", "gamma", "gamma")
      .groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val (ct, cs) = (2L, 4L)
    def masses(toks: Seq[String]): (Long, Long) = (
      toks.map(t => tCounts.getOrElse(bucket(t), 0L) + 1L).sum,
      toks.map(t => sCounts.getOrElse(bucket(t), 0L) + 1L).sum)
    for ((id, toks) <- Seq(1L -> Seq("alpha", "beta"), 2L -> Seq("gamma", "gamma"))) {
      val (n, d) = masses(toks)
      val imp = (n.toDouble * (cs + B)) / (d.toDouble * (ct + B))
      assert(out(id) === ((n, d, imp, imp >= 1.0)), s"doc $id")
    }
    // the target's own doc must score above threshold; pure-source below
    assert(out(1L)._4 === true)
    assert(out(2L)._4 === false)
    // token-less docs: zero masses, importance 0, never selected, never dropped
    assert(out(3L) === ((0L, 0L, 0.0, false)))
    assert(out(4L) === ((0L, 0L, 0.0, false)))
  }

  test("pooledImportance is invariant to input partitioning (exact integer masses)") {
    val docs = (0L until 60L)
      .map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} shared"))
      .toDF("doc_id", "text")
    def run(parts: Int) = {
      val d = docs.repartition(parts)
      val t = Importance.hashedBucketCounts(d.where(col("doc_id") % 2 === 0), "text", B)
      val s = Importance.hashedBucketCounts(d, "text", B)
      Importance.pooledImportance(d, "doc_id", "text", t, s, B)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
    }
    assert(run(1) === run(17))
  }

  test("driftReport: share arithmetic, one-sided buckets count as drift, ranked by |delta|") {
    // a bucket space wide enough that these four tokens land apart (16
    // buckets collide "dd" into "aa" — checked explicitly, the hash is
    // uniform-ish, not collision-free)
    val wideB = 4096
    def bucket(tok: String): Long = {
      val p = 2147483647L
      tok.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31L + (b & 0xff)) % p) % wideB
    }
    assert(Seq("aa", "bb", "cc", "dd").map(bucket).distinct.size === 4)
    val oldC = Seq("aa aa bb", "cc").toDF("text")      // aa:2 bb:1 cc:1, total 4
    val newC = Seq("aa dd dd dd").toDF("text")          // aa:1 dd:3, total 4
    val out = Importance.driftReport(oldC, newC, "text", buckets = wideB, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val byBucket = out.map(t => t._1 -> t).toMap
    // dd appears only in new: old side must report 0, share 0
    val dd = byBucket(bucket("dd"))
    assert(dd._2 === 0L && dd._3 === 3L && dd._4 === 0.0 && dd._5 === 0.75 && dd._6 === 0.75)
    // bb/cc vanish: negative delta
    assert(byBucket(bucket("bb"))._6 === -0.25)
    // aa: 2/4 -> 1/4
    assert(byBucket(bucket("aa"))._6 === 0.25 - 0.5)
    // ranked by |delta| desc, bucket asc
    val resorted = out.sortBy(t => (-math.abs(t._6), t._1))
    assert(out.toSeq === resorted.toSeq)
  }

  test("split build/score (persisted models) equals the fused q106 path at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val fused = Queries.queries("q106_dsir_importance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    val modelPath = Queries.buildDsirModels(spark, dir)
    try {
      val split = Queries.dsirScore(spark, dir, modelPath)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
      // integer bucket counts survive the parquet hop exactly, so the
      // probe face the bench times must be bit-identical to the catalog's
      assert(split === fused)
    } finally {
      import java.nio.file.{Files, Paths}
      val walk = Files.walk(Paths.get(modelPath))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  test("scoring plan: models broadcast, no sort, no corpus-sized join build side") {
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val t = Importance.hashedBucketCounts(docs, "text", B)
    val out = Importance.pooledImportance(docs, "doc_id", "text", t, t, B)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bucket models must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"nothing here may sort-merge:\n$plan")
  }
}
