package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool: dumps the EXECUTED (AQE-final)
  * `explain("formatted")` plan of every frame-shaped bench entry to
  * `<outDir>/<entry>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/r{N}/.
  *
  * Usage: runMain graft.PlanDump <suffix> <outDir>   (both REQUIRED —
  * a round-baked default outDir silently overwrote the previous round's
  * committed evidence; ADVICE r19). Exits non-zero if any entry's dump
  * failed, so a half-failed pass cannot read as success to a driver
  * script.
  *
  * Each frame is executed once (`toRdd.foreach`, nothing collected) so the
  * dumped plan is the final adaptive plan with runtime join strategies and
  * AQEShuffleRead nodes, not the `isFinalPlan=false` estimate. Probe
  * entries run against a standing index built untimed first, exactly like
  * Bench. Build entries write indexes rather than returning one frame, so
  * they have no single plan to dump — their internal shapes are probed via
  * BenchProbe / targeted dumps when touched.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.PlanDump <suffix> <outDir> — both required (a default " +
        "outDir silently overwrites the previous round's committed plans)")
    val suffix = args(0)
    val outDir = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.withAdaptiveShuffle(
      Sessions.withCodegenDefaults(SparkSession.builder())
        .master(s"local[$cpus]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val standing = scala.collection.mutable.Map.empty[String, String]
    def idx(kind: String, build: => String): String =
      standing.getOrElseUpdate(kind, build)

    val servingSplit = Set(
      "q84_text_index_search", "q65b_ann_index_dedup_pq", "q106_dsir_importance")
    val entries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Queries.headlines.filterNot(q => servingSplit(q.name)).map(q => (q.name, q.fn)) ++ Seq(
        ("q84_probe", (s: SparkSession, d: String) =>
          Queries.textIndexProbe(s, idx("text", Queries.buildTextIndexBatches(s, d)))),
        ("q65b_probe", (s: SparkSession, d: String) =>
          Queries.annPqProbe(s, d, idx("ann", Queries.buildAnnPqIndex(s, d)))),
        ("q65b_auto_probe", (s: SparkSession, d: String) =>
          Queries.annPqAutoProbe(s, d, idx("annauto", Queries.buildAnnPqAutoIndex(s, d)))),
        ("q65b_imi_probe", (s: SparkSession, d: String) =>
          Queries.annPqAutoProbe(s, d, idx("annimi", Queries.buildAnnPqImiIndex(s, d)))),
        ("q65k_bulk_probe", (s: SparkSession, d: String) =>
          Queries.annBulkProbe(s, d, idx("annbulk", Queries.buildAnnBulkIndex(s, d)))),
        ("q106_probe", (s: SparkSession, d: String) =>
          Queries.dsirScore(s, d, idx("dsir", Queries.buildDsirModels(s, d)))),
        ("q123_media_near_dup", (s: SparkSession, d: String) =>
          Queries.mediaNearDupFull(s, d)))

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    var failed = List.empty[String]
    entries.foreach { case (name, fn) =>
      graft.operators.Caches.release(blocking = true)
      spark.catalog.clearCache()
      try {
        val df = fn(spark, sfDir)
        df.queryExecution.toRdd.foreach(_ => ())
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch {
        case ex: Throwable =>
          failed ::= name
          System.err.println(s"[plandump] $name FAILED: ${ex.getMessage}")
      }
    }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[plandump] FAILED entries: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
  }
}
