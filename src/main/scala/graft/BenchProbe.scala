package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Single-query bench prober — the attribution tool the round-11 verdict
  * asked for when a bench number moves with no code change on its path
  * (q05: 0.36 s → 1.21 s between r10 and r11).
  *
  * Replicates Bench.scala's exact session + cache discipline for ONE
  * catalog query, then reports what the headline number cannot: per-pass
  * wall time, per-stage executor-side task time (a SparkListener sums
  * stage task metrics — the split between "the plan costs this" and "the
  * driver/codegen/JVM costs this"), the executed-IO scan report
  * ([[graft.operators.Metrics.scanReport]]), and the formatted physical
  * plan. Run it twice — before/after a suspect commit, or against two
  * query names whose containment relationship makes a timing impossible
  * (q05 inside q06) — and diff the output.
  *
  * Usage: runMain graft.BenchProbe <queryName> [passes=5] [sfDir]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q05_scd2_dim")
    val passes = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = args.lift(2).orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.withCodegenDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = Queries.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))

    // stage-level executor attribution: task time that actually ran on the
    // pool vs the wall clock the bench reports — a gap between the two is
    // driver-side cost (planning, codegen compile, JIT), not the plan
    val stageTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val stageCount = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stageTaskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        stageCount.incrementAndGet()
      }
    })

    def noopWrite(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clear(): Unit = {
      graft.operators.Caches.release(blocking = true)
      spark.catalog.clearCache()
    }

    // same warmup the bench gives every entry
    noopWrite(q.fn(spark, "/root/testdata/sf0.001"))
    clear()

    println(s"== $name @ $sfDir  (cold passes, cache cleared each) ==")
    val times = (1 to passes).map { i =>
      clear()
      stageTaskMs.set(0L); stageCount.set(0L)
      val t0 = System.nanoTime()
      noopWrite(q.fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give them a beat
      Thread.sleep(300)
      println(f"pass $i: wall=$wall%.3f s  stages=${stageCount.get}  executorTaskTime=${stageTaskMs.get / 1000.0}%.3f s (sum across $cpus threads)")
      wall
    }
    println(f"median wall: ${times.sorted.apply(times.size / 2)}%.3f s")

    val df = q.fn(spark, sfDir)
    noopWrite(df)
    println("\n== scanReport (executed IO) ==")
    graft.operators.Metrics.scanReport(df).foreach { s =>
      println(s"  files=${s.filesRead} bytes=${s.bytesRead} rows=${s.rowsOutput} " +
        s"schema=${s.readSchema} pushed=${s.pushedFilters} paths=${s.rootPaths.mkString(",")}")
    }
    println("\n== physical plan ==")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
