import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

// temporary measurement probe — delete before committing
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    val dir = "/root/testdata/sf0.1"
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        taskMs.addAndGet(m.executorRunTime)
        stageLog.add(f"    stage ${sc.stageInfo.stageId}%3d run=${m.executorRunTime / 1e3}%8.3f s  cpu=${m.executorCpuTime / 1e9}%8.3f s  gc=${m.jvmGCTime / 1e3}%6.3f s  tasks=${sc.stageInfo.numTasks}%4d  ${sc.stageInfo.name.take(60)}")
      }
    })
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def step(name: String)(f: => Unit): Unit = {
      graft.operators.Caches.release(blocking = true)
      spark.catalog.clearCache()
      taskMs.set(0L)
      val t0 = System.nanoTime()
      f
      Thread.sleep(300) // let the listener bus drain
      println(f"[probe] $name%-28s wall=${(System.nanoTime() - t0) / 1e9}%.3f s  executor=${taskMs.get() / 1e3}%.3f s")
      stageLog.forEach(s => println(s))
      stageLog.clear()
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").where(col("text").isNotNull)
    val toks = graft.functions.text.tokens(col("text"))
    val mutated = docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(toks, lit(2), size(toks))).as("text"))
    val corpus = docs.unionByName(mutated)

    // warm one full pass first (JIT/codegen)
    step("warmup full q25")(noop(graft.operators.Dedup.minHashDedupPairs(
      corpus, "text", "doc_id", numPerm = 64, bands = 16, threshold = 0.5)))

    step("corpus only")(noop(corpus))
    step("shingles")(noop(corpus.select(col("doc_id"),
      graft.operators.Dedup.shingleHashes(col("text"), 3).as("sh"))))
    step("shingles+minhash")(noop(corpus.select(col("doc_id"),
      graft.operators.Dedup.shingleHashes(col("text"), 3).as("sh"))
      .withColumn("mh", graft.operators.Dedup.minHashFromHashes(col("sh"), 64))))
    step("candidates (band+join)")(noop(graft.operators.Dedup.minHashCandidates(
      corpus, "text", "doc_id", numPerm = 64, bands = 16, maxBucket = 256)))
    step("full q25")(noop(graft.operators.Dedup.minHashDedupPairs(
      corpus, "text", "doc_id", numPerm = 64, bands = 16, threshold = 0.5)))
    step("full q25 again")(noop(graft.operators.Dedup.minHashDedupPairs(
      corpus, "text", "doc_id", numPerm = 64, bands = 16, threshold = 0.5)))

    // bisect the candidate chain piece by piece (fresh pin each step)
    def freshPrep() = {
      graft.operators.Caches.release(blocking = true)
      spark.catalog.clearCache()
      graft.operators.Caches.pin(corpus.select(col("doc_id").as("id"),
        graft.operators.Dedup.shingleHashes(col("text"), 3).as("sh"))
        .withColumn("mh", graft.operators.Dedup.minHashFromHashes(col("sh"), 64)))
    }
    def bandedOf(p: org.apache.spark.sql.DataFrame) =
      p.where(col("sh").isNotNull && size(col("sh")) > 0)
        .select(col("id"), explode(transform(sequence(lit(0), lit(15)),
          b => struct(b.as("band"),
            xxhash64(slice(col("mh"), b * 4 + 1, lit(4))).as("bucket")))).as("bb"))
        .select(col("id"), col("bb.band"), col("bb.bucket"))
    def freshPrep32() = {
      graft.operators.Caches.release(blocking = true)
      spark.catalog.clearCache()
      graft.operators.Caches.pin(corpus.repartition(32).select(col("doc_id").as("id"),
        graft.operators.Dedup.shingleHashes(col("text"), 3).as("sh"))
        .withColumn("mh", graft.operators.Dedup.minHashFromHashes(col("sh"), 64)))
    }
    (1 to 10).foreach { n =>
    step(s"e32 #$n: e over repartition(32)") { val p = freshPrep32()
      val occ = bandedOf(p).withColumn("__occ", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      val cold = occ.where(col("__occ") <= 256)
      val j = cold.select(col("band"), col("bucket"), col("id").as("id_a"))
        .join(cold.select(col("band"), col("bucket"), col("id").as("id_b")), Seq("band", "bucket"))
        .where(col("id_a") < col("id_b"))
      noop(j.select("id_a", "id_b").distinct()) } }
    step("a: prep only") { val p = freshPrep(); noop(p) }
    step("b: banded") { val p = freshPrep(); noop(bandedOf(p)) }
    step("c: banded+occ window") { val p = freshPrep()
      noop(bandedOf(p).withColumn("__occ", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))) }
    step("d: c + self-join raw") { val p = freshPrep()
      val occ = bandedOf(p).withColumn("__occ", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      val cold = occ.where(col("__occ") <= 256)
      val j = cold.select(col("band"), col("bucket"), col("id").as("id_a"))
        .join(cold.select(col("band"), col("bucket"), col("id").as("id_b")), Seq("band", "bucket"))
        .where(col("id_a") < col("id_b"))
      noop(j) }
    step("e: d + distinct") { val p = freshPrep()
      val occ = bandedOf(p).withColumn("__occ", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      val cold = occ.where(col("__occ") <= 256)
      val j = cold.select(col("band"), col("bucket"), col("id").as("id_a"))
        .join(cold.select(col("band"), col("bucket"), col("id").as("id_b")), Seq("band", "bucket"))
        .where(col("id_a") < col("id_b"))
      noop(j.select("id_a", "id_b").distinct()) }
    spark.stop()
  }
}
