object ProbeMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.Sessions.local("probe")
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val n = 500
    val edges = docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 7 + 3, lit(n)).as("dst"))
      .union(docs.select(col("doc_id").as("src"), pmod(col("doc_id") * 13 + 1, lit(n)).as("dst")))

    // variant without pin: same recurrence, rely on exchange reuse
    def pageRankNoPin(iters: Int, scale: Long): org.apache.spark.sql.DataFrame = {
      val e = edges.select(col("src").as("__src"), col("dst").as("__dst"))
        .join(edges.groupBy(col("src").as("__osrc")).agg(count(lit(1)).as("__outdeg")),
          col("__src") === col("__osrc"))
        .select("__src", "__dst", "__outdeg")
      val ids = docs.select(col("doc_id").as("__id"))
      var rank = ids.select(col("__id"), lit(scale).as("__rank"))
      for (_ <- 1 to iters) {
        val inbox = e.join(rank, col("__src") === col("__id"))
          .select(col("__dst"), expr("__rank div __outdeg").as("__contrib"))
          .groupBy(col("__dst")).agg(sum("__contrib").as("__agg"))
        rank = ids.join(inbox, col("__id") === col("__dst"), "left")
          .select(col("__id"),
            (lit(15L * scale / 100L) + expr(s"(85 * coalesce(__agg, 0L)) div 100")).as("__rank"))
      }
      rank
    }

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm
    pageRankNoPin(5, 1000000L).write.format("noop").mode("overwrite").save()
    graft.operators.Caches.release(blocking = true); spark.catalog.clearCache()
    time("noPin")(pageRankNoPin(5, 1000000L).write.format("noop").mode("overwrite").save())
    time("pinned")(graft.operators.Graphs.pageRankInt(edges, "src", "dst", docs, "doc_id", 5)
      .write.format("noop").mode("overwrite").save())
    graft.operators.Caches.release(blocking = true)
    val plan = pageRankNoPin(5, 1000000L)
    plan.write.format("noop").mode("overwrite").save()
    val s = plan.queryExecution.executedPlan.toString
    println("ReusedExchange occurrences: " + "ReusedExchange".r.findAllIn(s).size)
    println("Exchange occurrences: " + "Exchange".r.findAllIn(s).size)
    spark.stop()
  }
}
