package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Caches, Graphs}

class GraphsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side mirror of the integer recurrence — the spec's ground
    * truth is the same arithmetic, independently composed.
    */
  private def reference(
      edges: Seq[(Long, Long)],
      ids: Seq[Long],
      iters: Int,
      scale: Long = 1000000L): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = ids.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val inbox = edges
        .map { case (s, d) => d -> rank(s) / outdeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = ids.map(i => i -> (15L * scale / 100L + 85L * inbox.getOrElse(i, 0L) / 100L)).toMap
    }
    rank
  }

  test("pageRankInt matches the integer recurrence exactly; no-inlink nodes settle at base") {
    val ids = (1L to 5L).toSeq
    // 5 is a source (no in-links); 1 has the most in-links
    val edgeList = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 4L), (5L, 1L))
    val edges = edgeList.toDF("src", "dst")
    val nodes = ids.toDF("id")
    val got = Graphs.pageRankInt(edges, "src", "dst", nodes, "id", iters = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    assert(got === reference(edgeList, ids, iters = 4))
    assert(got(5L) === 150000L, "a node nothing links to settles at the damping base")
    assert(got(1L) === got.values.max, "the most-linked node must rank highest")
    Caches.release()
  }

  test("pageRankInt is exactly reproducible under a different physical layout") {
    val edgeList = (0L until 200L).flatMap(i => Seq((i, (i * 7 + 1) % 200), (i, (i * 13 + 3) % 200)))
    val nodes = (0L until 200L).toDF("id")
    def run(parts: Int) = {
      val out = Graphs.pageRankInt(
        edgeList.toDF("src", "dst").repartition(parts), "src", "dst", nodes, "id", iters = 5)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
      Caches.release()
      out
    }
    val a = run(1)
    val b = run(13)
    assert(a === b, "integer rounds cannot depend on partitioning or aggregation order")
    assert(a === reference(edgeList, 0L until 200L, iters = 5))
  }

  test("pageRankInt's prep pin is released by the caller's scope, not leaked") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L).toDF("id")
    val scope = Caches.newScope()
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Graphs.pageRankInt(edges, "src", "dst", nodes, "id", iters = 2, scope = Some(scope))
    out.collect()
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "the prep table must actually be pinned while the result is consumed")
    scope.release(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "scope.release must drop exactly the frames this call pinned")
  }
}
