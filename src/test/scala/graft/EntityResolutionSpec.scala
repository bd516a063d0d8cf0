package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityResolution

class EntityResolutionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // Planted typo cluster in block "x": 1↔2 one substitution, 1↔3 two
  // deletions, 2↔3 two edits; 4 is far from all. Block "y" isolates 5
  // from everything (same name as 1 — blocking must keep them apart).
  private val people = Seq(
    (1L, "x", "jane doe"),
    (2L, "x", "jane dow"),
    (3L, "x", "jane d"),
    (4L, "x", "bob smith"),
    (5L, "y", "jane doe")
  ).toDF("id", "blk", "name")

  private def pairs(maxEdit: Int, maxBlock: Int = 4096) =
    EntityResolution.blockedFuzzyPairs(people, "id", "name", Seq("blk"), maxEdit, maxBlock)
      .select("id_a", "id_b", "edit_dist").as[(Long, Long, Int)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap

  test("finds exactly the within-block pairs under the edit budget") {
    assert(pairs(maxEdit = 1) === Map((1L, 2L) -> 1))
    assert(pairs(maxEdit = 2) === Map((1L, 2L) -> 1, (1L, 3L) -> 2, (2L, 3L) -> 2))
  }

  test("blocking separates identical names in different blocks") {
    assert(!pairs(maxEdit = 2).keySet.exists { case (a, b) => Set(a, b).contains(5L) })
  }

  test("sim is 1 - edit/maxlen") {
    val sim = EntityResolution
      .blockedFuzzyPairs(people, "id", "name", Seq("blk"), maxEdit = 2)
      .where($"id_a" === 1L && $"id_b" === 3L)
      .select("sim").as[Double].head()
    assert(math.abs(sim - (1.0 - 2.0 / 8)) < 1e-15) // dist 2, "jane doe" len 8
  }

  test("over-cap blocks are excluded and surfaced by the audit view") {
    assert(pairs(maxEdit = 2, maxBlock = 3) === Map.empty) // block x has 4 members
    val audit = EntityResolution.oversizeBlocks(people, Seq("blk"), maxBlock = 3)
      .as[(String, Long)].collect().toMap
    assert(audit === Map("x" -> 4L))
  }

  test("null block keys do NOT match — the uninformative-key case, oracle-consistent") {
    // a null blocking key carries no grouping information, and the q57
    // oracle's plain `=` join skips nulls: matching them here would make
    // the operator and its oracle diverge on dirty data
    val withNulls = Seq(
      (1L, Option.empty[String], "abc"),
      (2L, Option.empty[String], "abd"),
      (3L, Some("z"), "abc"), (4L, Some("z"), "abd")
    ).toDF("id", "blk", "name")
    val got = EntityResolution
      .blockedFuzzyPairs(withNulls, "id", "name", Seq("blk"), maxEdit = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 4L)), "only the real block matches; null-keyed rows sit out")
    // fuzzyJoin applies the same contract across frames
    val l = Seq((1L, Option.empty[String], "abc"), (2L, Some("z"), "abc")).toDF("lid", "blk", "lname")
    val r = Seq((8L, Option.empty[String], "abc"), (9L, Some("z"), "abc")).toDF("rid", "blk", "rname")
    val xj = EntityResolution.fuzzyJoin(l, r, "lid", "rid", "lname", "rname", Seq("blk"), maxEdit = 1)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(xj === Set((2L, 9L)))
  }

  test("two empty strings match at sim 1.0 — no ANSI divide-by-zero") {
    // normalized() turns whitespace-only names into "", so this shape
    // occurs in real master data
    val blanks = Seq((1L, "b", ""), (2L, "b", "")).toDF("id", "blk", "name")
    val got = EntityResolution
      .blockedFuzzyPairs(blanks, "id", "name", Seq("blk"), maxEdit = 1)
      .select("edit_dist", "sim").as[(Int, Double)].collect().toSeq
    assert(got === Seq((0, 1.0)))
  }

  test("fuzzyJoin matches across frames within blocks") {
    val crm = Seq((10L, "x", "jane doe"), (11L, "y", "mike roe")).toDF("cid", "blk", "cname")
    val got = EntityResolution
      .fuzzyJoin(people, crm, "id", "cid", "name", "cname", Seq("blk"), maxEdit = 1)
      .select("left_id", "right_id", "edit_dist").as[(Long, Long, Int)].collect().toSet
    // block x: 10 matches 1 (0 edits) and 2 (1 edit); 3 is 2 edits away;
    // block y: no name within 1
    assert(got === Set((1L, 10L, 0), (2L, 10L, 1)))
  }

  test("normalized collapses case and whitespace before matching") {
    val raw = Seq((1L, "b", "  Jane   DOE "), (2L, "b", "jane doe")).toDF("id", "blk", "name")
    val canon = raw.withColumn("name", EntityResolution.normalized($"name"))
    val got = EntityResolution
      .blockedFuzzyPairs(canon, "id", "name", Seq("blk"), maxEdit = 0)
      .select("edit_dist").as[Int].collect()
    assert(got.toSeq === Seq(0))
  }

  test("the candidate join is an equi-join on the block key, never a cartesian") {
    val plan = EntityResolution
      .blockedFuzzyPairs(people, "id", "name", Seq("blk"), maxEdit = 2)
      .queryExecution.executedPlan
    val cartesian = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(cartesian.isEmpty, s"expected no cartesian/BNLJ:\n$plan")
  }
}
