package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JoinAdvisor
import graft.operators.JoinAdvisor.CmParams

class JoinAdvisorSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val params = CmParams(
    width = 256,
    rows = Seq((1103515245L, 12345L), (214013L, 2531011L), (69069L, 1L)))

  private def exactJoinRows(
      l: org.apache.spark.sql.DataFrame, lk: String,
      r: org.apache.spark.sql.DataFrame, rk: String): Long =
    l.join(r, l(lk) === r(rk)).count()

  private def est(
      l: org.apache.spark.sql.DataFrame, lk: String,
      r: org.apache.spark.sql.DataFrame, rk: String,
      p: CmParams = params): BigDecimal =
    BigDecimal(JoinAdvisor.estimateEquiJoinRows(l, lk, r, rk, p)
      .collect()(0).getDecimal(0))

  test("cmSketch: bounded size, mass = non-null rows per depth row") {
    val df = (1 to 500).map(i => i % 37).toDF("k")
      .unionAll(Seq.empty[Int].toDF("k")) // exercise empty-union path too
    val sk = JoinAdvisor.cmSketch(df, "k", params).collect()
    assert(sk.length <= params.depth * params.width)
    val byD = sk.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(byD.toMap === Map(0 -> 500L, 1 -> 500L, 2 -> 500L))
  }

  test("cmSketch drops NULL keys — they cannot join") {
    val df = Seq(Some(1), None, Some(2), None).toDF("k")
    val sk = JoinAdvisor.cmSketch(df, "k", params)
    assert(sk.agg(sum("cnt")).collect()(0).getLong(0) === 2L * params.depth)
  }

  test("estimate is NEVER below the exact inner-join count (overestimate law)") {
    // skewed + uniform mix, several key overlaps
    val l = ((1 to 300).map(i => i % 50) ++ Seq.fill(200)(7)).toDF("k")
    val r = ((1 to 400).map(i => i % 80) ++ Seq.fill(100)(7)).toDF("k")
    val exact = exactJoinRows(l, "k", r, "k")
    assert(exact > 0)
    assert(est(l, "k", r, "k") >= BigDecimal(exact))
  }

  test("estimate is exact when width exceeds the key domain (no collisions possible... per row)") {
    // 16 distinct keys, width 4096: collisions vanishingly unlikely under
    // three independent rows — and min-of-rows takes the collision-free one
    val l = (1 to 160).map(i => i % 16).toDF("k")
    val r = (1 to 80).map(i => i % 16).toDF("k")
    val exact = exactJoinRows(l, "k", r, "k")
    val e = est(l, "k", r, "k", CmParams(4096, params.rows))
    assert(e === BigDecimal(exact))
  }

  test("disjoint key sets estimate can reach zero; empty side estimates exactly zero") {
    val l = Seq(1, 2, 3).toDF("k")
    val r = Seq(100001, 100002).toDF("k")
    // disjoint ⇒ exact 0; estimate ≥ 0 and small (collision products only —
    // a depth row with NO bucket overlap contributes ip = 0 and wins the min)
    assert(est(l, "k", r, "k", CmParams(4096, params.rows)) <= BigDecimal(3 * 2))
    val empty = Seq.empty[Int].toDF("k")
    // an empty side proves the join empty: the estimate is 0, never NULL
    assert(est(l, "k", empty, "k") === BigDecimal(0))
    assert(est(empty, "k", l, "k") === BigDecimal(0))
  }

  test("keyProducts: exact per-key join contribution, both-side keys only") {
    val l = Seq("a", "a", "a", "b", "c").toDF("k")
    val r = Seq("a", "b", "b", "x").toDF("k")
    val kp = JoinAdvisor.keyProducts(l, "k", r, "k")
      .orderBy("key").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getDecimal(3).longValueExact()))
    assert(kp.toSeq === Seq(("a", 3L, 1L, 3L), ("b", 1L, 2L, 2L)))
    // Σ products = exact inner-join size
    assert(kp.map(_._4).sum === exactJoinRows(l, "k", r, "k"))
  }

  test("advise: broadcast branch — smaller side under threshold wins, left priority on tie-eligible sides") {
    val small = (1 to 10).map(i => i % 5).toDF("k")
    val big = (1 to 1000).map(i => i % 5).toDF("k")
    val rec = JoinAdvisor.advise(small, "k", big, "k", params,
      broadcastRowsMax = 50, saltProductMin = 10L)
      .select("recommended").collect()(0).getString(0)
    assert(rec === "broadcast_left")
    val rec2 = JoinAdvisor.advise(big, "k", small, "k", params,
      broadcastRowsMax = 50, saltProductMin = 10L)
      .select("recommended").collect()(0).getString(0)
    assert(rec2 === "broadcast_right")
  }

  test("advise: salt branch fires on the hot key; hot_key tie-break is MIN key") {
    val l = (Seq.fill(100)("hot") ++ Seq.fill(100)("hot2") ++ Seq("cold")).toDF("k")
    val r = (Seq.fill(100)("hot") ++ Seq.fill(100)("hot2") ++ Seq("cold")).toDF("k")
    val row = JoinAdvisor.advise(l, "k", r, "k", params,
      broadcastRowsMax = 10, saltProductMin = 10000L).collect()(0)
    assert(row.getAs[String]("recommended") === "salt_hot_keys")
    // hot and hot2 both produce 10000; min key breaks the tie deterministically
    assert(row.getAs[String]("hot_key") === "hot")
    assert(BigDecimal(row.getAs[java.math.BigDecimal]("max_key_product")) === BigDecimal(10000))
  }

  test("advise: shuffle fallback + empty key intersection reports product 0, NULL hot key") {
    val l = (1 to 100).map(_.toString).toDF("k")
    val r = (200 to 300).map(_.toString).toDF("k")
    val row = JoinAdvisor.advise(l, "k", r, "k", params,
      broadcastRowsMax = 10, saltProductMin = 10L).collect()(0)
    assert(row.getAs[String]("recommended") === "shuffle_hash")
    assert(BigDecimal(row.getAs[java.math.BigDecimal]("max_key_product")) === BigDecimal(0))
    assert(row.getAs[String]("hot_key") === null)
  }

  test("advise report fields are exact where they claim exactness") {
    val l = Seq(1, 1, 2, 3).toDF("k")
    val r = Seq(1, 2, 2, 9, 9).toDF("k")
    val row = JoinAdvisor.advise(l, "k", r, "k", CmParams(4096, params.rows),
      broadcastRowsMax = 1000, saltProductMin = 1000000L).collect()(0)
    assert(row.getAs[Long]("left_rows") === 4L)
    assert(row.getAs[Long]("right_rows") === 5L)
    assert(row.getAs[Long]("left_keys") === 3L)
    assert(row.getAs[Long]("right_keys") === 3L)
    // keys 1 (2·1) and 2 (1·2) tie at 2 → min key "1"
    assert(row.getAs[String]("hot_key") === "1")
    assert(BigDecimal(row.getAs[java.math.BigDecimal]("max_key_product")) === BigDecimal(2))
  }

  // --- executeAdvised: every strategy computes the SAME join ---

  private def plainJoin(
      l: org.apache.spark.sql.DataFrame, lk: String,
      r: org.apache.spark.sql.DataFrame, rk: String): Set[(Int, Int, Int, String)] =
    l.join(r, l(lk) === r(rk)).collect()
      .map(row => (row.getInt(0), row.getInt(1), row.getInt(2), row.getString(3))).toSet

  test("executeAdvised: all three live branches return the identical inner join") {
    val left = (1 to 200).map(i => (i % 23, i)).toDF("lk", "lv")
    val right = (1 to 60).map(i => (i % 23, s"r$i")).toDF("rk", "rv")
    val expected = plainJoin(left, "lk", right, "rk")
    def run(bc: Long, salt: Long): (String, Set[(Int, Int, Int, String)]) = {
      val aj = JoinAdvisor.executeAdvised(left, "lk", right, "rk", params,
        broadcastRowsMax = bc, saltProductMin = salt, saltFactor = 4)
      (aj.strategy,
        aj.df.collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet)
    }
    val (s1, r1) = run(bc = 1000, salt = 1000000L) // left smaller? no: 200 > 60 → broadcast_right? left_rows=200<=1000 and <=right? 200>60 → not; right 60<=1000 → broadcast_right
    assert(s1 === "broadcast_right" && r1 === expected)
    val (s2, r2) = run(bc = 10, salt = 50L) // neither fits; hot product 9·3=27 < 50? compute: keys 0..22, products ~ (9±)(3±) ≈ 27 ≥ 50? no → but salt=50 → some product? keys 1..22 have ⌈200/23⌉·⌈60/23⌉; max 9·3=27 < 50 → shuffle
    assert(s2 === "shuffle_hash" && r2 === expected)
    val (s3, r3) = run(bc = 10, salt = 20L) // 27 ≥ 20 → salted
    assert(s3 === "salt_hot_keys" && r3 === expected)
    val (s4, r4) = {
      val aj = JoinAdvisor.executeAdvised(right.limit(5), "rk", left, "lk",
        params, broadcastRowsMax = 10, saltProductMin = 1000000L)
      (aj.strategy, aj.df.count())
    }
    assert(s4 === "broadcast_left")
    assert(r4 === plainJoin(left, "lk", right.limit(5), "rk").size)
  }

  test("executeAdvised: broadcast branch actually plans a broadcast join") {
    val left = (1 to 500).map(i => (i % 7, i)).toDF("lk", "lv")
    val right = (1 to 5).map(i => (i, s"r$i")).toDF("rk", "rv")
    val aj = JoinAdvisor.executeAdvised(left, "lk", right, "rk", params,
      broadcastRowsMax = 100, saltProductMin = 1000000L)
    assert(aj.strategy === "broadcast_right")
    assert(aj.df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("executeAdvised refuses colliding column names") {
    val l = Seq((1, "x")).toDF("k", "shared")
    val r = Seq((1, "y")).toDF("k2", "shared")
    val e = intercept[IllegalArgumentException] {
      JoinAdvisor.executeAdvised(l, "k", r, "k2", params)
    }
    assert(e.getMessage.contains("shared"))
  }

  // --- persisted sketch store: sketch once, estimate forever ---

  test("sketch store: sharded estimate equals the whole-table estimate bit-for-bit") {
    val l = (1 to 400).map(i => i % 61).toDF("k")
    val r = (1 to 300).map(i => i % 47).toDF("k")
    val whole = est(l, "k", r, "k")
    val base = java.nio.file.Files.createTempDirectory("ja_store").toString
    JoinAdvisor.writeSketchShard(l.where($"k" < 30), "k", params, s"$base/l", "lo")
    JoinAdvisor.writeSketchShard(l.where($"k" >= 30), "k", params, s"$base/l", "hi")
    JoinAdvisor.writeSketchShard(r.where($"k" % 3 === 0), "k", params, s"$base/r", "a")
    JoinAdvisor.writeSketchShard(r.where($"k" % 3 === 1), "k", params, s"$base/r", "b")
    JoinAdvisor.writeSketchShard(r.where($"k" % 3 === 2), "k", params, s"$base/r", "c")
    val fromStore = BigDecimal(
      JoinAdvisor.estimateFromStores(spark, s"$base/l", s"$base/r", params)
        .collect()(0).getDecimal(0))
    assert(fromStore === whole)
    // re-ingesting a shard is idempotent (overwrite, not append)
    JoinAdvisor.writeSketchShard(l.where($"k" < 30), "k", params, s"$base/l", "lo")
    val again = BigDecimal(
      JoinAdvisor.estimateFromStores(spark, s"$base/l", s"$base/r", params)
        .collect()(0).getDecimal(0))
    assert(again === whole)
  }

  test("sketch store refuses mixed or mismatched geometry") {
    val df = (1 to 50).toDF("k")
    val base = java.nio.file.Files.createTempDirectory("ja_geo").toString
    JoinAdvisor.writeSketchShard(df, "k", params, s"$base/s", "one")
    JoinAdvisor.writeSketchShard(df, "k", CmParams(128, params.rows), s"$base/s", "two")
    val e = intercept[IllegalArgumentException] {
      JoinAdvisor.mergeSketchStore(spark, s"$base/s")
    }
    assert(e.getMessage.contains("mixes geometries"))
    val clean = java.nio.file.Files.createTempDirectory("ja_geo2").toString
    JoinAdvisor.writeSketchShard(df, "k", params, s"$clean/s", "one")
    val e2 = intercept[IllegalArgumentException] {
      JoinAdvisor.estimateFromStores(spark, s"$clean/s", s"$clean/s",
        CmParams(128, params.rows))
    }
    assert(e2.getMessage.contains("geometry"))
  }

  test("executeAdvised salts the side whose worst key is heavier — results identical either way") {
    // hot-key multiplicity lives on the RIGHT: salting the left would
    // replicate for zero relief; whichever side is salted, the join is
    // the same join
    val l = ((1 to 40).map(i => (i % 20, i)) :+ ((7, 999))).toDF("lk", "lv")
    val r = ((1 to 30).map(i => (i % 20, s"r$i")) ++ Seq.fill(500)((7, "hot"))).toDF("rk", "rv")
    val expected = plainJoin(l, "lk", r, "rk")
    val aj = JoinAdvisor.executeAdvised(l, "lk", r, "rk", params,
      broadcastRowsMax = 5, saltProductMin = 100L, saltFactor = 4)
    assert(aj.strategy === "salt_hot_keys")
    assert(aj.df.collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getInt(2), x.getString(3))).toSet === expected)
  }

  test("advise: key-count-weighted estimate equals the raw-scan estimate value-for-value") {
    val l = ((1 to 300).map(i => i % 50) ++ Seq.fill(100)(7)).toDF("k")
    val r = ((1 to 200).map(i => i % 80) ++ Seq.fill(50)(7)).toDF("k")
    val viaAdvise = BigDecimal(
      JoinAdvisor.advise(l, "k", r, "k", params,
        broadcastRowsMax = 1L, saltProductMin = Long.MaxValue)
        .collect()(0).getAs[java.math.BigDecimal]("est_join_rows"))
    graft.operators.Caches.release()
    assert(viaAdvise === est(l, "k", r, "k"),
      "weighting each distinct key's bucket by its count must land the same counters")
  }

  test("advise: an empty side reports 0 rows (not NULL) and still recommends deterministically") {
    val empty = Seq.empty[Int].toDF("k")
    val r = (1 to 50).toDF("k")
    val row = JoinAdvisor.advise(empty, "k", r, "k", params,
      broadcastRowsMax = 10, saltProductMin = 10L).collect()(0)
    graft.operators.Caches.release()
    assert(row.getAs[Long]("left_rows") === 0L)
    assert(row.getAs[String]("recommended") === "broadcast_left")
    assert(BigDecimal(row.getAs[java.math.BigDecimal]("est_join_rows")) === BigDecimal(0))
  }

  test("cmSketch plan: partial aggregation BEFORE the exchange (wire carries counters, not rows)") {
    val sk = JoinAdvisor.cmSketch((1 to 1000).map(_ % 61).toDF("k"), "k", params)
    val plan = sk.queryExecution.executedPlan.toString
    // the explode fans every row depth×, so the partial HashAggregate must
    // sit under the Exchange — otherwise the shuffle carries depth·N rows
    // instead of ≤ depth·width per partition
    val exchangeAt = plan.indexOf("Exchange")
    val partialAt = plan.indexOf("partial_sum")
    assert(exchangeAt >= 0 && partialAt >= 0 && partialAt > exchangeAt,
      s"partial aggregate must be the exchange's CHILD (printed below it):\n$plan")
  }

  test("estimate agrees across repartitionings (order/partition independence)") {
    val l = (1 to 777).map(i => i % 91).toDF("k")
    val r = (1 to 555).map(i => i % 37).toDF("k")
    val a = est(l, "k", r, "k")
    val b = est(l.repartition(17), "k", r.repartition(3), "k")
    assert(a === b)
  }
}
