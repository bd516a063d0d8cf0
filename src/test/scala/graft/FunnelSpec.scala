package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private def run(evs: Seq[(Long, Long, String)]) =
    Funnel.earliestChain(
      evs.toDF("user_id", "ts", "event_type"), "user_id", "ts", "event_type", steps)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("depth"),
          Option(r.getAs[java.lang.Long]("t_1")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t_2")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t_3")).map(_.toLong))))
      .toMap

  test("full chain, partial chain, and wrong-order events") {
    val m = run(Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"), // full
      (2L, 1L, "click"), (2L, 2L, "view"), (2L, 3L, "purchase"), // click precedes its view
      (5L, 9L, "purchase")                                        // never entered
    ))
    assert(m(1L) === ((3, Some(1L), Some(2L), Some(3L))))
    assert(m(2L) === ((1, Some(2L), None, None))) // purchase can't follow a missing click
    assert(!m.contains(5L), "depth-0 users are absent")
  }

  test("steps must be STRICTLY later — a same-instant next step does not count") {
    val m = run(Seq((3L, 5L, "view"), (3L, 5L, "click")))
    assert(m(3L) === ((1, Some(5L), None, None)))
  }

  test("greedy earliest chain maximizes depth (exchange argument witness)") {
    // taking the LATER view (ts 10) would miss the click at 5; earliest
    // chain finds view@1 -> click@5
    val m = run(Seq((6L, 10L, "view"), (6L, 1L, "view"), (6L, 5L, "click")))
    assert(m(6L) === ((2, Some(1L), Some(5L), None)))
  }

  test("non-funnel event types are ignored before the shuffle") {
    val m = run(Seq((7L, 1L, "view"), (7L, 2L, "error"), (7L, 3L, "click")))
    assert(m(7L) === ((2, Some(1L), Some(3L), None)))
  }

  test("conversion counts users at each exact depth") {
    val evs = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "view"), (2L, 2L, "click"),
      (3L, 1L, "view"),
      (4L, 1L, "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversion(evs, "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getAs[Int]("depth") -> r.getAs[Long]("n_users")).toMap
    assert(got === Map(3 -> 1L, 2 -> 1L, 1 -> 2L))
  }

  test("maxStepGap: a step beyond the window is rejected; greedy stays greedy") {
    def runGap(evs: Seq[(Long, Long, String)], gap: Long) =
      Funnel.earliestChain(
        evs.toDF("user_id", "ts", "event_type"), "user_id", "ts", "event_type", steps,
        maxStepGap = Some(gap))
        .collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("depth")).toMap
    val m = runGap(Seq(
      (1L, 10L, "view"), (1L, 15L, "click"), (1L, 100L, "purchase"), // purchase 85 past click
      (2L, 10L, "view"), (2L, 15L, "click"), (2L, 20L, "purchase"),  // all within 10
      // greedy anchors on view@10; click@100 is out of window even though
      // anchoring on the later view@90 would admit it — the documented
      // first-chain convention, matching the chained-min SQL
      (3L, 10L, "view"), (3L, 90L, "view"), (3L, 100L, "click")), gap = 10L)
    assert(m(1L) === 2, "out-of-window purchase must not convert")
    assert(m(2L) === 3, "within-window chain completes")
    assert(m(3L) === 1, "greedy anchors the earliest step 1 (chained-min semantics)")
    // boundary: gap is inclusive (ts - last <= gap)
    val b = runGap(Seq((4L, 0L, "view"), (4L, 10L, "click")), gap = 10L)
    assert(b(4L) === 2, "exactly-at-window step converts")
  }

  test("maxEventsPerUser: over-cap users route to the audit view, not the fold") {
    val evs = (1 to 20).map(i => (9L, i.toLong, "view")) ++
      Seq((1L, 1L, "view"), (1L, 2L, "click"))
    val df = evs.toDF("user_id", "ts", "event_type")
    val m = Funnel.earliestChain(df, "user_id", "ts", "event_type", steps,
      maxEventsPerUser = 10L)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("depth")).toMap
    assert(m === Map(1L -> 2), s"capped user must be excluded: $m")
    val audit = Funnel.oversizeUsers(df, "user_id", "ts", "event_type", steps, 10L)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
    assert(audit.toSeq === Seq((9L, 20L)), "excluded user surfaces with its count")
    // cap counts FUNNEL events only: non-step noise does not trip it
    val noisy = ((1 to 20).map(i => (5L, i.toLong, "error")) ++
      Seq((5L, 1L, "view"))).toDF("user_id", "ts", "event_type")
    val mn = Funnel.earliestChain(noisy, "user_id", "ts", "event_type", steps,
      maxEventsPerUser = 10L)
      .collect().map(r => r.getAs[Long]("user_id")).toSeq
    assert(mn === Seq(5L))
  }

  test("capped funnel still runs on one user-key exchange") {
    val evs = Seq((1L, 1L, "view")).toDF("user_id", "ts", "event_type")
    val plan = Funnel.earliestChain(evs, "user_id", "ts", "event_type", steps,
      maxEventsPerUser = 10L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"occupancy window must reuse the fold's exchange:\n$plan")
  }

  test("graft_funnel SQL aggregate reproduces the DataFrame fold exactly") {
    graft.expressions.GraftFunctions.register(spark)
    // deterministic pseudo-random event soup: ties, wrong orders, noise
    val rnd = new scala.util.Random(42)
    val types = Seq("view", "click", "purchase", "error", "refund")
    val evs = (1 to 2000).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(50).toLong, types(rnd.nextInt(types.size)))
    }
    val df = evs.toDF("user_id", "ts", "event_type")
    df.createOrReplaceTempView("funnel_evs")

    def viaSql(gapClause: String) = spark.sql(
      s"""SELECT user_id, times FROM (
            SELECT user_id,
                   graft_funnel(ts, event_type, array('view','click','purchase')$gapClause) AS times
            FROM funnel_evs GROUP BY user_id)
          WHERE size(times) > 0""")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Seq[Long]]("times")).toMap

    def viaFold(gap: Option[Long]) =
      Funnel.earliestChain(df, "user_id", "ts", "event_type", steps, maxStepGap = gap)
        .collect().map { r =>
          r.getAs[Long]("user_id") ->
            (1 to 3).flatMap(i => Option(r.getAs[java.lang.Long](s"t_$i")).map(_.toLong))
        }.toMap

    assert(viaSql("") === viaFold(None))
    assert(viaSql(", 10") === viaFold(Some(10L)), "windowed variants must agree too")
  }

  test("graft_funnel cap: an over-cap group evaluates to a loud NULL, others unaffected") {
    import org.apache.spark.sql.graft.ColumnBridge
    val evs = ((1 to 20).map(i => (9L, i.toLong, "click")) ++
      Seq((1L, 1L, "view"), (1L, 2L, "click"))).toDF("user_id", "ts", "event_type")
    val agg = graft.expressions.FunnelAgg(
      ColumnBridge.eagerExpression(col("ts")),
      ColumnBridge.eagerExpression(col("event_type")),
      steps, None, maxEvents = 10L)
    val got = evs.groupBy("user_id")
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("times"))
      .collect().map(r => r.getAs[Long]("user_id") -> Option(r.getAs[Seq[Long]]("times"))).toMap
    assert(got(9L).isEmpty, "over-cap group must be NULL, not a truncated answer")
    assert(got(1L) === Some(Seq(1L, 2L)))
  }

  test("one exchange: filter to funnel types rides the scan, fold is per-group") {
    val evs = Seq((1L, 1L, "view")).toDF("user_id", "ts", "event_type")
    val plan = Funnel.earliestChain(evs, "user_id", "ts", "event_type", steps)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"funnel must be a single user-key shuffle:\n$plan")
  }
}
