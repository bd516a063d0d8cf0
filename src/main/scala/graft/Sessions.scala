package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory.
  *
  * Mirrors the session tuning the reference applies in both of its drivers
  * (reference: bronze_to_silver.py:7-18, gold_sql_to_postgres.py:8-17):
  * AQE + partition coalescing + skew-join handling, explicit shuffle
  * parallelism, bounded scan splits. Shuffle partitions default to the
  * worker-thread count (local mode) instead of the reference's 200 — on a
  * real cluster this is the knob to raise to ~2-3x total cores.
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** The codegen stability configs EVERY graft entry point (CLI session,
    * bench, verify dump, test harness) must share — one definition, so a
    * tuning change cannot leave one entry point silently running a
    * different cache geometry than the one the bench notes record
    * (round 11 had to edit four copy-pasted blocks in lockstep; never
    * again).
    *
    * - `useIdInClassName=false`: do NOT embed the per-query
    *   codegenStageId in generated class names (SPARK-23032's debugging
    *   aid, on by default). Under AQE the stage numbering depends on
    *   runtime stage-completion ORDER, so re-running the same query
    *   produces byte-identical generated code under a NEW class name →
    *   codegen-cache miss → janino recompile + a fresh interpreter→C2
    *   warmup for every large generated class, every run. For graft's
    *   biggest plans (the dedup sketch pipeline) that was 2-13 s of JIT
    *   per invocation and the intermittent 2x "warm slower than cold"
    *   bench anomaly (rounds 4-6).
    * - `codegen.cache.maxEntries=4000` (static conf — set before the
    *   first session): the default 100-entry cache thrashes for a
    *   long-lived session serving this catalog (Guava's segmented LRU
    *   evicts recently-used entries once near capacity), re-paying
    *   janino+JIT on queries that ran minutes ago. Raised 1000→4000 in
    *   round 11: the full-suite class population (~3.5k) churned the
    *   smaller caches; size this above the distinct generated classes a
    *   long-lived session will serve.
    */
  def withCodegenDefaults(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")

  /** Scale-adaptive shuffle partitioning, shared by EVERY graft entry
    * point (CLI session, Bench, PlanDump) — one definition, like
    * [[withCodegenDefaults]].
    *
    * Partition counts must track shuffle BYTES, not core count (guide
    * §2.2): the r19 driver measured the whole bench FASTER on 8 cores
    * than 32 because `shuffle.partitions = cpus` plus AQE's default
    * `parallelismFirst = true` floor-ed every tiny shuffle at ~32
    * partitions — per-task overhead with no data to amortize it. With
    * `parallelismFirst = false`, AQE coalesces every shuffle read to the
    * advisory byte size (small inputs collapse to a handful of tasks; a
    * 100 TB shuffle keeps partitions at the advisory size, which is
    * exactly what that scale needs too — the same knob, not a local-mode
    * special case). `initialPartitionNum` gives AQE upward headroom
    * beyond the core count so a big shuffle is not stuck at `cpus`
    * partitions before coalescing; both knobs are env-overridable for
    * cluster deployments (raise INIT to ~2-3x total cores there).
    * `spark.sql.shuffle.partitions` stays at `cpus` as the non-AQE
    * fallback so explicit `repartition(conf)` call sites keep their
    * parallelism.
    */
  def withAdaptiveShuffle(b: SparkSession.Builder): SparkSession.Builder = {
    // initialPartitionNum stays at the core count by DEFAULT: raising it
    // to 4x was measured (r20 probes, q114/q102) to cost ~2x executor
    // time per stage at bench SFs — per-stage map-side bucket and AQE
    // bookkeeping overhead with nothing to amortize it. On a cluster
    // where single shuffles exceed cpus x advisory bytes, raise
    // SPARK_GRAFT_SHUFFLE_INIT (the coalesce target is bytes either way).
    val initial = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_INIT", cpus)
    val advisory = sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "67108864")
    b.config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initial)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      // Without this, AQE is suppressed inside CACHED plans (the default
      // preserves a cache's output partitioning for downstream reuse), so
      // every operator pin would materialize at initialPartitionNum
      // partitions and each cache read would pay that many tasks — the r20
      // mid-round bench measured the iterating pinned paths (pagerank,
      // dedup prep) 2x slower from exactly that. Cached frames coalesce by
      // bytes like everything else; no graft operator relies on a cache's
      // physical partitioning.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
  }

  def local(appName: String = "graft"): SparkSession = {
    val spark = withAdaptiveShuffle(withCodegenDefaults(SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new graft.expressions.GraftExtensions))
      .config("spark.sql.files.maxPartitionBytes", "134217728"))
      .config("spark.sql.session.timeZone", "UTC")
      // The driver's `events` table carries TIMESTAMP(NANOS) parquet values,
      // which Spark 4 rejects outright; read them as raw nanos longs instead
      // (Tables.load derives a micros timestamp column from them).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
