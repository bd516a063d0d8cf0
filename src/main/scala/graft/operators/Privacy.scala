package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving transforms for shipping corpora across trust
  * boundaries: salted pseudonymization (consistent tokens that still
  * JOIN — the property plain redaction destroys) and the
  * order-independent corpus checksum that certifies two copies of a
  * table hold identical content without moving either.
  *
  * Scale contract: both are pure codegen'd projections/aggregations —
  * zero shuffles for pseudonymize, one partial-aggregated global agg
  * for the checksum. Nothing leaves whole-stage codegen.
  */
object Privacy {

  /** Salted-hash pseudonym of one value: SHA-256 over `salt ‖ value`,
    * NULL-preserving. Deterministic under a fixed salt, so equal values
    * map to equal tokens — referential integrity (joins, group-bys,
    * dedup) survives the transform while the raw value does not. Rotate
    * the salt per release to break cross-release linkage; keep it
    * secret, or a dictionary attack over a small value domain (emails,
    * ids) inverts the map — this is pseudonymization, not encryption.
    */
  def pseudonym(c: Column, salt: String): Column =
    when(c.isNull, lit(null).cast("string"))
      .otherwise(sha2(concat(lit(salt), c.cast("string")), 256))

  /** Replace each of `cols` in place with its [[pseudonym]]; every other
    * column rides through untouched. One projection, no shuffle.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize needs at least one column")
    val missing = cols.toSet -- df.columns.toSet
    require(missing.isEmpty, s"columns absent from frame: ${missing.mkString(", ")}")
    cols.foldLeft(df)((d, c) => d.withColumn(c, pseudonym(col(c), salt)))
  }

  /** Order-independent content checksum of a table over `cols`: each row
    * serializes canonically (field separator U+0001; NULL marked as U+0002-prefixed,
    * distinctly from the string "null" or ""), hashes through md5, and
    * the top 48 bits SUM into a decimal(38,0) — addition commutes, so
    * any partitioning, ordering, or engine produces the same number.
    * Certifies a replicated/exported corpus copy (two checksums + two
    * counts agree ⇒ content agrees, up to 48-bit-sum collisions) for
    * the cost of one scan and a ~20-byte exchange per task.
    */
  def corpusChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "corpusChecksum needs at least one column")
    val key = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002NULL"))): _*)
    df.select(conv(substring(md5(key), 1, 12), 16, 10).cast("long").as("__h"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__h").cast("decimal(38,0)")).as("checksum"))
  }

  /** k-anonymity / l-diversity audit: one row per equivalence class
    * (distinct quasi-identifier tuple) with its `class_size`, the
    * number of distinct sensitive values observed in it
    * (`n_sensitive`), and the three release-gate flags —
    * `k_anonymous` (≥ k members: the class cannot isolate fewer than
    * k individuals), `l_diverse` (≥ l sensitive values: membership
    * does not reveal the sensitive attribute), and `at_risk` (fails
    * either). Run it BEFORE [[pseudonymize]]-and-ship: pseudonyms
    * protect identifiers, not the quasi-identifier combinations this
    * report measures.
    *
    * NULL is a VALUE here, for both quasi and sensitive columns
    * (grouping semantics, not `COUNT(DISTINCT)` semantics): a class
    * of NULL-countries is still a class, and an all-NULL sensitive
    * column is one observed value, not zero — the conservative
    * reading for a risk audit.
    *
    * Scale shape: two stacked hash aggregations (quasi+sensitive,
    * then quasi) — the classic expansion-free exact distinct count.
    * Both levels partial-aggregate map-side; no `COUNT(DISTINCT)`
    * Expand, no window, no join. Output size = number of classes,
    * which a sane quasi-identifier choice keeps far below the input.
    */
  def kAnonymityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k and l must be positive, got k=$k l=$l")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column '$sensitiveCol' cannot also be a quasi-identifier")
    val quasi = quasiCols.map(col)
    df.groupBy((quasi :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasi: _*)
      .agg(
        sum(col("__n")).cast("long").as("class_size"),
        count(lit(1)).as("n_sensitive"))
      .withColumn("k_anonymous", col("class_size") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
      .withColumn("at_risk", !(col("k_anonymous") && col("l_diverse")))
  }
}
