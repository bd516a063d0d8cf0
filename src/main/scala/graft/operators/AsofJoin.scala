package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-value) join — an operator Spark has no built-in for.
  *
  * For every left row, attach the right-side payload of the latest right
  * row with the same key and `right.time <= left.time` (or `<` in strict
  * mode). The classic implementations are a range join (quadratic blowup
  * within key groups) or a per-key lookup loop (driver-side); this one is
  * the scalable union-window form:
  *
  *   union both sides tagged → one hash exchange on the key → per-key sort
  *   by (time, side) → `last(value, ignoreNulls)` running window → keep
  *   left rows.
  *
  * ONE shuffle of left+right, no join node at all, no per-group blowup —
  * at 100 TB this is the difference between a sort-merge pass and an
  * exploding interval join. AQE skew-splitting applies to the single
  * exchange like any window.
  *
  * Right side should be unique per (keys, timeCol) — pre-aggregate if not,
  * otherwise which payload wins a timestamp tie is undefined.
  */
object AsofJoin {

  private val SideCol = "__graft_asof_side"

  private val PayloadCol = "__graft_asof_payload"

  def lastValueJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valueCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val l = left.withColumn(SideCol, lit(1))
    // The whole right payload rides as ONE struct: the struct itself is the
    // "is a right row" marker (non-null even when every field is null), so
    // last(ignoreNulls) picks the latest right ROW atomically. Filling the
    // value columns independently would skip a matched row whose field is
    // NULL (returning a stale older value) and could mix fields from
    // different right rows.
    val r = right
      .select(
        (keys.map(col) :+ col(timeCol)) :+
          struct(valueCols.map(col): _*).as(PayloadCol): _*)
      .withColumn(SideCol, lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // Non-strict (>=): right rows sort BEFORE left rows at equal time, so a
    // same-instant right row is visible. Strict (>): left first → invisible.
    val sideOrder: Column = if (strict) col(SideCol).desc else col(SideCol).asc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned.withColumn(PayloadCol, last(col(PayloadCol), ignoreNulls = true).over(w))
    val unpacked = valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col(s"$PayloadCol.$c"))
    }
    unpacked.where(col(SideCol) === 1).drop(SideCol, PayloadCol)
  }
}
