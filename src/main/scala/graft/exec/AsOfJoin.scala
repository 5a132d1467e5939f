package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for each left row, the single right row with the
  * greatest `rightTime` ≤ `leftTime` (backward) or smallest ≥ (forward) in
  * the same key group (classic quotes-to-trades attachment; DuckDB/kdb
  * `ASOF JOIN`, pandas `merge_asof`). Spark has no native operator for it.
  *
  * Implemented as the scalable union + running-window formulation:
  * tag both sides, union, one window sorted by (time, side) per key group,
  * and carry the last-seen right payload forward with
  * `last(..., ignoreNulls)`. ONE shuffle + sort over left ∪ right — never a
  * range-explode or per-row subquery, so it survives 100 TB exactly like
  * any windowed aggregation (right rows sort before left rows at equal
  * timestamps, so ties match, as in `ON l.ts >= r.ts`).
  *
  * NULL semantics match SQL `ON l.k = r.k AND l.ts >= r.ts` (and DuckDB
  * ASOF): right rows with a NULL key or NULL timestamp can never satisfy
  * the condition and are dropped from matching; left rows with NULL key or
  * timestamp are kept with a NULL match.
  *
  * Output: every left row (left schema unchanged) plus each non-key,
  * non-time right column prefixed with `rightPrefix` (NULL when no right
  * row qualifies).
  */
object AsOfJoin {

  /** Greatest `rightTime` ≤ `leftTime` per key group. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "r_"): DataFrame =
    join(left, right, keys, leftTime, rightTime, rightPrefix, fwd = false)

  /** Smallest `rightTime` ≥ `leftTime` per key group. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "r_"): DataFrame =
    join(left, right, keys, leftTime, rightTime, rightPrefix, fwd = true)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPrefix: String,
      fwd: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val payloadCols =
      right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val rStruct = struct(payloadCols.map(right(_)): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lCols = left.columns.toSeq
    val lStruct = struct(lCols.map(col): _*)
    val lType = left.select(lStruct.as("l")).schema("l").dataType

    // SQL equality/inequality never holds for NULLs: a NULL-key or NULL-ts
    // left row can match nothing — bypass it (NULL match) rather than let
    // the window's NULL grouping/ordering fabricate matches.
    val lDegenerate = keys.map(col(_).isNull).reduce(_ || _) ||
      col(leftTime).isNull

    val lTagged = left.filter(!lDegenerate).select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__ts"), lit(1).as("__side"),
        lStruct.as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    // NULL-key / NULL-ts right rows can never qualify — drop them.
    val rTagged = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .select(
        keys.map(col) ++ Seq(
          col(rightTime).as("__ts"), lit(0).as("__side"),
          lit(null).cast(lType).as("__l"),
          rStruct.as("__r")): _*)

    // ascending (backward): the last right row at-or-before; descending
    // (forward): walking from the latest time down, the last right row
    // seen is the nearest at-or-after. Right rows (side 0) sort before
    // left rows at equal timestamps, so ties match in both directions.
    val ord = if (fwd) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l"), col("__match"))
    val bypass = left.filter(lDegenerate)
      .select(lStruct.as("__l"), lit(null).cast(rType).as("__match"))

    matched.unionByName(bypass).select(
      lCols.map(c => col("__l").getField(c).as(c)) ++
        payloadCols.map(c =>
          col("__match").getField(c).as(rightPrefix + c)): _*)
  }
}
