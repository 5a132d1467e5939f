package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for each left row, the single right row with the
  * greatest `rightTime` ≤ `leftTime` in the same key group (classic
  * quotes-to-trades attachment; DuckDB/kdb `ASOF JOIN`, pandas
  * `merge_asof`). Spark has no native operator for it.
  *
  * Implemented as the scalable union + running-window formulation:
  * tag both sides, union, one window sorted by (time, side) per key group,
  * and carry the last-seen right payload forward with
  * `last(..., ignoreNulls)`. ONE shuffle + sort over left ∪ right — never a
  * range-explode or per-row subquery, so it survives 100 TB exactly like
  * any windowed aggregation (right rows sort before left rows at equal
  * timestamps, so ties match, as in `ON l.ts >= r.ts`).
  *
  * Output: every left row (left schema unchanged) plus each non-key,
  * non-time right column prefixed with `rightPrefix` (NULL when no right
  * row precedes).
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val payloadCols =
      right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val rStruct = struct(payloadCols.map(right(_)): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lCols = left.columns.toSeq

    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__ts"), lit(1).as("__side"),
        struct(lCols.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__ts"), lit(0).as("__side"),
        lit(null).cast(left.select(struct(lCols.map(col): _*).as("l"))
          .schema("l").dataType).as("__l"),
        rStruct.as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    carried.select(
      lCols.map(c => col("__l").getField(c).as(c)) ++
        payloadCols.map(c =>
          col("__match").getField(c).as(rightPrefix + c)): _*)
  }

  /** Forward as-of join: smallest `rightTime` ≥ `leftTime`. Same mechanics
    * with the sort reversed. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "r_"): DataFrame = {
    val payloadCols =
      right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val rStruct = struct(payloadCols.map(right(_)): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lCols = left.columns.toSeq
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__ts"), lit(1).as("__side"),
        struct(lCols.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__ts"), lit(0).as("__side"),
        lit(null).cast(left.select(struct(lCols.map(col): _*).as("l"))
          .schema("l").dataType).as("__l"),
        rStruct.as("__r")): _*)
    // descending time: the "last seen" right row walking backward is the
    // nearest following right row; at equal ts the right row still matches
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        lCols.map(c => col("__l").getField(c).as(c)) ++
          payloadCols.map(c =>
            col("__match").getField(c).as(rightPrefix + c)): _*)
  }
}
