package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketches as plain DataFrames — the same move as
  * [[Dedup.bloomWords]]: the sketch is a TABLE built by one
  * map-side-combined aggregate, not driver state or a custom buffer, so it
  * composes with broadcast joins and survives any executor count.
  *
  * Count-min sketch (Cormode & Muthukrishnan 2005): `depth` independent
  * hash rows of `width` counters; a point estimate is the MIN over the
  * item's `depth` cells. Estimates never undercount, and overcount by at
  * most `e·n/width` with probability `1 − e^-depth` — at 100 TB this is
  * the shape for "how often does this token/URL/domain occur" questions
  * where the exact answer needs a vocabulary-sized aggregate but the
  * sketch stays `depth × width` rows (a few MB) regardless of corpus
  * size, and sketches of corpus shards merge by cellwise addition.
  */
object Sketches {

  /** Cell column for `item` in hash row `row` — an independent 64-bit hash
    * per row (the row index rides the hash input), folded to [0, width). */
  private def cmsCell(item: Column, row: Column, width: Int): Column =
    pmod(xxhash64(item, row, lit("graft-cms")), lit(width.toLong)).cast("int")

  /** Build the count-min table over an item column: one row per touched
    * (row, col) cell with its count. One explode (×depth) + one hash
    * aggregate, map-side combined; output ≤ depth·width rows. Shard
    * sketches built with the same dials merge by summing `n` per cell. */
  def cmsTable(items: DataFrame, itemCol: String = "item",
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad dials: depth=$depth width=$width")
    items
      .select(col(itemCol).as("__it"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"), cmsCell(col("__it"), col("row"), width).as("col"))
      .groupBy(col("row"), col("col")).agg(count(lit(1)).as("n"))
  }

  /** Point-estimate lookups: for each distinct value of `itemCol` in
    * `queries`, the count-min estimate `cms_est` under `sketch` (built by
    * [[cmsTable]] with the same `depth`/`width`). The sketch side is
    * ≤ depth·width rows — AQE auto-broadcasts it — so a lookup is `depth`
    * codegen'd projections and a map-side min-regroup per item, no
    * shuffle of the query stream beyond the per-item regroup. */
  def cmsLookup(queries: DataFrame, sketch: DataFrame,
      itemCol: String = "item", depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad dials: depth=$depth width=$width")
    queries
      .select(col(itemCol),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("col", cmsCell(col(itemCol), col("row"), width))
      .join(sketch, Seq("row", "col"), "left")
      // an absent cell was never touched: its counter is 0
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
  }
}
