package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust numeric quality screening for pipeline inputs: median/MAD
  * (median absolute deviation) outlier detection — the standard
  * data-cleaning pass before a column feeds training statistics, where
  * mean/stddev would be dragged by the very outliers being hunted
  * (Iglewicz & Hoaglin's modified z-score, |0.6745·(x−med)/MAD| > z). */
object NumericQuality {

  /** Per-group robust outlier profile of `valueCol`: n, median, MAD,
    * outlier count and ratio under the modified z-score threshold.
    *
    * Two grouped EXACT percentile passes (the MAD needs the median first)
    * plus a join of the per-group stats back to the rows; group cardinality
    * is small by construction (it's a GROUP profile), so the stats side
    * broadcasts and the data side never shuffles twice. At 100 TB swap
    * `percentile` for `approx_percentile` (GK) — the q30 pattern — and the
    * shape is unchanged. MAD = 0 (≥ half the group identical) flags only
    * exact-median mismatches as outliers would divide by zero; such groups
    * report 0 outliers, the conventional degenerate-MAD behavior. */
  def robustOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
      z: Double = 3.5): DataFrame = {
    require(groupCols.nonEmpty, "robustOutliers needs at least one group col")
    val x = col(valueCol).cast("double")
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(x, lit(0.5)).as("__med"))
    val withMed = df.join(broadcast(med), groupCols)
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg(percentile(abs(x - col("__med")), lit(0.5)).as("__mad"))
    val rz = abs(lit(0.6745) * (x - col("__med")) / col("__mad"))
    withMed.join(broadcast(mad), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        round(first(col("__med")), 4).as("med"),
        round(first(col("__mad")), 4).as("mad"),
        sum(when(col("__mad") > 0 && rz > z, 1L).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_ratio",
        round(col("n_outliers").cast("double") / col("n"), 6))
  }
}
