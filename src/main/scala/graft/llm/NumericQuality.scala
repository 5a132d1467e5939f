package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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
    * broadcasts and the data side never shuffles twice. Exact form so the
    * DuckDB oracle matches bit-for-bit; [[robustOutliersApprox]] is the
    * 100 TB swap-in (same shape, GK sketch medians), gated against this
    * twin by d20. MAD = 0 (≥ half the group identical) flags only
    * exact-median mismatches as outliers would divide by zero; such groups
    * report 0 outliers, the conventional degenerate-MAD behavior. */
  def robustOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
      z: Double = 3.5): DataFrame =
    robustOutliersImpl(df, valueCol, groupCols, z, None)

  /** The 100 TB form of [[robustOutliers]]: both percentile passes ride
    * `approx_percentile` (Greenwald-Khanna summaries — mergeable, map-side
    * partial, O(accuracy) memory per group) instead of `percentile`'s
    * buffer-every-value reducer. Identical output contract; rank error ≤
    * n/accuracy shifts the median/MAD (and hence the outlier cutoff) by at
    * most the local value density around those ranks — d20 gates the drift
    * against the exact twin in-query (the q30 pattern). */
  def robustOutliersApprox(df: DataFrame, valueCol: String,
      groupCols: Seq[String], z: Double = 3.5,
      accuracy: Int = 10000): DataFrame = {
    require(accuracy >= 100, s"accuracy too coarse: $accuracy")
    robustOutliersImpl(df, valueCol, groupCols, z, Some(accuracy))
  }

  private def robustOutliersImpl(df: DataFrame, valueCol: String,
      groupCols: Seq[String], z: Double, accuracy: Option[Int]): DataFrame = {
    require(groupCols.nonEmpty, "robustOutliers needs at least one group col")
    val x = col(valueCol).cast("double")
    def median(c: Column): Column = accuracy match {
      case None => percentile(c, lit(0.5))
      case Some(a) => approx_percentile(c, lit(0.5), lit(a))
    }
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(median(x).as("__med"))
    val withMed = df.join(broadcast(med), groupCols)
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg(median(abs(x - col("__med"))).as("__mad"))
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
