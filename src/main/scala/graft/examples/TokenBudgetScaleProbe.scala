package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Tables, Verify}
import graft.llm.{Sampling, TextOps}

/** Scale-shape probe for the decomposed [[Sampling.tokenBudget]]
  * (PackScaleProbe-style, 10× the bench corpus): a 2-stratum corpus where
  * one stratum holds ~90% of the rows AND its quality score is forced
  * MODAL (rounded to one band), the worst case the decomposition exists
  * for — the old `sum over (partition by stratum)` form sorts the whole
  * 90% stratum in one task, and without tie buckets even the decomposed
  * boundary group is nearly that big.
  *
  * Reports, for each form (window / decomposed / decomposed+bucket):
  * wall-clock, kept rows (must be identical), and the size of the largest
  * single-task window sort (stratum size / boundary score-group size /
  * boundary bucket size).
  */
object TokenBudgetScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val copies = 10
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000000L).selectExpr("sum(id)").collect()

    val base = Tables.t(spark, dir, "documents")
    val nDocs = base.count()
    val docs = (0 until copies).map { i =>
      base.select((col("doc_id") + lit(i * nDocs)).as("doc_id"),
        col("text"), col("lang"))
    }.reduce(_ unionByName _)
      .select(col("doc_id"),
        // 90/10 split into two strata
        when(col("doc_id") % 10 < 9, lit("en")).otherwise(lit("xx")).as("g"),
        // MODAL score: quality rounded to 1 decimal — a handful of bands,
        // so the boundary band holds a large slice of the big stratum
        round(TextOps.qualityScore(col("text")), 1).as("score"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
      .localCheckpoint()
    val n = docs.count()
    // budget chosen to land INSIDE the big stratum's modal band: ~40% of
    // stratum-en's total tokens
    val budget = docs.filter(col("g") === "en")
      .agg((sum(col("n_tok")) * 0.4).cast("long")).collect()(0).getLong(0)
    println(s"[tokbudget] corpus: $n docs, budget=$budget tokens")

    def time(name: String, df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val k = df.count()
      println(f"[tokbudget] $name%-18s kept=$k%8d  " +
        f"${(System.nanoTime() - t0) / 1e9}%6.1f s")
      k
    }
    val wWin = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val nOld = time("window form", docs
      .withColumn("__c", sum(col("n_tok")).over(wWin))
      .filter(col("__c") <= budget).drop("__c"))
    val nNew = time("decomposed", Sampling.tokenBudget(docs, col("g"),
      col("n_tok"), col("score"), col("doc_id"), budget))
    val bucket = floor(col("doc_id") / 8192)
    val nBkt = time("decomposed+bucket", Sampling.tokenBudget(docs, col("g"),
      col("n_tok"), col("score"), col("doc_id"), budget,
      tieBucket = Some(bucket)))

    // the largest single-task sort each form pays
    val stratumMax = docs.groupBy(col("g")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    val bandMax = docs.groupBy(col("g"), col("score")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    val cellMax = docs.groupBy(col("g"), col("score"), bucket).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    println(f"[tokbudget] identical=${nOld == nNew && nOld == nBkt}  " +
      f"max_window_task_rows: window=$stratumMax (90%% stratum), " +
      f"decomposed=$bandMax (modal score band), bucketed=$cellMax")
    spark.stop()
  }
}
