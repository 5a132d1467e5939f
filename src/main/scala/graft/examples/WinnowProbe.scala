package graft.examples

import org.apache.spark.sql.functions._
import graft.{Tables, Verify}

/** One-off: winnow fingerprint df distribution at sf0.1 (join-size math). */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = Verify.session("32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val d = Tables.t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val docs = d.unionByName(d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" graftmarker")).as("text")))
    val fps = graft.llm.TextOps.winnowFingerprints(docs)
    println("[wp] fps rows: " + fps.count())
    val df = fps.groupBy("fp_hash").agg(count(lit(1)).as("df"))
    println("[wp] " + df.select(expr(
      "percentile(df, array(0.5, 0.9, 0.99, 0.999, 1.0))")).first)
    for (cap <- Seq(Int.MaxValue, 500, 50, 20, 5))
      println(s"[wp] pre-agg pairs df<=$cap: " +
        df.filter(col("df") <= cap)
          .agg(sum(col("df") * (col("df") - 1) / 2)).first)
    val sh = graft.llm.Dedup.explodedShingleHashes(docs, 3, "doc_id", "text")
    println("[wp] shingle rows: " + sh.count())
    val sdf = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    println("[wp] shingle df pct: " + sdf.select(expr(
      "percentile(df, array(0.5, 0.9, 0.99, 0.999, 1.0))")).first)
    for (cap <- Seq(Int.MaxValue, 1000, 100, 50))
      println(s"[wp] shingle pre-agg pairs df<=$cap: " +
        sdf.filter(col("df") <= cap)
          .agg(sum(col("df") * (col("df") - 1) / 2)).first)
    spark.stop()
  }
}
