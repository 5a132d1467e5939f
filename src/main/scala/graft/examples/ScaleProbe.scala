package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, Verify}
import graft.llm.{Dedup, Sampling, Similarity, TextOps}

/** Scaling evidence: run the heavy operators at 1× and 10× corpus size
  * (10× = ten key-shifted copies of sf0.1) and report the wall-clock ratio.
  * Near-linear ratios (≈10×) demonstrate the pipelines are free of
  * quadratic blowups or driver-side bottlenecks as data grows. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    spark.range(10000000L).selectExpr("sum(id)").collect() // warmup

    // n key-shifted copies with per-copy alphabet rotation: copies share
    // (almost) no tokens — digit/punctuation tokens survive rotation — so
    // corpus size grows n× while the near-dup STRUCTURE per copy stays
    // roughly constant. The honest scaling setup for dedup ops, where
    // verbatim copies would quadratically grow the true output pair count.
    def docsX(n: Int): DataFrame = {
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val d = Tables.t(spark, dir, "documents").select(col("doc_id"), col("text"))
      (0 until n).map { i =>
        val rot = alpha.drop(i % 26) + alpha.take(i % 26)
        d.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          translate(lower(col("text")), alpha, rot).as("text"))
      }.reduce(_ unionByName _)
    }
    def embX(n: Int): DataFrame = {
      val e = Tables.t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      (0 until n).map(i =>
        e.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding"))).reduce(_ unionByName _)
    }
    def liX(n: Int): DataFrame = {
      val l = Tables.t(spark, dir, "lineitem")
      (0 until n).map(i =>
        l.withColumn("l_orderkey",
          col("l_orderkey") + lit(i.toLong * 100000000L))).reduce(_ unionByName _)
    }

    val cases: Seq[(String, Int => Double)] = Seq(
      "minhash_lsh_pairs" -> (n =>
        time(Dedup.minhashNearDupPairs(docsX(n), 0.5, 64, 16).count())),
      "ngram_jaccard" -> (n =>
        time(Dedup.ngramJaccardPairs(docsX(n), 3, 0.5, 1000).count())),
      "simhash_pairs" -> (n =>
        time(Dedup.simhashNearDupPairs(docsX(n), 3).count())),
      "winnow_pairs" -> (n =>
        time(TextOps.winnowNearDupPairs(docsX(n), 20, maxDf = 50).count())),
      "embed_neardup_lsh" -> (n =>
        time(Similarity.nearDupPairs(embX(n), 0.9, 64).count())),
      "groupby_agg" -> (n =>
        time(liX(n).groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")), avg(col("l_extendedprice")),
            count(lit(1))).collect())),
      "exact_dedup" -> (n =>
        time(Dedup.exact(docsX(n)).count())),
      // star graphs of 10 nodes: edge count grows n×, diameter stays 2 —
      // the shape dup graphs actually have
      "connected_components" -> (n =>
        time(Dedup.connectedComponents(
          spark.range(n.toLong * 1000000L).toDF("id")
            .filter(col("id") % 10 =!= 0)
            .select((col("id") - (col("id") % 10)).as("id_a"),
              col("id").as("id_b"))).count())),
      "containment" -> (n =>
        time(Dedup.containment(docsX(n).filter(col("doc_id") % 10 =!= 0),
          docsX(n).filter(col("doc_id") % 10 === 0)).count())),
      "bigram_repetition" -> (n =>
        time(TextOps.bigramRepetition(docsX(n)).count())),
      "hash_split" -> (n =>
        time(Sampling.hashSplit(docsX(n), col("text"))
          .groupBy("split").count().collect())))

    println(f"[scale] ${"operator"}%-20s ${"1x"}%8s ${"10x"}%8s  ratio")
    cases.foreach { case (name, run) =>
      run(1) // warm codegen outside the measurement
      val t1 = run(1)
      val t10 = run(10)
      println(f"[scale] $name%-20s $t1%8.2f $t10%8.2f  ${t10 / t1}%.1fx")
    }
    spark.stop()
  }
}
