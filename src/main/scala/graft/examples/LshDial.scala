package graft.examples

import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Recall/cost dial sweep for lshTopK at a given SF (run at sf0.01 and
  * sf0.1 to see how recall tracks corpus growth at fixed candidate
  * fraction). */
object LshDial {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Verify.session("16")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val q = emb.filter($"vec_id" < 10)
    val n = emb.count()
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    for ((bits, probes, tables) <- Seq((8, 4, 4), (8, 6, 8), (7, 4, 4),
        (7, 6, 8), (6, 4, 8), (8, 4, 16))) {
      val t0 = System.nanoTime()
      val a = Similarity.lshTopK(emb, q, k = 5, dim = 64, bits = bits,
          probeBits = probes, tables = tables)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      val dt = (System.nanoTime() - t0) / 1e9
      val r = a.intersect(exact).size.toDouble / exact.size
      val frac = tables.toDouble * (1 + probes) / (1L << bits)
      println(f"corpus=$n bits=$bits probes=$probes tables=$tables " +
        f"frac=$frac%.3f recall=$r%.3f time=$dt%.2f")
    }
    spark.stop()
  }
}
