package graft.examples

import org.apache.spark.sql.functions._
import graft.{Tables, Verify}
import graft.llm.Similarity

/** Dial sweep for [[Similarity.knnGraph]]: mean recall@5 of the per-node
  * exact top-5 edge set, across (nlist, nprobe) — run at sf0.01 and sf0.1
  * to pick the s10 gate dials the way LshDial picked s02's. */
object KnnDial {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.t(spark, dir, "embeddings").localCheckpoint()
    val a2 = emb.select(col("vec_id").as("src"), col("embedding").as("v_a"))
    val b2 = emb.select(col("vec_id").as("dst"), col("embedding").as("v_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    val exact = a2.crossJoin(b2).filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        round(Similarity.cosine(col("v_a"), col("v_b")), 6).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("src"), col("dst")).localCheckpoint()
    for ((nl, np) <- Seq((16, 2), (8, 2), (8, 4), (16, 4), (16, 6), (32, 8))) {
      val t0 = System.nanoTime()
      val approx = Similarity.knnGraph(emb, k = 5, nlist = nl, nprobe = np)
        .select(col("src"), col("dst"), lit(1).as("hit"))
      val r = exact.join(approx, Seq("src", "dst"), "left")
        .agg((sum(coalesce(col("hit"), lit(0))).cast("double")
          / count(lit(1))).as("recall"))
        .collect()(0).getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[knndial] nlist=$nl%2d nprobe=$np%2d recall=$r%.3f  $dt%5.1f s")
    }
    spark.stop()
  }
}
