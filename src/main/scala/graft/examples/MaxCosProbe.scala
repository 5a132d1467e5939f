package graft.examples

import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Cost curve of the dense semantic-decontamination kernel
  * ([[Similarity.maxCosToRef]]) in the reference-set size — the dial that
  * decides when the d22 shape stops being right: per-row cost is
  * |ref|·dim multiplies, so the broadcast pass is linear in |ref| at
  * constant corpus. The probe sweeps |ref| on the sf1 corpus and reports
  * Mscore/s (a "score" = one corpus-row × ref-row cosine); a flat
  * Mscore/s column means the kernel is compute-bound with no per-ref
  * overhead, and the wall column shows where a 10⁵-row eval set starts
  * to hurt (the scaladoc's ANN escape). Run:
  * `sbt 'runMain graft.examples.MaxCosProbe [sfDir]'`. */
object MaxCosProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .localCheckpoint()
    val n = emb.count()
    println(s"[maxcos] corpus = $n vectors, dim 64")
    spark.range(10000000L).selectExpr("sum(id)").collect()
    for (refSize <- Seq(1000, 4000, 16000)) {
      // deterministic ref subset; perturbed so ids don't overlap semantics
      val ref = emb.limit(refSize)
        .select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.01)).as("embedding"))
      // warm + measured
      Similarity.maxCosToRef(emb, ref).count()
      val t0 = System.nanoTime()
      val flagged = Similarity.maxCosToRef(emb, ref)
        .filter(col("max_cos") >= 0.9).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val mscore = n.toDouble * refSize / dt / 1e6
      println(f"[maxcos] ref=$refSize%6d  wall=$dt%6.2f s  " +
        f"Mscore/s=$mscore%8.1f  flagged=$flagged")
    }
    spark.stop()
  }
}
