package graft.examples

import org.apache.spark.sql.functions._
import graft.{Tables, Verify}
import graft.llm.Similarity

/** Assign-cost sweep for the broadcast-matrix bulk centroid assignment:
  * times `assignTopCentroids` (top-2) over the embeddings corpus at
  * nlist = 1024 / 4096 / 16384 and prints score-throughput
  * (rows × nlist / s). With the bounded-heap top-n the per-score cost must
  * stay flat as nlist grows; the former per-row full sort made it grow as
  * log(nlist) in time and O(nlist) in per-row allocation. */
object BulkAssignProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.t(spark, dir, "embeddings").localCheckpoint()
    val nRows = emb.count()
    // deterministic synthetic centroid matrix seeded from real vectors:
    // cycle the first 256 embeddings with an index-scaled perturbation
    val seeds = emb.orderBy(col("vec_id")).limit(256)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    for (nlist <- Seq(1024, 4096, 16384)) {
      val centroids = (0 until nlist).map { i =>
        val b = seeds(i % seeds.length)
        (i, b.toIndexedSeq.map(x => x + (i % 97) * 1e-4): Seq[Double])
      }
      // warm-up then measured run (JIT + broadcast setup out of the timing)
      Similarity.assignTopCentroids(emb, centroids, n = 2,
        idCol = "vec_id", vecCol = "embedding").count()
      val t0 = System.nanoTime()
      val out = Similarity.assignTopCentroids(emb, centroids, n = 2,
        idCol = "vec_id", vecCol = "embedding").count()
      val dt = (System.nanoTime() - t0) / 1e9
      val thr = nRows.toDouble * nlist / dt / 1e6
      println(f"[bulkassign] nlist=$nlist%5d rows=$nRows out=$out " +
        f"$dt%6.2f s  $thr%8.1f Mscore/s")
    }
    spark.stop()
  }
}
