package graft.examples

import org.apache.spark.sql.functions._
import graft.{Tables, Verify}
import graft.llm.Similarity

/** Find the nlist where the PLAN-LITERAL centroid argmax/top-n stops
  * compiling (janino 64 KB method limit) — run with
  * `spark.sql.codegen.fallback=false` so a failed whole-stage compile
  * THROWS instead of silently running interpreted (the VERDICT r12 #5
  * silent 2–5×). The bulk broadcast-matrix route must take over BELOW
  * the first failing dial. args: [sfDir] [nlists...] */
object LiteralAssignCeiling {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val grid = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(16, 32, 48, 64, 96, 128, 192, 256)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.t(spark, dir, "embeddings").localCheckpoint()
    val seeds = emb.orderBy(col("vec_id")).limit(256)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    for (nlist <- grid) {
      val centroids = (0 until nlist).map { i =>
        val b = seeds(i % seeds.length)
        (i, b.toIndexedSeq.map(x => x + (i % 97) * 1e-4): Seq[Double])
      }
      def tryPath(what: String)(body: => Long): Unit =
        try println(f"[ceiling] nlist=$nlist%4d $what%-7s OK   (rows ${body})")
        catch { case e: Throwable =>
          println(f"[ceiling] nlist=$nlist%4d $what%-7s FAIL ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(100)}")
        }
      tryPath("argmax") {
        Similarity.nearestCentroids(emb, centroids, "vec_id", "embedding").count()
      }
      tryPath("top4") {
        Similarity.assignTopCentroids(emb, centroids, 4, "vec_id", "embedding").count()
      }
      // the REAL failing shape (RecallSpec nlist=128/nprobe=32): the
      // assignment expression fused with the probe join in one whole-stage
      tryPath("ivfTopK") {
        Similarity.ivfTopK(spark, emb, emb.filter(col("vec_id") < 10),
          k = 5, nlist = nlist, nprobe = math.max(2, nlist / 4)).count()
      }
    }
    spark.stop()
  }
}
