package graft.examples

import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.AtomicWriter

/** Commit-cost probe for the Committer seam: overwrite K of N partitions
  * under the rename committer vs the versioned (rename-free) committer,
  * at a few hundred partitions. What scales is the shape: both commit in
  * O(K) metadata ops (batched DDL / batched location flips) regardless of
  * N — the versioned path trades two directory renames per partition for
  * one catalog location flip plus deferred GC, which is the object-store
  * trade. */
object CommitterProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Verify.session("16")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val N = 400
    val K = 50
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    for (committer <- Seq("rename", "versioned")) {
      spark.conf.set("spark.graft.committer", committer)
      spark.sql("CREATE DATABASE IF NOT EXISTS probe")
      val ref = TableRef(s"probe.cp_$committer")
      val base = (1 to N).map(i => (i.toLong, f"p$i%04d")).toDF("id", "pt")
      AtomicWriter.createOrReplace(spark, base, ref, part)
      val delta = (1 to K).map(i => (i.toLong + 1000, f"p$i%04d")).toDF("id", "pt")
      // warm
      AtomicWriter.overwritePartitions(spark, delta, ref, part)
      val t0 = System.nanoTime()
      AtomicWriter.overwritePartitions(spark, delta, ref, part)
      val dt = (System.nanoTime() - t0) / 1e9
      val n = spark.table(ref.render).count()
      println(f"committer=$committer%-10s N=$N K=$K overwrite=$dt%5.2f s rows=$n")
      require(n == N, s"row count $n != $N")
    }
    spark.stop()
  }
}
