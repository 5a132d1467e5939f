package graft

import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.{AtomicWriter, Maintenance}
import graft.mat.Materializer

/** Append-after-overwrite under the VERSIONED committer: a versioned
  * partition overwrite flips the partition's catalog location into a
  * version directory — a later INSERT INTO append must land its files in
  * the partition the reader actually sees, not the stale root-layout dir.
  * This is the seam `zorderCompact` leans on for catalog tables: degrade
  * (appends) → maintain (versioned swap) → degrade again must keep the
  * whole loop visible. */
class VersionedAppendSpec extends SparkSpec {

  import spark.implicits._

  test("append after a versioned partition overwrite stays visible and " +
      "re-degrades the live partition") {
    spark.conf.set("spark.graft.committer", "versioned")
    try {
      spark.sql("DROP DATABASE IF EXISTS vap CASCADE")
      spark.sql("CREATE DATABASE vap")
      val part = PartitionSpec.Static(Seq("pt" -> "string"))
      val ref = TableRef("vap.t1")
      Materializer.table(spark, ref,
        Seq((1L, "p1"), (2L, "p2")).toDF("id", "pt"), part)
      AtomicWriter.overwritePartitions(spark,
        Seq((10L, "p1")).toDF("id", "pt"), ref, part)
      assert(spark.table(ref.render).as[(Long, String)].collect().sorted
        .toSeq == Seq((2L, "p2"), (10L, "p1")).sorted)
      AtomicWriter.append(spark,
        Seq((11L, "p1")).toDF("id", "pt"), ref, part)
      assert(spark.table(ref.render).as[(Long, String)].collect().sorted
        .toSeq == Seq((2L, "p2"), (10L, "p1"), (11L, "p1")).sorted,
        "appended row must be visible through the versioned partition")
      // maintenance sees the re-degraded LIVE partition
      val counts = Maintenance.partitionFileCounts(spark, ref, part)
      assert(counts("pt=p1") == 2,
        s"live p1 must hold the overwrite file + the appended file: $counts")
      spark.sql("DROP DATABASE IF EXISTS vap CASCADE")
    } finally spark.conf.unset("spark.graft.committer")
  }
}
