package graft

import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.{Incremental, Mutations, Skew, SnapshotExec}
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy

/** Regression suite for the round-3 write-path review findings. */
class ReviewFixes3Spec extends SparkSpec {
  import spark.implicits._

  test("merge rejects duplicate unique_key values in the source") {
    val ref = TableRef("default.rf3_merge_dup")
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").saveAsTable(ref.render)
    val dupSrc = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("id", "v")
    // the guard rides the merge's own jobs (window + raise_error), so it
    // surfaces as a wrapped Spark task failure, not a pre-check exception
    val e = intercept[Throwable] {
      Incremental.merge(spark, ref, dupSrc, uniqueKey = Seq("id"))
    }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("duplicate unique_key"))
    // target untouched: the guard fires while STAGING, before any swap
    assert(spark.table(ref.render).count() == 1)
  }

  test("merge with distinct keys is NOT tripped by the fanout guard") {
    val ref = TableRef("default.rf3_merge_nodup")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite")
      .saveAsTable(ref.render)
    Incremental.merge(spark, ref,
      Seq((2L, "B"), (3L, "c")).toDF("id", "v"), uniqueKey = Seq("id"))
    val got = spark.table(ref.render).as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("microbatch aligns unaligned boundaries to whole partitions") {
    spark.sql("DROP TABLE IF EXISTS default.rf3_micro")
    val part = PartitionSpec.Auto("ts", "day", Some("pt"))
    val ref = TableRef("default.rf3_micro")
    val rows = Seq(
      ("2024-01-01 06:00:00", 1L), ("2024-01-01 18:00:00", 2L),
      ("2024-01-02 06:00:00", 3L), ("2024-01-02 18:00:00", 4L))
      .toDF("s", "v").select(to_timestamp($"s").as("ts"), $"v")
    Materializer.table(spark, ref,
      graft.exec.AtomicWriter.withPartitionCols(rows.limit(0), part), part)
    // start mid-day: the un-aligned implementation split 01-02 into two
    // half-windows and the second batch's overwrite erased the first's rows
    Incremental.microbatch(spark, ref, rows, "ts", part,
      java.sql.Timestamp.valueOf("2024-01-01 12:00:00"),
      java.sql.Timestamp.valueOf("2024-01-02 12:00:00"))
    val got = spark.table(ref.render).select("v").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("partition values and tblproperties with backslashes round-trip") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = TableRef("default.rf3_backslash")
    Materializer.table(spark, ref,
      Seq((1L, "a\\"), (2L, "plain"), (3L, "a\\")).toDF("id", "pt"), part,
      tblProperties = Map("note" -> "c:\\tmp\\x"))
    val props = spark.sql(s"SHOW TBLPROPERTIES ${ref.render}")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("note") == "c:\\tmp\\x")
    // delete that EMPTIES the trailing-backslash partition: the DROP spec
    // and dir path must name the right partition
    Mutations.delete(spark, ref, $"pt" === "a\\", part)
    val left = spark.table(ref.render).select("id").as[Long].collect().sorted
    assert(left.toSeq == Seq(2L))
    assert(spark.table(ref.render).filter($"pt" === "a\\").count() == 0)
  }

  test("MV apply with unchanged config refreshes repeatedly (props survive)") {
    spark.sql("DROP TABLE IF EXISTS default.rf3_mv")
    Seq((1L, 2L)).toDF("a", "b").createOrReplaceTempView("rf3_src")
    val ref = TableRef("default.rf3_mv")
    val sql = "SELECT a, b FROM rf3_src"
    val props = Map("graft.owner" -> "graft", "tier" -> "gold")
    assert(Materializer.materializedViewApply(spark, ref, sql, props) == "created")
    assert(Materializer.materializedViewApply(spark, ref, sql, props) == "refreshed")
    // the refresh used to wipe user props, flipping the next apply to
    // "replaced" forever
    assert(Materializer.materializedViewApply(spark, ref, sql, props) == "refreshed")
    val after = spark.sql(s"SHOW TBLPROPERTIES ${ref.render}")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after("graft.owner") == "graft" && after("tier") == "gold")
  }

  test("check-strategy snapshot with a source-column updated-at expression") {
    spark.sql("DROP TABLE IF EXISTS default.rf3_snap")
    val ref = TableRef("default.rf3_snap")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val s1 = Seq((1L, "a", t1), (2L, "b", t1)).toDF("id", "v", "load_ts")
    val strat = SnapshotExec.CheckStrategy(Seq("v"), col("load_ts"))
    SnapshotExec.run(spark, ref, s1, Seq("id"), strat, t1)
    // second run previously threw AMBIGUOUS_REFERENCE on load_ts
    val s2 = Seq((1L, "a2", t2), (2L, "b", t2)).toDF("id", "v", "load_ts")
    SnapshotExec.run(spark, ref, s2, Seq("id"), strat, t2)
    val snap = spark.table(ref.render)
    assert(snap.count() == 3) // closed v=a, open v=a2, open v=b
    assert(snap.filter($"dbt_valid_to".isNull).count() == 2)
    assert(!snap.columns.contains("__graft_upd"))
  }

  test("saltedJoin stays correct and spreads identical hot-key rows") {
    val big = (Seq.fill(500)((1L, "dup")) ++ Seq((2L, "x"))).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, Seq("k"))
    assert(out.count() == 501)
    assert(out.filter($"name" === "one").count() == 500)
  }
}
