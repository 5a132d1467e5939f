package graft

import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.{AtomicWriter, Incremental, Maintenance, Mutations}
import graft.mat.Materializer

/** Regression suite for NULL / empty-string / Hive-escaped partition values
  * flowing through the touched-set machinery (ADVICE r2: concat_ws-built
  * touched keys skipped NULLs, so emptied NULL partitions never matched the
  * staged set, multi-column keys truncated into PARTIAL drop specs that
  * nuked sibling partitions, and Mutations.delete NPE'd on null.toString;
  * the home-grown path escaper + new URI(...) corrupted ':'-valued
  * partition locations after a table swap). */
class NullPartitionSpec extends SparkSpec {
  import spark.implicits._

  private val part1 = PartitionSpec.Static(Seq("pt" -> "string"))
  private val part2 = PartitionSpec.Static(Seq("a" -> "string", "b" -> "string"))

  test("delete that empties the NULL partition drops it and spares siblings") {
    val ref = TableRef("default.np_del_null")
    Materializer.table(spark, ref,
      Seq((1L, Option.empty[String]), (2L, None), (3L, Some("p1")),
        (4L, Some("p2"))).toDF("id", "pt"), part1)
    Mutations.delete(spark, ref, $"id" <= 2, part1) // empties pt=NULL
    val left = spark.table(ref.render)
    assert(left.count() == 2)
    assert(left.filter($"pt".isNull).count() == 0)
    assert(left.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // catalog registration gone too, not just files
    assert(!spark.sql(s"SHOW PARTITIONS ${ref.render}").as[String].collect()
      .exists(_.contains(AtomicWriter.HiveDefaultPartition)))
  }

  test("emptying a multi-col NULL partition never drops sibling partitions") {
    val ref = TableRef("default.np_del_multicol")
    Materializer.table(spark, ref,
      Seq((1L, "x", Option.empty[String]), (2L, "x", None),
        (3L, "x", Some("y")), (4L, "z", Some("y")))
        .toDF("id", "a", "b"), part2)
    // empties (a=x, b=NULL); the truncated-key bug built spec `a='x'` and
    // deleted the parent dir a=x, destroying sibling (x, y)
    Mutations.delete(spark, ref, $"id" <= 2, part2)
    val left = spark.table(ref.render)
    assert(left.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    assert(left.filter($"a" === "x" && $"b" === "y").count() == 1)
  }

  test("merge with NULL-partition source rows updates in place") {
    val ref = TableRef("default.np_merge_null")
    Materializer.table(spark, ref,
      Seq((1L, "old", Option.empty[String]), (2L, "old", Some("p1")))
        .toDF("id", "v", "pt"), part1)
    val delta = Seq((1L, "new", Option.empty[String]), (3L, "ins", None))
      .toDF("id", "v", "pt")
    Incremental.merge(spark, ref, delta, uniqueKey = Seq("id"),
      partition = part1)
    val got = spark.table(ref.render).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "new"), (2L, "old"), (3L, "ins")))
  }

  test("deleteInsert keyed into the NULL partition keeps untouched siblings") {
    val ref = TableRef("default.np_di_null")
    Materializer.table(spark, ref,
      Seq((1L, 10L, Option.empty[String]), (2L, 20L, Some("p1")),
        (3L, 30L, Some("p2"))).toDF("id", "v", "pt"), part1)
    val delta = Seq((1L, 11L, Option.empty[String])).toDF("id", "v", "pt")
    Incremental.deleteInsert(spark, ref, delta, uniqueKey = Seq("id"),
      partition = part1)
    val got = spark.table(ref.render).select("id", "v").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 11L), (2L, 20L), (3L, 30L)))
  }

  test("partition values Spark escapes (':', '%') survive the table swap") {
    val ref = TableRef("default.np_escaped_swap")
    val df = Seq((1L, "a:b"), (2L, "50%"), (3L, "c d"), (4L, "plain"))
      .toDF("id", "pt")
    Materializer.table(spark, ref, df, part1)
    // overwriteTable → rename + repairPartitionLocations; the old URI-based
    // repair percent-DECODED 'pt=a%3Ab' to 'pt=a:b' (nonexistent) and those
    // partitions read back empty
    AtomicWriter.overwriteTable(spark,
      spark.table(ref.render).withColumn("id", $"id" + 10), ref, part1)
    val got = spark.table(ref.render).select("pt").as[String].collect().sorted
    assert(got.toSeq == Seq("50%", "a:b", "c d", "plain"))
    assert(spark.table(ref.render).filter($"pt" === "a:b").count() == 1)
  }

  test("compact keeps NULL and empty-string rows of the default partition") {
    val ref = TableRef("default.np_compact_default")
    val mk = (ids: Seq[Long]) =>
      ids.map(i => (i, if (i % 2 == 0) Option.empty[String] else Some("")))
        .toDF("id", "pt")
    Materializer.table(spark, ref, mk(1L to 4L), part1)
    Incremental.append(spark, ref, mk(5L to 8L), part1)
    Incremental.append(spark, ref, mk(9L to 12L), part1)
    val before = spark.table(ref.render).count()
    val done = Maintenance.compact(spark, ref, part1, maxFiles = 2)
    assert(done.nonEmpty)
    assert(spark.table(ref.render).count() == before)
    assert(spark.table(ref.render).select("id").as[Long].collect().sorted
      .toSeq == (1L to 12L))
  }

  test("partitionKey encodes NULL and '' as the Hive sentinel, per column") {
    val df = Seq((Option.empty[String], Some("y")), (Some(""), Some("y")),
      (Some("x"), Option.empty[String])).toDF("a", "b")
    val keys = df.select(
      AtomicWriter.partitionKey(Seq(col("a"), col("b"))).as("k"))
      .as[String].collect().toSeq
    val S = AtomicWriter.HiveDefaultPartition
    val sep = AtomicWriter.SEP
    assert(keys == Seq(s"$S${sep}y", s"$S${sep}y", s"x$sep$S"))
  }

  test("static insert_overwrite with a NULL listed partition replaces, not destroys, it") {
    val ref = TableRef("default.np_static_null")
    Materializer.table(spark, ref,
      Seq((1L, 10L, Option.empty[String]), (2L, 20L, Some("p1")),
        (3L, 30L, Some("p2"))).toDF("id", "v", "pt"), part1)
    // list the NULL partition (and p1); source carries new rows for both.
    // A bare isin filter would never match the NULL rows — they would be
    // discarded AND the owned-set diff would drop the partition's files.
    val src = Seq((10L, 100L, Option.empty[String]), (20L, 200L, Some("p1")))
      .toDF("id", "v", "pt")
    Incremental.insertOverwriteStatic(spark, ref, src, part1,
      partitions = Seq(null, "p1"))
    val got = spark.table(ref.render).select("id", "v").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((3L, 30L), (10L, 100L), (20L, 200L)))
    // and a listed-but-empty NULL partition is dropped cleanly
    Incremental.insertOverwriteStatic(spark, ref,
      Seq((21L, 201L, Some("p1"))).toDF("id", "v", "pt"), part1,
      partitions = Seq(null, "p1"))
    val got2 = spark.table(ref.render).select("id", "v").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got2 == Seq((3L, 30L), (21L, 201L)))
  }
}
