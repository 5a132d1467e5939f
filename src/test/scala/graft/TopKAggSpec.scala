package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{TopKAgg, TopKBuffer}

/** The bounded-heap top-k aggregate must be RESULT-IDENTICAL to the
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC)` window
  * it replaces in the ANN final ranking (s01/s02/s05 shapes) — same entries,
  * same order, same tie-breaks — while aggregating map-side (each partition
  * ships ≤ k entries per group instead of every candidate into one task). */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"g", $"id", $"score", $"rank")
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g").agg(TopKAgg($"score", $"id", k).as("topk"))
      .select($"g", posexplode($"topk"))
      .select($"g", $"col.id".as("id"), $"col.score".as("score"),
        ($"pos" + 1).as("rank"))

  test("matches the window form exactly on deterministic pseudo-random data") {
    // splitmix-ish scores with deliberate collisions (score = h % 97 → ties)
    val df = spark.range(0, 5000).select(
        (col("id") % 7).as("g"), col("id"),
        ((col("id") * 2654435761L) % 97).cast("double").as("score"))
      .repartition(16) // force the merge path across many partitions
      .cache()
    val k = 9
    val expect = rows(windowTopK(df, k).orderBy($"g", $"rank"))
    val got = rows(aggTopK(df, k).orderBy($"g", $"rank"))
    assert(got == expect)
    df.unpersist()
  }

  test("k larger than the group returns the whole group, best-first") {
    val df = Seq((1L, 10L, 2.0), (1L, 11L, 3.0), (2L, 12L, 1.0))
      .toDF("g", "id", "score")
    val got = rows(aggTopK(df, 5).orderBy($"g", $"rank"))
    assert(got == Seq(Seq(1L, 11L, 3.0, 1L), Seq(1L, 10L, 2.0, 2L),
      Seq(2L, 12L, 1.0, 1L)))
  }

  test("-0.0 ties with 0.0 and resolves by id asc, like SQL ordering") {
    val df = Seq((1L, 20L, -0.0), (1L, 10L, 0.0), (1L, 30L, 0.0))
      .toDF("g", "id", "score")
    val got = rows(aggTopK(df, 3).select($"id", $"rank").orderBy($"rank"))
    assert(got == Seq(Seq(10L, 1L), Seq(20L, 2L), Seq(30L, 3L)))
  }

  test("nulls in score or id are skipped, not ranked") {
    val df = Seq((1L, Some(10L), Some(2.0)), (1L, None, Some(9.0)),
        (1L, Some(11L), None), (1L, Some(12L), Some(1.0)))
      .toDF("g", "id", "score")
    val got = rows(aggTopK(df, 5).select($"id", $"score").orderBy($"rank"))
    assert(got == Seq(Seq(10L, 2.0), Seq(12L, 1.0)))
  }

  test("buffer serde roundtrips and keeps heap order") {
    val buf = new TopKBuffer(3)
    Seq((5.0, 1L), (7.0, 2L), (3.0, 3L), (7.0, 0L), (9.0, 4L))
      .foreach { case (s, i) => buf.insert(s, i) }
    // best-first: 9.0/4, 7.0/0 (id asc beats 7.0/2), 7.0/2
    assert(buf.sortedEntries.toSeq == Seq((9.0, 4L), (7.0, 0L), (7.0, 2L)))
    val agg = TopKAgg(
      org.apache.spark.sql.GraftColumnBridge.expression(lit(0)),
      org.apache.spark.sql.GraftColumnBridge.expression(lit(0)), 3)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sortedEntries.toSeq == buf.sortedEntries.toSeq)
  }
}
