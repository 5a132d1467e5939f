package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to fixed
  * token windows ("bins") so a trainer can concatenate each bin up to its
  * context length.
  *
  * Streaming form: documents are hash-SHARDED (md5 of the id — engine-
  * portable, like [[Sampling]]), then packed in deterministic id order
  * within each shard by cumulative token count — `bin = (cumsum_before) /
  * window`. A document that spans a window boundary belongs to the bin its
  * start falls in (bins can overflow by at most one document; bin sizes
  * average `window`). This is the form that SCALES: one window function
  * per shard, no sequential state, no driver pass — packing 100 TB is
  * `shards`-way parallel. (Exact greedy first-fit needs sequential state
  * per shard — a `mapPartitions` loop — and buys only tighter tail bins;
  * the streaming form is what big corpus pipelines actually run.)
  */
object Packing {

  /** `16^hexWidth`-way shard from the first `hexWidth` hex chars of
    * `md5('p' ‖ id)` — a STRING shard key both Spark and any md5-capable
    * oracle compute identically ([[Sampling.hexPrefix]], the one shared
    * keying expression). `hexWidth` sets the pack parallelism: each shard
    * is one window sort, so at corpus size `S` a shard sorts `S / 16^w`
    * rows — width 1 (16 shards) suits test scale, width 3–4
    * (4 096–65 536 shards) keeps per-task sorts in the low-GB range at
    * 100 TB. */
  def shardKey(id: Column, hexWidth: Int = 1): Column = {
    require(hexWidth >= 1 && hexWidth <= 8,
      s"hexWidth must be in [1,8], got $hexWidth")
    Sampling.hexPrefix(id, "p", hexWidth)
  }

  /** Adds `shard`, `bin` (0-based within shard) to `df`. `tokensCol` must
    * be non-negative; rows pack in ascending `idCol` order within each of
    * the `16^shardHexWidth` shards — ties share a ROW frame position
    * deterministically only if `idCol` is unique, so uniqueness is the
    * caller's contract (dedup runs first in any real pipeline). Size
    * `shardHexWidth` so a shard's rows fit one task comfortably (see
    * [[shardKey]]). */
  def packStreaming(df: DataFrame, idCol: Column, tokensCol: Column,
      window: Long, shardHexWidth: Int = 1): DataFrame = {
    require(window > 0, "window must be positive")
    require(!df.columns.contains("shard") && !df.columns.contains("bin"),
      "packStreaming writes 'shard' and 'bin' — rename the input's columns")
    // explicit ROWS frame: the default RANGE frame sums ORDER-BY PEERS,
    // which on a duplicate id would give both rows the same cumulative sum
    // and skip a bin
    val w = Window.partitionBy(col("shard")).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shardKey(idCol, shardHexWidth))
      .withColumn("__cum", sum(tokensCol).over(w))
      .withColumn("bin",
        floor((col("__cum") - tokensCol) / lit(window.toDouble)).cast("long"))
      .drop("__cum")
  }
}
