package graft

import org.apache.spark.sql.functions._
import graft.functions.{MinHashAgg, SimHashAgg}

/** Distribution-invariance and reference-formulation equivalence for the
  * custom imperative aggregates: partial aggregation + merge must give the
  * same result for ANY partitioning, and SimHashAgg must equal the 64
  * sum-column formulation it replaced. */
class HashAggSpec extends SparkSpec {
  import spark.implicits._

  private val rows = {
    val rnd = new scala.util.Random(7)
    Seq.tabulate(5000)(i => (i % 37L, rnd.nextLong()))
  }

  test("MinHashAgg signatures are identical under 1, 3, and 32 partitions") {
    val df = rows.toDF("g", "h")
    def sigs(parts: Int): Map[Long, Seq[Long]] =
      df.repartition(parts).groupBy($"g")
        .agg(MinHashAgg($"h", 32).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val one = sigs(1)
    assert(sigs(3) == one)
    assert(sigs(32) == one)
    assert(one.size == 37)
  }

  test("SimHashAgg equals the 64-sum-column formulation on random data") {
    val df = rows.toDF("g", "h")
    val fast = df.groupBy($"g").agg(SimHashAgg($"h").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference formulation: 64 explicit ±1 vote sums then bit assembly
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright($"h", j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$j")
    }
    val agg = df.groupBy($"g").agg(bitSums.head, bitSums.tail: _*)
    val fpCol = (0 until 64).map { j =>
      when(col(s"b_$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    val slow = agg.select($"g", fpCol.as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
  }

  test("SimHashAgg is partition-invariant") {
    val df = rows.toDF("g", "h")
    def fps(parts: Int): Map[Long, Long] =
      df.repartition(parts).groupBy($"g").agg(SimHashAgg($"h").as("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1) == fps(32))
  }
}
