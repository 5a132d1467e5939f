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

  test("GramHashes equals the reference rotate-xor model; order-sensitive; short arrays empty") {
    val rnd = new scala.util.Random(13)
    val hs = Seq.fill(20)(rnd.nextLong())
    val w = 8
    def ref(a: Seq[Long]): Seq[Long] =
      (0 to a.length - w).map { i =>
        (0 until w).map(j => java.lang.Long.rotateLeft(a(i + j), 7 * j + 1))
          .reduce(_ ^ _)
      }
    val got = Seq((1L, hs)).toDF("id", "hs")
      .select(graft.functions.GramHashes($"hs", w).as("g"))
      .collect()(0).getSeq[Long](0).toSeq
    assert(got == ref(hs))
    assert(got.length == hs.length - w + 1)
    // position-distinct rotations: reordering tokens changes the gram
    val swapped = hs.updated(0, hs(1)).updated(1, hs(0))
    val got2 = Seq((1L, swapped)).toDF("id", "hs")
      .select(graft.functions.GramHashes($"hs", w).as("g"))
      .collect()(0).getSeq[Long](0).toSeq
    assert(got2.head != got.head, "token order did not change the gram hash")
    // n < w → empty, not descending-sequence garbage; null → null
    val short = Seq((1L, hs.take(w - 1)), (2L, Seq.empty[Long]))
      .toDF("id", "hs")
      .select($"id", graft.functions.GramHashes($"hs", w).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).length).toMap
    assert(short == Map(1L -> 0, 2L -> 0))
    val nul = Seq((1L, null.asInstanceOf[Seq[Long]])).toDF("id", "hs")
      .select(graft.functions.GramHashes($"hs", w).as("g"))
      .collect()(0)
    assert(nul.isNullAt(0))
    // nullable ELEMENTS are rejected at analysis time: compute() reads via
    // ArrayData.getLong, which would silently turn a null slot into 0 and
    // corrupt the fingerprint (ADVICE r10)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Seq(Option(1L), None))).toDF("id", "hs")
        .select(graft.functions.GramHashes($"hs", w).as("g"))
        .collect()
    }
    assert(err.getMessage.contains("non-nullable"))
  }
}
