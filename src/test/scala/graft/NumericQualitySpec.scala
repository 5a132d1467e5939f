package graft

import org.apache.spark.sql.functions._
import graft.llm.{NumericQuality, TextOps}

/** Planted-case semantics for the round-9 data-quality operators:
  * cross-document substring (repeated-span) dedup and median/MAD robust
  * outlier screening. */
class NumericQualitySpec extends SparkSpec {
  import spark.implicits._

  test("substringDupSignal flags only CROSS-document repeated spans") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"prefix tokens here then $span and a tail"),
      (3L, "totally unrelated words that appear exactly once each time here"),
      // within-doc repetition only: the 8-gram repeats INSIDE doc 4 but in
      // no other doc, so it must NOT count as duplicated
      (4L, s"$span $span".replace("w1", "x1")),
      (5L, "short doc") // < 8 tokens: zero grams, keep
    ).toDF("doc_id", "text")
    val out = TextOps.substringDupSignal(docs, w = 8, maxRatio = 0.5)
      .orderBy($"doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(byId(1L)._2 > 0, "doc 1 shares the span with doc 2")
    assert(byId(2L)._2 > 0, "doc 2 shares the span with doc 1")
    assert(byId(3L)._2 == 0)
    assert(byId(4L)._2 == 0, "within-doc repetition is not cross-doc dup")
    assert(byId(5L) == ((0L, 0L, true)), "short doc: no grams, kept")
    // doc 1: the shared span is 1 of 9 grams -> ratio ~0.11, kept; a doc
    // that is ENTIRELY the shared span would be dropped
    val allDup = Seq((10L, span), (11L, span)).toDF("doc_id", "text")
    val dropped = TextOps.substringDupSignal(allDup, w = 8, maxRatio = 0.5)
      .filter(!$"keep").count()
    assert(dropped == 2, "fully-duplicated docs fail the keep flag")
  }

  test("robustOutliers: planted spike flagged, MAD=0 group degenerates to 0") {
    val normal = (1 to 99).map(i => ("a", 100.0 + (i % 7)))
    val spike = Seq(("a", 1e6))
    val constant = (1 to 50).map(_ => ("b", 5.0))
    val df = (normal ++ spike ++ constant).toDF("g", "x")
    val out = NumericQuality.robustOutliers(df, "x", Seq("g"))
      .orderBy($"g").collect()
    val a = out(0); val b = out(1)
    assert(a.getLong(1) == 100 && a.getLong(4) == 1,
      s"group a must flag exactly the spike, got $a")
    assert(b.getLong(4) == 0 && b.getDouble(3) == 0.0,
      s"constant group: MAD 0, zero outliers by convention, got $b")
  }
}
