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

  test("groupSplit: every group lands wholly in one split") {
    val docs = (1 to 300).map(i => (i.toLong, s"src${i % 17}"))
      .toDF("doc_id", "source")
    val split = graft.llm.Sampling.groupSplit(docs, $"source", salt = "x")
    val straddlers = split.groupBy($"source")
      .agg(countDistinct($"split").as("ns")).filter($"ns" > 1).count()
    assert(straddlers == 0)
    // and the split is a pure function of the group: a per-document split
    // on the same corpus DOES straddle (the contract being guarded)
    val perDoc = graft.llm.Sampling.hashSplit(docs, $"doc_id", salt = "x")
    val docStraddlers = perDoc.groupBy($"source")
      .agg(countDistinct($"split").as("ns")).filter($"ns" > 1).count()
    assert(docStraddlers > 0, "fixture too small to demonstrate leakage")
  }

  test("tokenBudget: greedy cutoff is exact, budget never exceeded, best kept") {
    val rows = Seq(
      // (id, lang, tokens, quality)
      (1L, "en", 40L, 0.9), (2L, "en", 40L, 0.8), (3L, "en", 40L, 0.7),
      (4L, "en", 40L, 0.6), // cum 160 > 100 at id 3 -> keep 1, 2 only
      (10L, "de", 30L, 0.5), (11L, "de", 100L, 0.4) // 30 fits, +100 doesn't
    ).toDF("doc_id", "lang", "n_tokens", "quality")
    val kept = graft.llm.Sampling.tokenBudget(rows, $"lang", $"n_tokens",
        $"quality", $"doc_id", budget = 100L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 10L))
    // a first doc larger than the whole budget is excluded, not force-kept
    val over = Seq((20L, "fr", 500L, 1.0)).toDF("doc_id", "lang", "n_tokens", "quality")
    assert(graft.llm.Sampling.tokenBudget(over, $"lang", $"n_tokens",
      $"quality", $"doc_id", budget = 100L).count() == 0)
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

  test("robustOutliersApprox: matches the exact twin on spike and degenerate-MAD groups") {
    // the GK sketch is EXACT below its accuracy (rank error n/accuracy
    // < 1 row here), so the approx twin must reproduce the exact profile
    // bit-for-bit — including the MAD=0 convention, where a sketchy
    // median could otherwise divide by a phantom epsilon
    val normal = (1 to 99).map(i => ("a", 100.0 + (i % 7)))
    val spike = Seq(("a", 1e6))
    val constant = (1 to 50).map(_ => ("b", 5.0))
    val df = (normal ++ spike ++ constant).toDF("g", "x")
    val exact = NumericQuality.robustOutliers(df, "x", Seq("g"))
      .orderBy($"g").collect().toSeq
    val approx = NumericQuality.robustOutliersApprox(df, "x", Seq("g"))
      .orderBy($"g").collect().toSeq
    assert(approx == exact, s"approx $approx != exact $exact")
  }
}
