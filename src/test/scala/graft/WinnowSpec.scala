package graft

import org.apache.spark.sql.functions._
import graft.functions.WinnowFingerprints
import graft.llm.TextOps

/** Native winnowing kernel: edge cases + the robust-winnowing guarantee. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(texts: String*): Seq[Seq[Long]] =
    texts.zipWithIndex.map(t => (t._2, t._1)).toDF("id", "text")
      .select(WinnowFingerprints($"text", 12, 8).as("fp"))
      .collect().map(_.getSeq[Long](0)).toSeq

  test("edge cases: empty, shorter than k, exactly k") {
    val Seq(empty, short, exact) = fps("", "abcdefghij", "abcdefghijkl")
    assert(empty.isEmpty)
    assert(short.length == 1)
    assert(exact.length == 1)
  }

  test("fingerprints are distinct and sorted ascending") {
    val Seq(v) = fps("the quick brown fox jumps over the lazy dog " * 20)
    assert(v == v.sorted)
    assert(v.distinct == v)
    assert(v.nonEmpty)
  }

  test("deterministic across evaluations") {
    val a = fps("some document body with enough text to winnow repeatedly")
    val b = fps("some document body with enough text to winnow repeatedly")
    assert(a == b)
  }

  test("docs sharing a substring of >= k+window-1 chars share a fingerprint") {
    val shared = "this exact shared passage is long enough to fingerprint"
    val d1 = s"prefix one wholly different $shared and a unique tail here"
    val d2 = s"completely other opening text $shared closing differently now"
    val Seq(f1, f2) = fps(d1, d2)
    assert(f1.toSet.intersect(f2.toSet).nonEmpty)
  }

  test("unrelated docs share no fingerprints") {
    val Seq(f1, f2) = fps(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "uno dos tres cuatro cinco seis siete ocho nueve diez once")
    assert(f1.toSet.intersect(f2.toSet).isEmpty)
  }

  test("winnowNearDupPairs finds appended-token near-dups") {
    val base = (0 until 50).map(i =>
      (i.toLong, s"document number $i with a reasonably long body of text " +
        s"that repeats some filler words to give the winnower material $i"))
    val dups = base.filter(_._1 % 10 == 0)
      .map { case (id, t) => (id + 1000, t + " extra") }
    val docs = (base ++ dups).toDF("doc_id", "text")
    val pairs = TextOps.winnowNearDupPairs(docs, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted dup pair is found
    assert(dups.map(d => (d._1 - 1000, d._1)).forall(pairs.contains))
  }
}
