package graft

import org.apache.spark.sql.functions._
import graft.exec.SnapshotDiff

/** Row-level snapshot diff (CDC classification) and its engine-portable
  * fingerprint. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies insert/delete/update and drops unchanged rows") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("id", "s", "v")
    val neu = Seq((1L, "a", 10L), (2L, "b", 99L), (4L, "D", 40L),
      (5L, "e", 50L)).toDF("id", "s", "v")
    val got = SnapshotDiff.diff(old, neu, Seq("id"), Seq("s", "v"))
      .select($"id", $"change_type").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    // id=1 unchanged (absent); 2 and 4 update; 3 delete; 5 insert
    assert(got == Seq(2L -> "update", 3L -> "delete", 4L -> "update",
      5L -> "insert"))
  }

  test("fingerprint: NULL is distinct from 'NULL' text and from absence") {
    val fp = (s: Option[String], v: Option[String]) =>
      Seq((s, v)).toDF("s", "v")
        .select(SnapshotDiff.fingerprint(Seq($"s", $"v")).as("fp"))
        .as[String].head()
    // a real NULL vs literal text that could spoof a sentinel: the
    // per-column null FLAG (not a sentinel string) keeps every value
    // distinguishable from NULL, so all six are pairwise distinct hashes
    val all = Seq(fp(None, Some("x")), fp(Some("NULL"), Some("x")),
      fp(Some("x"), None), fp(Some("x"), Some("NULL")),
      fp(Some("\u0002NULL\u0003"), Some("x")), fp(Some(""), Some("x")))
    assert(all.distinct.size == all.size, s"fingerprint collision: $all")
    // a NULL↔'NULL'-text flip IS an update (the old-sentinel blind spot)
    val old = Seq((1L, Option.empty[String])).toDF("id", "s")
    val neu = Seq((1L, Option("NULL"))).toDF("id", "s")
    val d = SnapshotDiff.diff(old, neu, Seq("id"), Seq("s"))
      .select($"change_type").as[String].collect().toSeq
    assert(d == Seq("update"), s"NULL->'NULL' flip must be visible: $d")
    // ("ab","c") must not collide with ("a","bc") — separator in force
    assert(fp(Some("ab"), Some("c")) != fp(Some("a"), Some("bc")))
    // values CONTAINING the  separator must not realign across
    // column boundaries: ("a00:b", "X") and ("a", "b00:X")
    // concatenated identically under the r14 separator-only scheme — the
    // length prefix makes the encoding prefix-free (ADVICE r14)
    assert(fp(Some("a00:b"), Some("X")) != fp(Some("a"), Some("b00:X")),
      "separator-bearing values must not collide across columns")
    assert(fp(Some("a"), Some("b")) != fp(Some("a"), Some("b")))
  }

  test("diff: multi-column keys and a changed-then-restored row is silent") {
    val old = Seq(("x", 1L, "p"), ("x", 2L, "q")).toDF("k1", "k2", "v")
    val neu = Seq(("x", 1L, "p"), ("x", 2L, "q")).toDF("k1", "k2", "v")
    assert(SnapshotDiff.diff(old, neu, Seq("k1", "k2"), Seq("v")).isEmpty)
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, neu, Seq.empty, Seq("v"))
    }
    ()
  }
}
