package graft

import java.sql.Timestamp
import graft.exec.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, ts("2024-01-01 10:00:05"), "t1"),
    (1L, ts("2024-01-01 10:00:00"), "t0"), // equal-to-quote timestamp
    (1L, ts("2024-01-01 09:59:00"), "tEarly"), // before any quote
    (2L, ts("2024-01-01 10:00:10"), "t2"))
    .toDF("sym", "ts", "trade")

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:04"), 101.0),
    (2L, ts("2024-01-01 10:00:20"), 200.0))
    .toDF("sym", "ts", "px")

  test("backward: greatest quote ts <= trade ts; ties match; no-match is null") {
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", "ts")
      .select($"trade", $"r_px").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("t1") == Some(101.0)) // 10:00:04 quote
    assert(got("t0") == Some(100.0)) // equal timestamps match
    assert(got("tEarly") == None)    // nothing at or before
    assert(got("t2") == None)        // sym 2's quote is after
  }

  test("forward: smallest quote ts >= trade ts") {
    val got = AsOfJoin.forward(trades, quotes, Seq("sym"), "ts", "ts")
      .select($"trade", $"r_px").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("t1") == None)        // no quote after 10:00:05 for sym 1
    assert(got("t0") == Some(100.0)) // equal timestamps match
    assert(got("tEarly") == Some(100.0))
    assert(got("t2") == Some(200.0))
  }

  test("left row count is preserved (pure attachment, no fan-out)") {
    assert(AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", "ts").count()
      == trades.count())
  }

  test("randomized: matches the brute-force definition on 500 rows") {
    val rnd = new scala.util.Random(42)
    val lrows = Seq.tabulate(250)(i =>
      (rnd.nextInt(8).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toLong))
    val rrows = Seq.tabulate(250)(i =>
      (rnd.nextInt(8).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i * 10.0))
    val l = lrows.toDF("k", "ts", "lid")
    val r = rrows.toDF("k", "ts", "px")
    val got = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts")
      .select($"lid", $"r_px").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    // brute force: per left row, the max-ts right row at or before, ties by
    // the same (ts, arrival-order) resolution the window uses is irrelevant
    // here because px of equal-ts rows differ — pick max ts then ANY px from
    // the tied set and assert membership
    lrows.foreach { case (k, ts, lid) =>
      val cands = rrows.filter(rr => rr._1 == k && !rr._2.after(ts))
      if (cands.isEmpty) assert(got(lid).isEmpty, s"lid=$lid expected no match")
      else {
        val maxTs = cands.map(_._2.getTime).max
        val valid = cands.filter(_._2.getTime == maxTs).map(_._3).toSet
        assert(got(lid).isDefined && valid.contains(
          got(lid).get.asInstanceOf[Double]), s"lid=$lid wrong match")
      }
    }
  }

  test("plan is one window over the union, not a range join") {
    val plan = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", "ts")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("join"))
  }

  test("NULL keys/timestamps follow ON-clause semantics (no fabricated matches)") {
    val l = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:05")), "ok"),
      (None, Some(ts("2024-01-01 10:00:05")), "nullKey"),
      (Some(1L), None, "nullTs"))
      .toDF("sym", "ts", "trade")
    val r = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 100.0),
      (None, Some(ts("2024-01-01 09:00:00")), 666.0),  // NULL key: never matches
      (Some(1L), None, 667.0))                          // NULL ts: never matches
      .toDF("sym", "ts", "px")
    for (dir <- Seq("b", "f")) {
      val out = (if (dir == "b") AsOfJoin.backward(l, r, Seq("sym"), "ts", "ts")
        else AsOfJoin.forward(l, r, Seq("sym"), "ts", "ts"))
        .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
      assert(out.size == 3, s"left rows must be preserved ($dir)")
      assert(out("nullKey").isEmpty, s"NULL-key left row matched ($dir)")
      assert(out("nullTs").isEmpty, s"NULL-ts left row matched ($dir)")
      assert(!out.values.flatten.toSet.exists(v => v == 666.0 || v == 667.0),
        s"NULL-key/ts right row fabricated a match ($dir)")
    }
    val back = AsOfJoin.backward(l, r, Seq("sym"), "ts", "ts")
      .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
    assert(back("ok") == Some(100.0))
  }
}
