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

  test("plan is one window over the union, not a range join") {
    val plan = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", "ts")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("join"))
  }
}
