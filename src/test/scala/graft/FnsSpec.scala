package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Golden tests ported from the reference's cross-db macro fixtures
  * (tests/functional/adapter/test_utils.py and the maxcompute regression
  * suite — see FIXTURES.md §8). */
class FnsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect().head.getAs[T]("v")

  test("datediff boundary: 1999-12-31 23:59:59.999999 → 2000-01-01 is 1 for every part") {
    val a = lit("1999-12-31 23:59:59.999999").cast("timestamp")
    val b = lit("2000-01-01 00:00:00").cast("timestamp")
    for (part <- Seq("year", "quarter", "month", "day", "hour",
        "minute", "second", "millisecond", "microsecond"))
      assert(one[Long](Fns.dateDiff(part, a, b)) == 1L, s"part=$part")
    // week is ISO-Monday-boundary counting: Fri→Sat crosses none,
    // Sun→Mon crosses one
    assert(one[Long](Fns.dateDiff("week", a, b)) == 0L)
    assert(one[Long](Fns.dateDiff("week",
      lit("2024-01-14").cast("timestamp"), lit("2024-01-15").cast("timestamp"))) == 1L)
  }

  test("datediff is signed (b − a)") {
    val a = lit("2000-01-01").cast("timestamp")
    val b = lit("1999-01-01").cast("timestamp")
    assert(one[Long](Fns.dateDiff("year", a, b)) == -1L)
    assert(one[Long](Fns.dateDiff("day", a, b)) == -365L)
  }

  test("datediff quarter formula") {
    val a = lit("2023-02-15").cast("timestamp")
    val b = lit("2024-05-01").cast("timestamp")
    assert(one[Long](Fns.dateDiff("quarter", a, b)) == 5L) // (2024-2023)*4 + 2-1
  }

  test("dateadd week=7 days, quarter=3 months") {
    val d = lit("2024-01-15").cast("date")
    assert(one[java.sql.Date](Fns.dateAddDate("week", 2, d)).toString == "2024-01-29")
    assert(one[java.sql.Date](Fns.dateAddDate("quarter", 1, d)).toString == "2024-04-15")
    assert(one[java.sql.Date](Fns.dateAddDate("year", -1, d)).toString == "2023-01-15")
  }

  test("dateadd preserves time-of-day on timestamps for every part") {
    val t = lit("2024-03-01 12:34:56").cast("timestamp")
    for (part <- Seq("year", "quarter", "month", "week", "day")) {
      val got = one[java.sql.Timestamp](Fns.dateAdd(part, 1, t))
      assert(got.toString.endsWith("12:34:56.0"),
        s"$part dropped time-of-day: $got")
    }
    assert(one[java.sql.Timestamp](Fns.dateAdd("day", 1, t)).toString ==
      "2024-03-02 12:34:56.0")
  }

  test("last_day month/year/week; quarter is a compile error (reference parity)") {
    val d = lit("2024-02-15").cast("date")
    assert(one[java.sql.Date](Fns.lastDayOf(d, "month")).toString == "2024-02-29")
    assert(one[java.sql.Date](Fns.lastDayOf(d, "year")).toString == "2024-12-31")
    assert(one[java.sql.Date](Fns.lastDayOf(d, "week")).toString == "2024-02-18")
    intercept[IllegalArgumentException](Fns.lastDayOf(d, "quarter"))
  }

  test("split_part 1-based and negative-from-end") {
    val s = lit("a#b#c")
    assert(one[String](Fns.splitPart(s, "#", 1)) == "a")
    assert(one[String](Fns.splitPart(s, "#", 3)) == "c")
    assert(one[String](Fns.splitPart(s, "#", -1)) == "c")
    assert(one[String](Fns.splitPart(s, "#", -3)) == "a")
  }

  test("right: n=0 ⇒ '', n=len ⇒ identity (regression test_right_full_length)") {
    for ((str, n) <- Seq(("abc", 3), ("hello", 5), ("a", 1), ("december", 8)))
      assert(one[String](Fns.rightN(lit(str), lit(n))) == str)
    assert(one[String](Fns.rightN(lit("hello"), lit(0))) == "")
    assert(one[String](Fns.rightN(lit("hello"), lit(2))) == "lo")
  }

  test("hash: NULL hashes to md5('') (regression test_hash_null)") {
    assert(one[String](Fns.hashNull(lit(null).cast("string"))) ==
      "d41d8cd98f00b204e9800998ecf8427e")
    assert(one[String](Fns.hashNull(lit("hello"))) ==
      "5d41402abc4b2a76b9719d911017c592")
  }

  test("listagg ordered within group; limit raises (reference parity)") {
    val df = Seq((1, "c", 3), (1, "a", 1), (1, "b", 2), (2, "z", 1))
      .toDF("g", "v", "o")
    val out = df.groupBy($"g")
      .agg(Fns.listaggOrdered($"v", "_|_", $"o").as("agg"))
      .orderBy($"g").collect()
    assert(out(0).getString(1) == "a_|_b_|_c")
    assert(out(1).getString(1) == "z")
    intercept[IllegalArgumentException](
      Fns.listaggOrdered($"v", ",", $"o", Some(3)))
  }

  test("date spine is end-EXCLUSIVE (reference macro contract)") {
    // datediff(start, end, day) = 30 rows; end itself never appears
    val d = spark.range(1).select(explode(Fns.dateSpineCol("day",
      lit("2024-01-01").cast("date"), lit("2024-01-31").cast("date"))).as("d"))
    assert(d.count() == 30)
    assert(d.filter(col("d") === lit("2024-01-31").cast("date")).count() == 0)
    val df = Fns.dateSpineDf(spark, "month", "2024-01-01", "2024-12-01")
    assert(df.columns.toSeq == Seq("date_month"))
    assert(df.count() == 11)
  }

  test("array_construct produces a typed empty array") {
    val df = spark.range(1).select(Fns.arrayConstruct("int").as("a"))
    assert(df.schema("a").dataType.simpleString == "array<int>")
    assert(df.select(size($"a")).collect().head.getInt(0) == 0)
  }

  test("cast_bool_to_text and safe_cast") {
    assert(one[String](Fns.castBoolToText(lit(true))) == "true")
    assert(one[String](Fns.castBoolToText(lit(null).cast("boolean"))) == null)
    assert(one[java.lang.Integer](Fns.safeCast(lit("abc"), "int")) == null)
    assert(one[java.lang.Integer](Fns.safeCast(lit("42"), "int")) == 42)
  }

  test("scd hash matches md5 of pipe-joined coalesced strings") {
    assert(one[String](Fns.scdId(lit(7), lit(null).cast("string"))) ==
      one[String](md5(lit("7|"))))
  }
}
