package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Property tests for the date/string function layer: the invariants the
  * reference's conformance fixtures sample pointwise, checked over generated
  * inputs (fixed ScalaCheck seed — deterministic). Inputs are evaluated as
  * one batched Spark job per property. */
class FnsPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): List[T] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  private val dayGen: Gen[java.sql.Date] =
    Gen.choose(0L, 20000L).map(d => java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(d)))

  test("datediff antisymmetry: diff(a,b) == -diff(b,a) for every part") {
    val pairs = sample(Gen.zip(dayGen, dayGen), 200)
    val df = pairs.toDF("a", "b")
      .select(col("a").cast("timestamp").as("a"), col("b").cast("timestamp").as("b"))
    for (part <- Seq("year", "quarter", "month", "week", "day", "hour")) {
      val out = df.select(Fns.dateDiff(part, col("a"), col("b")).as("f"),
          Fns.dateDiff(part, col("b"), col("a")).as("w")).collect()
      assert(out.forall(r => r.getLong(0) == -r.getLong(1)), s"part=$part")
    }
  }

  test("dateadd/datediff consistency: diff(d, dateadd(part, n, d)) == n") {
    val inputs = sample(Gen.zip(dayGen, Gen.choose(-50, 50)), 200)
    for (part <- Seq("year", "quarter", "month", "week", "day")) {
      val df = inputs.toDF("d", "n")
      val added = part match {
        case "year"    => add_months(col("d"), col("n") * 12)
        case "quarter" => add_months(col("d"), col("n") * 3)
        case "month"   => add_months(col("d"), col("n"))
        case "week"    => date_add(col("d"), col("n") * 7)
        case "day"     => date_add(col("d"), col("n"))
      }
      val out = df.select(col("n").cast("long").as("n"),
          Fns.dateDiff(part, col("d").cast("timestamp"), added.cast("timestamp")).as("got"))
        .collect()
      assert(out.forall(r => r.getLong(0) == r.getLong(1)), s"part=$part")
    }
  }

  test("date_trunc is idempotent and never after its input") {
    val days = sample(dayGen, 300)
    for (part <- Seq("year", "quarter", "month", "week", "day")) {
      val out = days.map(Tuple1(_)).toDF("d")
        .select(col("d").cast("timestamp").as("ts"))
        .select(Fns.dateTrunc(part, col("ts")).as("t1"),
          Fns.dateTrunc(part, Fns.dateTrunc(part, col("ts"))).as("t2"), col("ts"))
        .collect()
      assert(out.forall(r => r.getTimestamp(0) == r.getTimestamp(1)), s"idempotent $part")
      assert(out.forall(r => !r.getTimestamp(0).after(r.getTimestamp(2))), s"monotone $part")
    }
  }

  test("last_day: >= input, < input + 1 part, and boundary-stable across the period") {
    val days = sample(dayGen, 300)
    for (part <- Seq("year", "month", "week")) {
      val out = days.map(Tuple1(_)).toDF("d")
        .select(Fns.lastDayOf(col("d"), part).as("ld"),
          Fns.lastDayOf(Fns.dateTrunc(part, col("d").cast("timestamp")).cast("date"), part).as("ld_start"),
          col("d"))
        .collect()
      assert(out.forall(r => !r.getDate(0).before(r.getDate(2))), s"$part: ld >= d")
      // every day of a period maps to the same last day
      assert(out.forall(r => r.getDate(0) == r.getDate(1)), s"$part: stable")
    }
  }

  test("splitPart reassembles the original string") {
    val tokGen = Gen.listOfN(4, Gen.alphaStr.suchThat(_.nonEmpty))
    val strs = sample(tokGen, 100).map(_.mkString("#"))
    val out = strs.map(Tuple1(_)).toDF("s")
      .select(concat_ws("#",
        Fns.splitPart(col("s"), "#", 1), Fns.splitPart(col("s"), "#", 2),
        Fns.splitPart(col("s"), "#", 3), Fns.splitPart(col("s"), "#", 4)).as("r"),
        col("s"))
      .collect()
    assert(out.forall(r => r.getString(0) == r.getString(1)))
  }

  test("rightN(s, n) + everything before it == s") {
    val strGen = Gen.alphaStr.suchThat(_.nonEmpty)
    val inputs = sample(Gen.zip(strGen, Gen.choose(0, 20)), 200)
    val out = inputs.toDF("s", "n")
      .select(col("s"),
        concat(expr("substring(s, 1, greatest(length(s) - n, 0))"),
          Fns.rightN(col("s"), least(col("n"), length(col("s"))))).as("r"))
      .collect()
    assert(out.forall(r => r.getString(0) == r.getString(1)))
  }

  test("splitPart matches the reference model incl. out-of-range ⇒ ''") {
    // strings over a tiny alphabet with embedded delimiters; n spans well
    // past the part count on both sides
    val strGen = Gen.listOfN(8,
      Gen.oneOf("a", "b", "#", "ab", "#a", "")).map(_.mkString)
    val inputs = sample(Gen.zip(strGen, Gen.choose(-6, 6).suchThat(_ != 0)), 300)
    def model(s: String, n: Int): String = {
      val parts = s.split(java.util.regex.Pattern.quote("#"), -1)
      val i = if (n > 0) n - 1 else parts.length + n
      if (i >= 0 && i < parts.length) parts(i) else ""
    }
    inputs.groupBy(_._2).foreach { case (n, grp) =>
      val ss = grp.map(_._1)
      val got = ss.toDF("s").select(Fns.splitPart(col("s"), "#", n).as("p"))
        .collect().map(_.getString(0)).toSeq
      val want = ss.map(model(_, n))
      assert(got == want, s"n=$n")
    }
  }

  test("tokenBudget decomposition == window form on random corpora (property)") {
    // random strata, HEAVILY quantized scores (forces modal tie groups,
    // the case the decomposition exists for), zero-token rows, budgets
    // straddling every regime from starved to keep-all — decomposed and
    // bucketed forms must equal the literal window form on every draw
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c")
      score <- Gen.choose(0, 3).map(_.toDouble)
      tok <- Gen.frequency(1 -> Gen.const(0L), 5 -> Gen.choose(1L, 20L))
    } yield (g, score, tok)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    for (seed <- 1L to 5L) {
      val rows = Gen.listOfN(300, rowGen)
        .pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case ((g, sc, tk), i) => (i.toLong, g, sc, tk) }
      val df = rows.toDF("doc_id", "g", "score", "n_tok").cache()
      for (budget <- Seq(25L, 150L, 900L, 100000L)) {
        val expected = df.withColumn("__c", sum(col("n_tok")).over(w))
          .filter(col("__c") <= budget).drop("__c")
          .as[(Long, String, Double, Long)].collect().toSet
        val plain = graft.llm.Sampling.tokenBudget(df, col("g"), col("n_tok"),
            col("score"), col("doc_id"), budget)
          .as[(Long, String, Double, Long)].collect().toSet
        val bucketed = graft.llm.Sampling.tokenBudget(df, col("g"), col("n_tok"),
            col("score"), col("doc_id"), budget,
            tieBucket = Some(floor(col("doc_id") / 32)))
          .as[(Long, String, Double, Long)].collect().toSet
        assert(plain == expected, s"plain: seed=$seed budget=$budget")
        assert(bucketed == expected, s"bucketed: seed=$seed budget=$budget")
      }
      df.unpersist()
    }
  }
}
