package graft

import org.apache.spark.sql.functions._
import graft.exec.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns identical results to the plain join") {
    val big = (1 to 10000).map(i => (if (i % 2 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "v") // heavy skew on k=1
    val small = Seq((1L, "one"), (3L, "three"), (5L, "five")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).orderBy($"v").collect().toSeq
    val salted = Skew.saltedJoin(big, small, Seq("k")).orderBy($"v").collect().toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("right/full outer joins are rejected (would duplicate unmatched small rows)") {
    val big = Seq((1L, "a")).toDF("k", "v")
    val small = Seq((1L, "one"), (9L, "nine")).toDF("k", "name")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer"))
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(big, small, Seq("k"), jt)
      }
    // semi/anti stay allowed and exact
    val anti = Skew.saltedJoin(big, small, Seq("k"), "left_anti").collect()
    assert(anti.isEmpty)
    val semi = Skew.saltedJoin(big, small, Seq("k"), "left_semi").collect()
    assert(semi.map(_.getString(1)).toSeq == Seq("a"))
  }

  test("salted left join preserves unmatched rows exactly once") {
    val big = Seq((1L, "a"), (2L, "b"), (2L, "b2")).toDF("k", "v")
    val small = Seq((1L, "one")).toDF("k", "name")
    val got = Skew.saltedJoin(big, small, Seq("k"), "left")
      .orderBy($"v").collect().map(_.toSeq).toSeq
    assert(got.length == 3)
    assert(got.count(_.last == null) == 2)
  }
}
