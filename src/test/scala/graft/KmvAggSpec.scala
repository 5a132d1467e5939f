package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvAgg

class KmvAggSpec extends SparkSpec {
  import spark.implicits._

  test("sketch holds EXACTLY the k smallest distinct keys in unsigned hash order") {
    val df = (1L to 5000L).toDF("id").repartition(16) // force partial merges
      .agg(KmvAgg(xxhash64($"id"), 64).as("sk"))
    val got = df.select($"sk").as[Seq[Long]].collect().head
    // reference: the same engine hashes, fully sorted, truncated to k
    val hashes = (1L to 5000L).toDF("id").select(xxhash64($"id")).as[Long]
      .collect().map(_ ^ Long.MinValue).sorted.take(64).toSeq
    assert(got == hashes)
    assert(got == got.sorted)
  }

  test("duplicates collapse: a set ingested 10x yields the same sketch") {
    val once = (1L to 300L).toDF("id").agg(KmvAgg(xxhash64($"id"), 32).as("sk"))
      .select($"sk").as[Seq[Long]].collect().head
    val many = (0 until 10).map(_ => (1L to 300L).toDF("id"))
      .reduce(_ union _)
      .agg(KmvAgg(xxhash64($"id"), 32).as("sk"))
      .select($"sk").as[Seq[Long]].collect().head
    assert(once == many)
  }

  test("small group (< k) keeps every key — the exact regime") {
    val sk = (1L to 20L).toDF("id").agg(KmvAgg(xxhash64($"id"), 64).as("sk"))
      .select($"sk").as[Seq[Long]].collect().head
    assert(sk.size == 20)
  }

  test("union + intersection estimates land within theory on planted overlap") {
    val k = 1024
    // |A| = 60k, |B| = 60k, |A∩B| = 20k, |A∪B| = 100k
    val a = (1L to 60000L).toDF("id")
    val b = (40001L to 100000L).toDF("id")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(KmvAgg(xxhash64($"id"), k).as("sk"))
        .select($"sk").as[Seq[Long]].collect().head
    val (ska, skb) = (sk(a), sk(b))
    val merged = (ska ++ skb).distinct.sorted.take(k)
    val theta = merged.last.toDouble / 18446744073709551616.0 + 0.5
    val nUnion = (k - 1).toDouble / theta
    val sa = ska.toSet; val sb = skb.toSet
    val rho = merged.count(v => sa(v) && sb(v)).toDouble / merged.size
    val nInter = rho * nUnion
    info(f"union est $nUnion%.0f (true 100000), inter est $nInter%.0f (true 20000)")
    assert(math.abs(nUnion / 100000.0 - 1) <= 0.10, s"union $nUnion")
    assert(math.abs(nInter / 20000.0 - 1) <= 0.15, s"inter $nInter")
  }
}
