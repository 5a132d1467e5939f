package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.Incremental
import graft.mat.Materializer

/** Structural guard on the write path's FIXED job count. At sf0.1 the
  * m-family cost is dominated by per-materialization job overhead, not
  * data (round-3 regression); these bounds pin the job diet (fused
  * dup-key guard, single touched collect, no distributed listing below
  * 1k paths, conditional REFRESH) so an accidental extra pass fails a
  * spec instead of surfacing as a 2× bench regression. */
class JobCountSpec extends SparkSpec {
  import spark.implicits._

  private def countJobs(f: => Unit): Int = {
    val n = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      // listener bus is async: wait for the count to go quiet
      var prev = -1
      var cur = n.get()
      var spins = 0
      while (prev != cur && spins < 50) {
        Thread.sleep(100); prev = cur; cur = n.get(); spins += 1
      }
      cur
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("partitioned merge stays within its fixed job budget") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = TableRef("default.jc_merge")
    Materializer.table(spark, ref,
      (1 to 40).map(i => (i.toLong, s"v$i", s"p${i % 4}")).toDF("id", "v", "pt"),
      part)
    val delta = (1 to 10).map(i => (i.toLong, s"N$i", s"p${i % 4}"))
      .toDF("id", "v", "pt")
    val jobs = countJobs {
      Incremental.merge(spark, ref, delta, uniqueKey = Seq("id"),
        partition = part)
    }
    info(s"partitioned merge jobs = $jobs")
    // measured 8–10 under AQE (touched collect + staged write sub-jobs);
    // the pre-diet shape (separate dup-guard job + distributed listings)
    // sat 3–4 above that
    assert(jobs <= 12, s"merge fixed job count regressed: $jobs")
    assert(spark.table(ref.render).filter($"v".startsWith("N")).count() == 10)
  }

  test("unpartitioned merge stays within its fixed job budget") {
    val ref = TableRef("default.jc_merge_flat")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable(ref.render)
    val jobs = countJobs {
      Incremental.merge(spark, ref, Seq((2L, "B"), (3L, "c")).toDF("id", "v"),
        uniqueKey = Seq("id"))
    }
    info(s"unpartitioned merge jobs = $jobs")
    assert(jobs <= 8, s"flat merge fixed job count regressed: $jobs")
  }

  test("dynamic insert_overwrite stays within its fixed job budget") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = TableRef("default.jc_dyn")
    Materializer.table(spark, ref,
      (1 to 20).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "pt"), part)
    val jobs = countJobs {
      Incremental.insertOverwriteDynamic(spark, ref,
        Seq((100L, "p1")).toDF("id", "pt"), part)
    }
    info(s"dynamic overwrite jobs = $jobs")
    assert(jobs <= 6, s"dynamic overwrite fixed job count regressed: $jobs")
  }
}
