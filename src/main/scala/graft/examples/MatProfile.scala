package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Job-count + wall-time profile of the write-path (m-family) queries that
  * BENCH_r03 flagged as regressed. Each query runs N times; we report the
  * per-run Spark JOB count (the fixed-overhead driver at sf0.1) and the
  * min/median wall time, so diet changes show up as structural deltas, not
  * noise. */
object MatProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("m02_view", "m03_incr_merge", "m04_incr_merge_autopart",
        "m08_insert_overwrite_static", "m09_microbatch", "m10_snapshot_scd2",
        "m11_seed_csv", "m14_mview_refresh")
    val spark = graft.Verify.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    // warmup
    spark.range(10000000L).selectExpr("sum(id)").collect()
    Seq("orders", "customer", "events", "lineitem", "part").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").selectExpr("count(*)").collect()
    }
    val qmap = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = qmap(name)
      val times = (1 to reps).map { _ =>
        jobs.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, jobs.get())
      }
      val ts = times.map(_._1).sorted
      println(f"$name%-28s jobs=${times.map(_._2).max}%3d  " +
        f"min=${ts.head}%6.2f  med=${ts(ts.size / 2)}%6.2f  max=${ts.last}%6.2f")
    }
    spark.stop()
  }
}
