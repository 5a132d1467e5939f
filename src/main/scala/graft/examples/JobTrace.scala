package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Print every Spark job (description + duration) fired by one query, to
  * attribute the fixed per-materialization job count. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("m04_incr_merge_autopart")
    val spark = graft.Verify.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        t0.put(js.jobId, System.nanoTime())
        val desc = Option(js.properties.getProperty("spark.job.description"))
          .orElse(Option(js.properties.getProperty("callSite.short")))
          .getOrElse("?")
        val stages = js.stageInfos.map(si =>
          s"${si.name.takeWhile(_ != '\n').take(60)}[${si.numTasks}]")
          .mkString(" | ")
        println(f"JOB ${js.jobId}%3d START $desc :: $stages")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val dt = (System.nanoTime() - t0.getOrDefault(je.jobId, 0L)) / 1e9
        println(f"JOB ${je.jobId}%3d END   ${dt}%6.2f s")
      }
    })
    spark.range(10000000L).selectExpr("sum(id)").collect()
    Seq("orders", "customer", "events").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").selectExpr("count(*)").collect()
    }
    // one throwaway run to absorb first-touch costs, then the traced run
    graft.SparkEntry.queries(name)(spark, dir).count()
    spark.catalog.clearCache()
    println("=== traced run ===")
    val w0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir).count()
    println(f"WALL ${(System.nanoTime() - w0) / 1e9}%.2f s")
    spark.stop()
  }
}
