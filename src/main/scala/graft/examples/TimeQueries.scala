package graft.examples

import graft.{SparkEntry, Verify}

/** Time a subset of SparkEntry.queries with the bench's count() action
  * (args: sfDir name... ; repeats via SPARK_GRAFT_REPS, default 3). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val names = args.drop(1)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[time] $name%-30s ${ts.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
