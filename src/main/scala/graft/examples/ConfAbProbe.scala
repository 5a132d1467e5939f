package graft.examples

import graft.{SparkEntry, Verify}

/** Config A/B harness (r19, guide §1.2 "configuration last, measured"):
  * run named SparkEntry queries under session-level conf overrides and
  * print per-query seconds, so a join-preference or shuffle-codec flip is
  * adopted from numbers, not folklore. Overrides apply at session BUILD
  * time (the shuffle codec cannot be set on a live context).
  *
  * Usage: runMain graft.examples.ConfAbProbe <sfDir> <reps> <k=v,k=v|none> name…
  */
object ConfAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val confs: Map[String, String] =
      if (args(2) == "none") Map.empty
      else args(2).split(",").map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toMap
    val names = args.drop(3).toSeq
    val spark = Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), confs)
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[confab] overrides: ${if (confs.isEmpty) "none" else confs}")
    // warmup: JIT + first-touch IO outside every measured window
    spark.range(10000000L).selectExpr("sum(id)").collect()
    names.foreach { n =>
      try { SparkEntry.queries(n)(spark, sfDir).count() }
      catch { case e: Throwable =>
        println(s"[confab] $n warmup failed: ${e.getMessage}") }
      spark.catalog.clearCache()
    }
    names.foreach { n =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[confab] $n%-34s min ${ts.min}%7.2f s  " +
        f"median ${ts.sorted.apply(reps / 2)}%7.2f s  " +
        ts.map(t => f"$t%.2f").mkString("(", ", ", ")"))
    }
    spark.stop()
  }
}
