package graft.examples

import graft.Verify

/** Time the lifecycle-proof rows (s18 retrain-rotate, s23 as-of search,
  * m32 guarded streaming ingest) in isolation, N warm repetitions each —
  * the measurement harness for VERDICT r15 #8's "trim the duplicate
  * scans, keep the proofs". Run before and after a caching change. */
object LifecycleTrimProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names: Set[String] =
      if (args.length > 2) args.drop(2).toSet
      else Set("s18_cosine_topk_rotate", "s23_cosine_topk_asof")
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries.filter(k => names.contains(k._1))
    // warmup: one full pass unmeasured
    qs.foreach { case (_, fn) => fn(spark, dir).collect() }
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: min ${ts.min}%.2f s  median ${ts.sorted.apply(reps / 2)}%.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
