package graft.examples

import graft.{SparkEntry, Verify}

/** Dump `.explain("formatted")` of named SparkEntry queries to files —
  * the plan evidence for the optimization rounds (`plans/r18/…`).
  * Usage: runMain graft.examples.PlanDump <sfDir> <outDir> <suffix> name…
  * Writes `<outDir>/<name>_<suffix>.txt`. The m-family queries run their
  * materialization side effects while the plan of the RETURNED frame is
  * built, so dumping them executes the lifecycle too — acceptable here
  * (this is an offline evidence tool, never part of the bench). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
