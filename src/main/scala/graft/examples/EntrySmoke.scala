package graft.examples
/** Driver-contract smoke: SparkEntry.entry must return rows at sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Verify.session("8")
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry] rows=$n")
    require(n > 0)
    spark.stop()
  }
}
