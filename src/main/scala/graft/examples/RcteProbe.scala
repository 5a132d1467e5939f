package graft.examples

/** Does this Spark build support WITH RECURSIVE? */
object RcteProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Verify.session("4")
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.sql(
        """WITH RECURSIVE r(n) AS (
          |  SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 5)
          |SELECT sum(n) AS s FROM r""".stripMargin)
      println("[rcte] result=" + df.collect().head.get(0))
    } catch {
      case e: Exception => println("[rcte] unsupported: " +
        e.getMessage.linesIterator.next())
    }
    spark.stop()
  }
}
