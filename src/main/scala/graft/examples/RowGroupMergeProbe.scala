package graft.examples

import org.apache.spark.sql.functions._

/** Feasibility probe for row-group-level parquet merge
  * (ParquetFileWriter.appendFile): two Spark-written files of one schema
  * are stitched into one file by COPYING row groups (no decode/re-encode),
  * and the result must (a) read back in Spark with the exact union row
  * set, (b) carry per-column footer min/max spanning both sources, (c)
  * hold one row group per source file (proof nothing was re-encoded).
  * Run: tools/run.sh graft.examples.RowGroupMergeProbe */
object RowGroupMergeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Verify.session("8")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("rgm").toString
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.01", "documents")
      .select($"doc_id", $"lang", $"n_chars")
    docs.filter($"doc_id" % 2 === 0).coalesce(1)
      .write.parquet(s"$base/a")
    docs.filter($"doc_id" % 2 === 1).coalesce(1)
      .write.parquet(s"$base/b")
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = spark.sessionState.newHadoopConf()
    def onePart(d: String): HPath = {
      val fs = new HPath(d).getFileSystem(conf)
      fs.listStatus(new HPath(d)).map(_.getPath)
        .find(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
        .get
    }
    val (fa, fb) = (onePart(s"$base/a"), onePart(s"$base/b"))
    import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
    import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
    val footA = ParquetFileReader.readFooter(conf, fa)
    val footB = ParquetFileReader.readFooter(conf, fb)
    println(s"[rgm] schemaA == schemaB: ${
      footA.getFileMetaData.getSchema == footB.getFileMetaData.getSchema}")
    val out = new HPath(s"$base/merged.parquet")
    val w = new ParquetFileWriter(HadoopOutputFile.fromPath(out, conf),
      footA.getFileMetaData.getSchema, ParquetFileWriter.Mode.CREATE,
      134217728L, 8388608)
    w.start()
    w.appendFile(HadoopInputFile.fromPath(fa, conf))
    w.appendFile(HadoopInputFile.fromPath(fb, conf))
    w.end(footA.getFileMetaData.getKeyValueMetaData)
    val foot = ParquetFileReader.readFooter(conf, out)
    println(s"[rgm] merged row groups: ${foot.getBlocks.size()} " +
      s"(a: ${footA.getBlocks.size()}, b: ${footB.getBlocks.size()})")
    val got = spark.read.parquet(out.toString)
    val n = got.count()
    val want = docs.count()
    println(s"[rgm] rows: merged=$n source=$want equal=${n == want}")
    val s1 = got.agg(min($"doc_id"), max($"doc_id"), sum($"n_chars"))
      .collect()(0)
    val s2 = docs.agg(min($"doc_id"), max($"doc_id"), sum($"n_chars"))
      .collect()(0)
    println(s"[rgm] aggregates equal: ${s1 == s2}  ($s1 vs $s2)")
    // footer stats: per-block column statistics must be present (pruning
    // reads these)
    import scala.jdk.CollectionConverters._
    val stats = foot.getBlocks.asScala.flatMap(_.getColumns.asScala
      .filter(_.getPath.toDotString == "doc_id").map(_.getStatistics))
    println(s"[rgm] doc_id block stats: " + stats.map(s =>
      s"[${s.genericGetMin}, ${s.genericGetMax}]").mkString(" "))
    // predicate pushdown over the merged file still prunes/filters right
    val f = got.filter($"doc_id" < 100).count()
    val wantF = docs.filter($"doc_id" < 100).count()
    println(s"[rgm] filtered read equal: ${f == wantF}")
    spark.stop()
  }
}
