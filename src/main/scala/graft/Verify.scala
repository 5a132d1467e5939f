package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The one session every driver surface (Verify/Bench/probes) builds.
    * `extraConfs` (r19) is the config A/B seam — session-level settings
    * like the shuffle codec must be set BEFORE the context starts, so
    * probes measuring a config change pass overrides here; the default is
    * empty and the driver contract unchanged. */
  def session(cpus: String,
      extraConfs: Map[String, String] = Map.empty): SparkSession =
    extraConfs.foldLeft(baseBuilder(cpus)) { case (b, (k, v)) =>
      b.config(k, v)
    }.getOrCreate()

  private def baseBuilder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // Spark fires a DISTRIBUTED job to list partition dirs above 32 paths —
    // sized for HDFS-NameNode-era clusters. Client-side listing of ≤1k
    // paths is faster than a job round-trip even on object stores; above
    // 1k (real 100 TB tables) the distributed path still kicks in.
    .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // localCheckpoint/persist blocks are reclaimed by the ContextCleaner,
    // which only learns a block is dead when the JVM GCs the reference —
    // on a big heap a many-query session can run for many minutes without
    // a single full GC, dead blocks pile up in the block manager, and
    // per-query wall-clock degrades 2-5x (measured at sf1 with a 48g
    // driver: d09's CC stage 3.2 s -> 16.1 s by rep 2; flat at 16g where
    // GC runs). Spark's own remedy is the periodic-GC cleaner tick —
    // default 30 min, far past a bench run; 90 s bounds the garbage
    // window at negligible GC cost.
    .config("spark.cleaner.periodicGC.interval", "90s")
    .config("spark.sql.warehouse.dir", {
      val wh = Files.createTempDirectory("graft_wh")
      // exit-time delete AFTER Spark's own teardown (low-priority hook on
      // the ordered Hadoop manager — a plain Runtime hook races Spark's
      // shutdown writes and can lose): repeated sessions must not
      // accumulate warehouse dirs under /tmp
      org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
        new Runnable {
          def run(): Unit = {
            def del(f: java.io.File): Unit = {
              Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
            }
            del(wh.toFile)
          }
        }, 1)
      wh.toString
    })
    .config("spark.ui.enabled", "false")

  /** Run one query and dump it under `outDir/<name>`. A THROWN query must
    * stay visible: it leaves an (otherwise parquet-less) output dir holding
    * `_error.txt`, so the checker sees an explicit NOOUT/err row instead of
    * a silently shorter query list (the round-8 q26 escape). Returns the
    * error message, if any. */
  def runOne(spark: SparkSession, name: String,
      fn: (SparkSession, String) => DataFrame,
      sfDir: String, outDir: String): Option[String] =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      None
    } catch { case e: Throwable =>
      val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}"
      System.err.println(s"[verify] $name failed: $msg")
      val d = Paths.get(outDir, name)
      try {
        Files.createDirectories(d)
        // clear stale parquet from a previous successful run: a dir with
        // both an old result and _error.txt would read as a (stale) pass.
        // Files.list/walk streams hold directory handles — close them.
        val ls = Files.list(d)
        try ls.forEach { p =>
          if (p.getFileName.toString != "_error.txt") {
            if (Files.isDirectory(p)) {
              val w = Files.walk(p)
              try w.sorted(java.util.Comparator.reverseOrder())
                .forEach(Files.delete(_))
              finally w.close()
            } else Files.delete(p)
          }
        } finally ls.close()
        Files.writeString(d.resolve("_error.txt"), msg + "\n")
      } catch { case io: Throwable =>
        System.err.println(s"[verify] $name: cannot write error artifact: $io")
      }
      Some(msg)
    }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated name filter for local iteration on one query
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).filter(_.nonEmpty)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        runOne(spark, name, fn, sfDir, outDir).foreach(errors(name) = _)
        spark.catalog.clearCache() // see Bench: bound per-query cache growth
      }
    // the oracle map must match the queries this RUN dumped: under a
    // SPARK_GRAFT_ONLY filter an unfiltered map would make the checker's
    // EXPECTED−ACTUAL drift report flag every skipped query
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // machine-readable failure roll-up next to oracle_sql.json: the checker
    // cross-references it so EXPECTED−ACTUAL drift is always explained
    Files.writeString(Paths.get(s"$outDir/_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
