package graft.settings

import org.apache.spark.sql.SparkSession

/** Engine configuration layer:
  *
  *  - default hints merged UNDER user hints (ref context.py:3-13 — the
  *    reference's odps.* defaults become their Spark equivalents here);
  *  - execution-mode routing (ref wrapper.py:78-104: `offline` vs `maxqa`
  *    interactive): Spark has one engine, so modes map to scheduler pools +
  *    conf profiles — semantics-neutral, latency-oriented knobs only.
  */
object EngineConf {

  /** Spark equivalents of the reference's default hints. */
  val defaults: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",                    // credentials.py:112-116
    "spark.sql.sources.partitionOverwriteMode" -> "dynamic",  // insert_overwrite semantics
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.crossJoin.enabled" -> "true",                  // odps.sql.allow.cartesian
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS")

  sealed trait ExecutionMode { def pool: String }
  /** Batch engine (default). */
  case object Offline extends ExecutionMode { val pool = "default" }
  /** Interactive: FAIR-scheduled pool so short queries aren't starved by
    * batch jobs (the engine-side analogue of MaxQA routing). */
  case object Interactive extends ExecutionMode { val pool = "interactive" }

  def parseMode(s: String): ExecutionMode = s.toLowerCase match {
    case "offline" | "" => Offline
    case "maxqa" | "interactive" => Interactive
    case other => throw new IllegalArgumentException(s"unknown execution mode: $other")
  }

  /** Apply defaults (user conf wins), honoring the reference's merge order
    * (defaults under user hints — context.py:3). */
  def applyDefaults(spark: SparkSession, user: Map[String, String] = Map.empty): Unit = {
    (defaults ++ user).foreach { case (k, v) =>
      if (spark.conf.isModifiable(k)) spark.conf.set(k, v)
    }
  }

  /** Route subsequent jobs on this thread to the mode's scheduler pool.
    * The `dbt.execution_mode`/`dbt.quota_name` pseudo-hints are consumed
    * here and never reach query execution (ref wrapper.py:78-93). */
  def route(spark: SparkSession, settings: Map[String, String]): ExecutionMode = {
    val mode = parseMode(settings.getOrElse("dbt.execution_mode", "offline"))
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", mode.pool)
    mode
  }
}
