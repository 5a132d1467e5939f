package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.TableRef
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy
import graft.settings.SettingParser

/** Thin SQL-model layer: lets a dbt-maxcompute user bring model BODIES
  * (SQL + `{{ ref('…') }}` / `{{ source('…','…') }}` / `{{ this }}`)
  * unchanged. Jinja control flow is out of scope (dbt-core renders it before
  * the adapter ever sees SQL — reference lifecycle §3.1 step 1); what reaches
  * the engine is SQL with relation placeholders, which is what we render.
  */
object SqlModels {

  private val refRx = """\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}""".r
  private val sourceRx = """\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}""".r
  private val thisRx = """\{\{\s*this\s*\}\}""".r

  /** Render ref()/source()/this placeholders to catalog names.
    * @param resolveRef   model name → relation
    * @param resolveSource (source, table) → relation */
  def render(sql: String, self: TableRef,
      resolveRef: String => TableRef,
      resolveSource: (String, String) => TableRef): String = {
    val s1 = refRx.replaceAllIn(sql,
      m => java.util.regex.Matcher.quoteReplacement(resolveRef(m.group(1)).render))
    val s2 = sourceRx.replaceAllIn(s1,
      m => java.util.regex.Matcher.quoteReplacement(
        resolveSource(m.group(1), m.group(2)).render))
    thisRx.replaceAllIn(s2, java.util.regex.Matcher.quoteReplacement(self.render))
  }

  /** Referenced model names (for DAG edges). */
  def refsOf(sql: String): Seq[String] =
    refRx.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  /** Build + run a SQL model end-to-end: extract the `SET k=v;` header,
    * render placeholders, materialize. The default resolver maps model
    * names into `db`. */
  def runSqlModel(spark: SparkSession, db: String, name: String, sql: String,
      materialization: String = "table",
      uniqueKey: Seq[String] = Nil,
      sources: Map[(String, String), TableRef] = Map.empty): TableRef = {
    val self = TableRef(s"$db.$name")
    val parsed = SettingParser.parse(sql)
    // a malformed SET header is a model bug — surface it, don't silently
    // run the model without the setting the user asked for
    if (parsed.errors.nonEmpty)
      throw new IllegalArgumentException(
        s"model $name: SET-header errors: ${parsed.errors.mkString("; ")}")
    parsed.settings.foreach { case (k, v) =>
      if (k.startsWith("spark.") && spark.conf.isModifiable(k)) spark.conf.set(k, v)
    }
    // dbt.execution_mode / dbt.quota_name are CLIENT-routed, never sent to
    // the engine (ref wrapper.py:78-104) — map to the scheduler pool
    graft.settings.EngineConf.route(spark, parsed.settings)
    val rendered = render(parsed.remainingQuery, self,
      ref => TableRef(s"$db.$ref"),
      (s, t) => sources.getOrElse((s, t), TableRef(s"$s.$t")))
    materialization match {
      case "table" => Materializer.table(spark, self, spark.sql(rendered))
      case "view" => Materializer.view(spark, self, rendered)
      case "incremental_merge" =>
        Materializer.incremental(spark, self, spark.sql(rendered),
          IncrementalStrategy.Merge(), uniqueKey = uniqueKey)
      case "incremental_append" =>
        Materializer.incremental(spark, self, spark.sql(rendered),
          IncrementalStrategy.Append)
      case "materialized_view" =>
        Materializer.materializedView(spark, self, rendered)
      case other => throw new IllegalArgumentException(s"materialization: $other")
    }
    self
  }
}
