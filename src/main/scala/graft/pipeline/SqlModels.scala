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

  // dbt accepts single- OR double-quoted arguments, and ref() takes an
  // optional leading package argument: ref('m'), ref("m"), ref('pkg','m').
  // An unmatched form would reach spark.sql as literal jinja and fail
  // cryptically — and worse, refsOf would silently drop the DAG edge.
  private val q = """(?:'([^']*)'|"([^"]*)")"""
  private val refRx = (s"""\\{\\{\\s*ref\\(\\s*(?:$q\\s*,\\s*)?$q\\s*\\)\\s*\\}\\}""").r
  private val sourceRx = (s"""\\{\\{\\s*source\\(\\s*$q\\s*,\\s*$q\\s*\\)\\s*\\}\\}""").r
  private val thisRx = """\{\{\s*this\s*\}\}""".r
  private val anyJinjaRx = """\{\{[\s\S]*?\}\}""".r

  private def grp(m: scala.util.matching.Regex.Match, first: Int): String =
    Option(m.group(first)).getOrElse(m.group(first + 1))

  /** Render ref()/source()/this placeholders to catalog names.
    * @param resolveRef   model name → relation (package arg, if any, ignored
    *                     — single-project resolution, like dbt in-project)
    * @param resolveSource (source, table) → relation */
  def render(sql: String, self: TableRef,
      resolveRef: String => TableRef,
      resolveSource: (String, String) => TableRef): String = {
    val s1 = refRx.replaceAllIn(sql,
      m => java.util.regex.Matcher.quoteReplacement(resolveRef(grp(m, 3)).render))
    val s2 = sourceRx.replaceAllIn(s1,
      m => java.util.regex.Matcher.quoteReplacement(
        resolveSource(grp(m, 1), grp(m, 3)).render))
    val out = thisRx.replaceAllIn(s2, java.util.regex.Matcher.quoteReplacement(self.render))
    // any placeholder still present is a form we do not support — fail with
    // the construct, not a downstream SQL parse error
    anyJinjaRx.findFirstIn(out).foreach { leftover =>
      throw new IllegalArgumentException(
        s"unsupported jinja construct (dbt-core renders full jinja before " +
          s"the adapter; this layer renders ref/source/this only): $leftover")
    }
    out
  }

  /** Referenced model names (for DAG edges). */
  def refsOf(sql: String): Seq[String] =
    refRx.findAllMatchIn(sql).map(grp(_, 3)).toSeq.distinct

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
    // SET-header settings are scoped to THIS model run and restored after:
    // spark.conf is session-global, so leaking them would hand every later
    // model (and concurrent ones on the shared session) this model's knobs.
    // NOTE the residual race: truly concurrent models with CONFLICTING
    // spark.* headers still share one SQLConf — per-model isolation needs
    // per-model sessions, which would lose shared temp views (ephemeral
    // models). ModelGraph runs same-session models; conflicting headers
    // across parallel models are a model-set bug either way.
    val applied = parsed.settings.filter { case (k, _) =>
      k.startsWith("spark.") && spark.conf.isModifiable(k)
    }
    val saved = applied.keys.map(k => k -> spark.conf.getOption(k)).toMap
    applied.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
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
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    self
  }
}
