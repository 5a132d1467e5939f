package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-database scalar/aggregate function surface of the reference
  * (`dbt/include/maxcompute/macros/utils/ (19 .sql macro files)`), re-expressed as Spark
  * `Column` builders. Every builder composes codegen'd built-ins (no UDFs),
  * so the whole surface stays inside whole-stage codegen.
  *
  * Semantics pinned by the reference's conformance tests are reproduced
  * exactly — see SURVEY.md §2.3 for the file:line evidence per function.
  */
object Fns {

  // ---------------------------------------------------------------- hashing

  /** `hash(e)` = md5 of the string form, with NULL hashing to md5('').
    * Ref: utils/hash.sql:1-7 (+ regression test_hash_null.py). */
  def hashNull(c: Column): Column =
    when(c.isNull, md5(lit(""))).otherwise(md5(c.cast("string")))

  /** SCD-2 surrogate key: md5 of '|'-joined coalesced string casts.
    * Ref: materializations/snapshots/snapshot.sql:2-7. */
  def scdId(cols: Column*): Column =
    md5(concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  // ------------------------------------------------------------------ casts

  /** `cast_bool_to_text` → lower(cast(b as string)): 'true'/'false'/NULL.
    * Ref: utils/cast_bool_to_text.sql:3-5. */
  def castBoolToText(c: Column): Column = lower(c.cast("string"))

  /** `safe_cast` — non-ANSI (null on failure). Ref: utils/cast.sql:2-4. */
  def safeCast(c: Column, to: String): Column = c.try_cast(to)

  // ------------------------------------------------------------- date parts

  private val partAliases = Map(
    "yr" -> "year", "yyyy" -> "year", "qtr" -> "quarter", "mon" -> "month",
    "mm" -> "month", "wk" -> "week", "dd" -> "day", "hh" -> "hour",
    "mi" -> "minute", "ss" -> "second", "ms" -> "millisecond",
    "us" -> "microsecond")

  private def norm(part: String): String = {
    val p = part.toLowerCase
    partAliases.getOrElse(p, p)
  }

  /** `date(y,m,d)` literal. Ref: utils/date.sql:2-5. */
  def makeDateCol(y: Column, m: Column, d: Column): Column = make_date(y, m, d)

  /** `dateadd(part, n, d)` — timestamp result, time-of-day PRESERVED for
    * every part (`timestampadd` covers year…microsecond natively; the
    * earlier `date_add`/`add_months` composition truncated timestamps to
    * midnight for day-and-coarser parts). Week/quarter normalize to the
    * native units. Ref: utils/dateadd.sql:2-21. */
  def dateAdd(part: String, n: Int, d: Column): Column =
    timestamp_add(norm(part), lit(n), d.cast("timestamp"))

  /** Date-typed variant (result stays a date). */
  def dateAddDate(part: String, n: Int, d: Column): Column = norm(part) match {
    case "year"    => add_months(d, n * 12)
    case "quarter" => add_months(d, n * 3)
    case "month"   => add_months(d, n)
    case "week"    => date_add(d, n * 7)
    case "day"     => date_add(d, n)
    case other     => throw new IllegalArgumentException(
      s"dateAddDate: sub-day part '$other' requires a timestamp")
  }

  /** `datediff(a, b, part)` — signed boundary-crossing count (b − a), the
    * reference's (and DuckDB's) semantics: '1999-12-31 23:59:59' →
    * '2000-01-01' is 1 for every part. Ref: utils/datediff.sql:2-24,
    * fixtures test_utils.py:161-210. */
  def dateDiff(part: String, a: Column, b: Column): Column = norm(part) match {
    case "year"    => (year(b) - year(a)).cast("long")
    case "quarter" => ((year(b) - year(a)) * 4 + quarter(b) - quarter(a)).cast("long")
    case "month"   => ((year(b) - year(a)) * 12 + month(b) - month(a)).cast("long")
    case "week"    => // ISO-week boundaries (Monday)
      (datediff(date_trunc("week", b).cast("date"),
                date_trunc("week", a).cast("date")) / 7).cast("long")
    case "day"     => datediff(b.cast("date"), a.cast("date")).cast("long")
    case "hour"    => truncEpochDiff(a, b, "hour", 3600L * 1000000L)
    case "minute"  => truncEpochDiff(a, b, "minute", 60L * 1000000L)
    case "second"  => truncEpochDiff(a, b, "second", 1000000L)
    case "millisecond" => truncEpochDiff(a, b, "millisecond", 1000L)
    case "microsecond" =>
      (unix_micros(b.cast("timestamp")) - unix_micros(a.cast("timestamp")))
    case other => throw new IllegalArgumentException(s"datediff part: $other")
  }

  private def truncEpochDiff(a: Column, b: Column, part: String, unitMicros: Long): Column =
    ((unix_micros(date_trunc(part, b.cast("timestamp"))) -
      unix_micros(date_trunc(part, a.cast("timestamp")))) / unitMicros).cast("long")

  /** `date_trunc(part, d)` — week is ISO (Monday). Ref: utils/date_trunc.sql. */
  def dateTrunc(part: String, d: Column): Column = date_trunc(norm(part), d)

  /** `last_day(d, part)` = trunc → +1 part → −1 day, as date; quarter is
    * unsupported (compile error), mirrored here. Ref: utils/last_day.sql:1-16. */
  def lastDayOf(d: Column, part: String): Column = norm(part) match {
    case "quarter" => throw new IllegalArgumentException(
      "last_day: quarter is not supported (reference parity)")
    case p @ ("year" | "month" | "week" | "day") =>
      date_add(dateAddDate(p, 1, date_trunc(p, d).cast("date")), -1)
    case other => throw new IllegalArgumentException(s"last_day part: $other")
  }

  /** `date_spine` as a DataFrame: one row per `part` boundary in
    * [start, end) — END-EXCLUSIVE, like the reference macro
    * (utils/date_spine.sql:77-121 emits `datediff(start,end,part)` rows
    * from `start`, so `end` itself is never produced; re-expressed as
    * `sequence` + lambda filter + `explode`). */
  def dateSpineDf(spark: org.apache.spark.sql.SparkSession, part: String,
      start: String, end: String): org.apache.spark.sql.DataFrame =
    spark.range(1).select(explode(dateSpineCol(part,
      lit(start).cast("date"), lit(end).cast("date"))).as("date_" + norm(part)))

  /** `date_spine` element array (end-exclusive), used by `dateSpineDf`. */
  def dateSpineCol(part: String, start: Column, end: Column): Column = {
    val step = norm(part) match {
      case "year"    => expr("interval 1 year")
      case "quarter" => expr("interval 3 month")
      case "month"   => expr("interval 1 month")
      case "week"    => expr("interval 7 day")
      case "day"     => expr("interval 1 day")
      case "hour"    => expr("interval 1 hour")
      case "minute"  => expr("interval 1 minute")
      case "second"  => expr("interval 1 second")
      case other     => throw new IllegalArgumentException(s"date_spine: $other")
    }
    // sequence() is inclusive of `end` when the step lands on it exactly —
    // drop it to honor the reference's end-exclusive contract
    filter(sequence(start, end, step), d => d < end)
  }

  // ---------------------------------------------------------------- strings

  /** `split_part(s, delim, n)` — 1-based; negative n counts from the end;
    * out-of-range n ⇒ '' (reference semantics). Spark's built-in split_part
    * matches exactly — element_at would THROW under Spark 4's default ANSI
    * mode when n exceeds the part count. Ref: utils/split_part.sql:2-19. */
  def splitPart(s: Column, delim: String, n: Int): Column = {
    require(n != 0,
      "split_part is 1-based: positive from the start, negative from the end")
    call_function("split_part", s, lit(delim), lit(n))
  }

  /** `position(sub, s)` — 1-based, 0 when absent. Ref: utils/position.sql. */
  def positionOf(sub: String, s: Column): Column = locate(sub, s)

  /** `right(s, n)` — last n chars; n=0 ⇒ ''. Ref: utils/right.sql:2-13 and
    * regression test_right_full_length.py (n = full length ⇒ identity). */
  def rightN(s: Column, n: Column): Column =
    when(n <= 0, lit("")).otherwise(substring(s, lit(-1) * n, n))

  /** Ordered within-group string agg (`listagg`). The reference forbids
    * `limit` (compile error) — mirrored. Ref: utils/listagg.sql:1-9.
    * Portable composition: collect (ord,val) structs, sort, project, join —
    * all codegen'd built-ins, works at any group size that fits one buffer. */
  def listaggOrdered(value: Column, delim: String, order: Column): Column =
    array_join(
      transform(array_sort(collect_list(struct(order.as("o"), value.as("v")))),
        x => x.getField("v")),
      delim)

  def listaggOrdered(value: Column, delim: String, order: Column, limit: Option[Int]): Column = {
    if (limit.isDefined) throw new IllegalArgumentException(
      "listagg: limit_num is not supported (reference parity: listagg.sql:2-4)")
    listaggOrdered(value, delim, order)
  }

  /** `escape_single_quotes` — backslash style. Ref: utils/escape_single_quotes.sql.
    * Reference-parity surface ONLY: quotes, not backslashes, exactly like
    * the macro. For engine-side SQL assembly use [[sqlStringEscape]]. */
  def escapeSingleQuotes(v: String): String = v.replace("'", "\\'")

  /** Quote a value for an ENGINE-side SQL string literal. Spark's parser
    * processes backslash escapes inside literals, so backslashes must be
    * escaped too — quote-only escaping turns a trailing-backslash value
    * into an escaped closing quote (ParseException or a literal naming a
    * different value). Backslashes first, then quotes. */
  def sqlStringEscape(v: String): String =
    v.replace("\\", "\\\\").replace("'", "\\'")

  /** `string_literal`. Ref: utils/literal.sql. */
  def stringLiteral(v: String): String = s"'$v'"

  // ----------------------------------------------------------------- arrays

  /** Typed (possibly empty) array literal. Ref: utils/array_construct.sql. */
  def arrayConstruct(elemType: String, xs: Column*): Column =
    if (xs.isEmpty) array().cast(s"array<$elemType>")
    else array(xs: _*).cast(s"array<$elemType>")

  /** Ref: utils/array_append.sql. */
  def arrayAppend(a: Column, x: Column): Column = array_append(a, x)

  /** Ref: utils/array_concat.sql. */
  def arrayConcat(a: Column, b: Column): Column = concat(a, b)

  // ------------------------------------------------------------- aggregates

  /** Ref: utils/any_value.sql. */
  def anyValue(c: Column): Column = any_value(c)

  /** `bool_or` — reference implements as max() over booleans. Ref: utils/bool_or.sql. */
  def boolOr(c: Column): Column = max(c)
}
