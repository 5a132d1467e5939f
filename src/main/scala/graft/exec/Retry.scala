package graft.exec

/** Bounded retry for transient races under concurrent runners — the engine
  * equivalent of the reference's retry wrapper (wrapper.py:46-76: up to 10
  * attempts with backoff capped at 15 s, retrying ONLY errors recognized as
  * transient; everything else propagates immediately).
  *
  * In this engine the racy surface is the swap's catalog DDL and file
  * listings: two concurrent materializations of the SAME table can race on
  * ADD/DROP PARTITION, RENAME and directory listings. Data-destroying
  * errors (rollback failures, arity violations) are deliberately NOT
  * retryable — retrying those could re-run a swap against a half-rolled-
  * back state.
  */
object Retry {

  private def log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Transient-looking failures: concurrent catalog modification and
    * lease/timeout/connection flavors of IOException. AnalysisException is
    * deliberately NOT retried — the wrapped DDL is all IF [NOT] EXISTS, so
    * genuine add/drop races cannot produce analysis errors, while
    * permanent ones (table dropped, typo'd ref) would burn the whole ~55 s
    * budget before surfacing. */
  def transientRace(t: Throwable): Boolean = t match {
    case _: java.util.ConcurrentModificationException => true
    case _: ConcurrentSwapException => false // whole-operation retry only
    case e: java.io.IOException =>
      val m = Option(e.getMessage).getOrElse("").toLowerCase
      // our own swap-rollback failures carry recovery guidance and must
      // surface immediately, never be re-run
      !m.contains("rollback") &&
        (m.contains("lease") || m.contains("timeout") || m.contains("timed out") ||
          m.contains("connection") || m.contains("temporarily"))
    case _ => false
  }

  /** Concurrent-swap READ races: a scan that listed files which a
    * concurrent commit then replaced dies with FileNotFoundException (or
    * Spark's "…REFRESH TABLE…" stale-cache wrapper) somewhere in its cause
    * chain. Re-running the whole operation after a REFRESH re-lists and
    * succeeds — the engine twin of the reference wrapper retrying a full
    * model run under thread-parallel execution (wrapper.py:46-76,
    * test_concurrency.py). Kept SEPARATE from [[transientRace]]: callers
    * opt in per whole-operation retry loop, not around inner DDL. */
  def staleScan(t: Throwable): Boolean = {
    val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    chain.exists {
      case _: java.io.FileNotFoundException => true
      case e => Option(e.getMessage).exists(_.contains("REFRESH TABLE"))
    }
  }

  /** Thrown when a swap detects, mid-flight, that a concurrent writer
    * committed the same table/partition first — the loser's state has been
    * fully restored and re-running the whole operation against the
    * winner's state is the correct response. Always
    * [[tableRenameRace]]-classified. Subclasses IOException so generic
    * handlers treat it as an I/O-level failure, but [[transientRace]]
    * deliberately does NOT match it: inner DDL must not retry in place —
    * only a whole-operation loop may. */
  final class ConcurrentSwapException(msg: String) extends java.io.IOException(msg)

  /** Whole-TABLE swap races: the rename dance (target → old, stg → target)
    * serializes on the target name, so the LOSER of a concurrent replace
    * fails its rename with table-not-found / already-exists. Re-running the
    * whole materialization against the winner's state is the correct
    * response (reference wrapper semantics) — concurrent whole-table
    * replaces converge to one writer's complete output, never a torn mix.
    * Only for whole-operation retry loops, never around inner DDL.
    *
    * The match is SCOPED to the swap's own names: the message must mention
    * a `__graft_stg_`/`__graft_old`/`__dbt_tmp` helper — or `target`, when
    * the caller passes the table it is retrying. An unscoped
    * not-found/already-exists (a missing SOURCE table, a genuine name
    * conflict) is a real error and must surface immediately, not burn the
    * backoff budget re-running a doomed operation. */
  def tableRenameRace(t: Throwable, target: String = ""): Boolean = t match {
    case _: ConcurrentSwapException => true
    case e: org.apache.spark.sql.AnalysisException =>
      val m = Option(e.getMessage).getOrElse("")
      val racy = m.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        m.contains("TABLE_OR_VIEW_ALREADY_EXISTS") ||
        m.contains("already exists")
      // the target match is DELIMITED, not a raw substring: retrying
      // target "events" must not classify a genuinely missing source
      // "events_raw" as a race (identifier chars on either side break
      // the match; backticks/dots/quotes/end-of-string do not)
      val tgt = target.stripPrefix("`").stripSuffix("`")
      val tgtBounded = target.nonEmpty &&
        ("(?s).*(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(tgt) +
          "(?![A-Za-z0-9_]).*").r.matches(m)
      val swapScoped = m.contains("__graft_stg_") || m.contains("__graft_old") ||
        m.contains("__dbt_tmp") || tgtBounded
      racy && swapScoped
    case _ => false
  }

  /** Run `f`, retrying on `retryOn`-matching failures with exponential
    * backoff (200 ms doubling, capped at `maxDelayMs`), up to `attempts`
    * total tries. The last failure propagates unchanged. */
  def withRetries[T](attempts: Int = 10, maxDelayMs: Long = 15000,
      retryOn: Throwable => Boolean = transientRace,
      sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var delay = 200L
    var tried = 0
    while (true) {
      tried += 1
      try return f
      catch {
        case e: Throwable if tried < attempts && retryOn(e) =>
          log.warn(s"transient failure (attempt $tried/$attempts), " +
            s"retrying in $delay ms: ${e.getMessage}")
          sleep(delay)
          delay = math.min(delay * 2, maxDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
