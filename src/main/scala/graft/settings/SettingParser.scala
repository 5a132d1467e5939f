package graft.settings

import scala.collection.mutable

/** Extracts leading `SET key=value;` statements from a SQL script, skipping
  * `--` line comments and slash-star block comments, honoring `\;` escapes in
  * values, and stopping at the first non-SET content. Returns the settings,
  * the remaining query, and any parse errors.
  *
  * Clean-room re-implementation of the behavior pinned by the reference's
  * state machine (`dbt/adapters/maxcompute/setting_parser.py:20-126` and
  * `tests/unit_test/setting_parser_test.py`).
  */
object SettingParser {

  final case class ParseResult(
      settings: Map[String, String],
      remainingQuery: String,
      errors: List[String])

  def parse(sql: String): ParseResult = {
    val settings = mutable.LinkedHashMap.empty[String, String]
    val errors = mutable.ListBuffer.empty[String]
    var i = 0
    val n = sql.length
    // `consumed` tracks the end of the last fully-consumed SET statement
    // (or skipped comment/whitespace); everything after it is the query.
    var consumed = 0
    var done = false

    def skipWsAndComments(): Unit = {
      var progressed = true
      while (progressed) {
        progressed = false
        while (i < n && sql.charAt(i).isWhitespace) { i += 1; progressed = true }
        if (i + 1 < n && sql.charAt(i) == '-' && sql.charAt(i + 1) == '-') {
          while (i < n && sql.charAt(i) != '\n') i += 1
          progressed = true
        } else if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
          val close = sql.indexOf("*/", i + 2)
          i = if (close < 0) n else close + 2
          progressed = true
        }
      }
    }

    while (!done && i < n) {
      skipWsAndComments()
      consumed = i
      if (i < n) {
        // A SET statement begins with the keyword `set` followed by whitespace.
        val isSet = i + 3 <= n && sql.substring(i, i + 3).equalsIgnoreCase("set") &&
          (i + 3 == n || sql.charAt(i + 3).isWhitespace)
        if (!isSet) done = true
        else {
          i += 3
          // scan to the terminating unescaped ';'
          val stmt = new StringBuilder
          var terminated = false
          while (i < n && !terminated) {
            val c = sql.charAt(i)
            if (c == '\\' && i + 1 < n && sql.charAt(i + 1) == ';') {
              stmt.append(';'); i += 2
            } else if (c == ';') { terminated = true; i += 1 }
            else { stmt.append(c); i += 1 }
          }
          if (!terminated) {
            errors += s"unterminated SET statement: 'set${stmt.toString.trim}'"
            done = true // do not consume — leave it as query text
          } else {
            val body = stmt.toString
            val eq = body.indexOf('=')
            if (eq < 0) {
              errors += s"invalid SET statement (missing '='): 'set$body;'"
            } else {
              val key = body.substring(0, eq).trim
              val value = body.substring(eq + 1).trim
              if (key.isEmpty) errors += s"invalid SET statement (empty key): 'set$body;'"
              else settings(key) = value
            }
            consumed = i
          }
        }
      }
    }
    ParseResult(settings.toMap, sql.substring(consumed), errors.toList)
  }
}
