package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.settings.SettingParser

/** Port of the behavior pinned by the reference's
  * tests/unit_test/setting_parser_test.py (see SURVEY.md §2.5). */
class SettingParserSpec extends AnyFunSuite {

  test("single SET extracted, remainder preserved") {
    val r = SettingParser.parse("set a=b;\nSELECT 1")
    assert(r.settings == Map("a" -> "b"))
    assert(r.remainingQuery.trim == "SELECT 1")
    assert(r.errors.isEmpty)
  }

  test("multiple SETs, mixed case keyword") {
    val r = SettingParser.parse("SET a=1; set b = 2 ;\nselect * from t")
    assert(r.settings == Map("a" -> "1", "b" -> "2"))
    assert(r.remainingQuery.trim == "select * from t")
  }

  test("line and block comments are skipped") {
    val r = SettingParser.parse(
      "-- leading\nset a=b;\n/* block\n comment */ set c=d;\nSELECT 1")
    assert(r.settings == Map("a" -> "b", "c" -> "d"))
    assert(r.remainingQuery.trim == "SELECT 1")
  }

  test("escaped semicolon stays in the value") {
    val r = SettingParser.parse("""set a=x\;y;SELECT 1""")
    assert(r.settings == Map("a" -> "x;y"))
    assert(r.remainingQuery == "SELECT 1")
  }

  test("stops at first non-SET content; later sets belong to the query") {
    val r = SettingParser.parse("set a=b;\nSELECT 1;\nset c=d;")
    assert(r.settings == Map("a" -> "b"))
    assert(r.remainingQuery.contains("set c=d;"))
  }

  test("missing '=' is an error but parsing continues") {
    val r = SettingParser.parse("set broken;\nset ok=1;\nSELECT 1")
    assert(r.errors.nonEmpty)
    assert(r.settings == Map("ok" -> "1"))
  }

  test("unterminated SET reported, content left as query") {
    val r = SettingParser.parse("set a=b")
    assert(r.errors.exists(_.contains("unterminated")))
    assert(r.remainingQuery == "set a=b")
  }

  test("query with no SET header passes through verbatim") {
    val q = "SELECT 'set a=b;' FROM t"
    val r = SettingParser.parse(q)
    assert(r.settings.isEmpty)
    assert(r.remainingQuery == q)
  }

  test("a keyword merely prefixed with 'set' is not a SET statement") {
    val r = SettingParser.parse("settle=1;SELECT 1")
    assert(r.settings.isEmpty)
    assert(r.remainingQuery == "settle=1;SELECT 1")
  }
}
