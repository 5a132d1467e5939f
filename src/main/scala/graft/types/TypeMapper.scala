package graft.types

import org.apache.spark.sql.types._

/** Reference-type-name ⇄ Spark DataType mapping, including the label
  * normalization the reference applies (`column.py:16-22`:
  * TEXT→STRING, INTEGER→INT, BOOL→BOOLEAN, NUMERIC→DECIMAL, REAL→FLOAT)
  * and the DECIMAL(p,s)/CHAR(n)/VARCHAR(n) shapes (`column.py:31-46`).
  */
object TypeMapper {

  private val normalization = Map(
    "TEXT" -> "STRING", "INTEGER" -> "INT", "BOOL" -> "BOOLEAN",
    "NUMERIC" -> "DECIMAL", "REAL" -> "FLOAT",
    // length-less character types (engine stores strings either way)
    "CHAR" -> "STRING", "VARCHAR" -> "STRING")

  private val decimalRx = """DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val decimalPRx = """DECIMAL\s*\(\s*(\d+)\s*\)""".r
  // (CHAR(n)/VARCHAR(n) never reach the scalar match: normalize() collapses
  // their BASE to STRING and drops the length before matching.)

  /** Split at `sep` occurring at bracket depth 0 only — a naive regex split
    * would cut MAP<DECIMAL(10,2),STRING> at the decimal's comma. */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case c @ ('<' | '(') => depth += 1; cur += c
      case c @ ('>' | ')') => depth -= 1; cur += c
      case `sep` if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result()
  }

  /** Normalize a reference type label (ref column.py:16-22). Alias mapping
    * applies to the BASE name so parameterized forms normalize too:
    * NUMERIC(10,2) → DECIMAL(10,2), VARCHAR (no length) → STRING. */
  def normalize(label: String): String = {
    val up = label.trim.toUpperCase
    normalization.get(up) match {
      case Some(m) => m
      case None =>
        val paren = up.indexOf('(')
        if (paren > 0) {
          val base = up.substring(0, paren).trim
          normalization.get(base) match {
            // parameterized alias: map the base, keep the parameters —
            // except aliases of STRING, whose length is DDL fidelity only
            case Some("STRING") => "STRING"
            case Some(m) => m + up.substring(paren)
            case None => up
          }
        } else up
    }
  }

  /** Reference type name → Spark DataType. The reference's DATETIME and
    * TIMESTAMP both land on TimestampType (session-zoned; the reference
    * deliberately avoids NTZ — impl.py:394-401).
    *
    * Container types are dispatched on the RAW label (before normalize's
    * upper-casing, which would destroy struct field-name case) with
    * depth-aware splitting, so MAP<DECIMAL(10,2),STRING> and every
    * STRUCT label [[toRef]] emits round-trip. */
  def toSpark(label: String): DataType = {
    val t = label.trim
    val up = t.toUpperCase
    def inner(prefix: Int): String = t.substring(prefix, t.length - 1)
    if (up.startsWith("ARRAY") && up.endsWith(">"))
      ArrayType(toSpark(inner(t.indexOf('<') + 1)))
    else if (up.startsWith("MAP") && up.endsWith(">"))
      splitTop(inner(t.indexOf('<') + 1), ',') match {
        case Seq(k, v) => MapType(toSpark(k), toSpark(v))
        case parts => throw new IllegalArgumentException(
          s"MAP needs exactly key,value: $label (got ${parts.length} parts)")
      }
    else if (up.startsWith("STRUCT") && up.endsWith(">"))
      StructType(splitTop(inner(t.indexOf('<') + 1), ',').map { f =>
        splitTop(f, ':') match {
          case Seq(name, fieldType) =>
            StructField(name.trim, toSpark(fieldType))
          case _ => throw new IllegalArgumentException(
            s"struct field needs name:type, got '$f' in $label")
        }
      })
    else normalize(t) match {
      case "TINYINT" => ByteType
      case "SMALLINT" => ShortType
      case "INT" => IntegerType
      case "BIGINT" => LongType
      case "FLOAT" => FloatType
      case "DOUBLE" => DoubleType
      case "BOOLEAN" => BooleanType
      case "STRING" => StringType
      case "BINARY" => BinaryType
      case "DATE" => DateType
      case "DATETIME" | "TIMESTAMP" => TimestampType
      case "TIMESTAMP_NTZ" => TimestampNTZType
      case "DECIMAL" => DecimalType(38, 18)
      case decimalRx(p, s) => DecimalType(p.toInt, s.toInt)
      case decimalPRx(p) => DecimalType(p.toInt, 0)
      case other => throw new IllegalArgumentException(s"unknown type: $other")
    }
  }

  /** Spark DataType → reference type name (for DDL rendering/docs). */
  def toRef(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case StringType => "STRING"
    case BinaryType => "BINARY"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case TimestampNTZType => "TIMESTAMP_NTZ"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case a: ArrayType => s"ARRAY<${toRef(a.elementType)}>"
    case m: MapType => s"MAP<${toRef(m.keyType)},${toRef(m.valueType)}>"
    case s: StructType =>
      s.fields.map(f => s"${f.name}:${toRef(f.dataType)}").mkString("STRUCT<", ",", ">")
    case other => throw new IllegalArgumentException(s"unmapped: $other")
  }
}
