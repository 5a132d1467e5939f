package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of a keyed table — the CDC
  * primitive a pipeline runs when a source re-delivers a full extract and
  * only the delta should flow downstream (feed an incremental model, audit
  * an upstream re-materialization, alert on unexpected churn).
  *
  * Classification per key: `insert` (key only in the new snapshot),
  * `delete` (key only in the old), `update` (key in both, compared-column
  * fingerprint differs). Unchanged rows are DROPPED — at 100 TB the whole
  * point is that the output is churn-sized, not table-sized.
  *
  * Shape at scale: each side is reduced map-side to (key..., fingerprint)
  * — a fixed-width md5 over the compared columns, computed in the scan
  * projection, so the full-outer shuffle join on the key carries narrow
  * rows regardless of how wide the table is. One shuffle each side, AQE
  * handles key skew. The fingerprint is engine-portable AND injective:
  * each column contributes a one-char NULL FLAG ('1' null / '0' not), the
  * value's LENGTH in characters, a ':', its string form (empty when
  * null), and a unit separator. Never a raw `concat_ws`, which silently
  * DROPS nulls and makes ("a", NULL) collide with ("a"); never a string
  * sentinel, which a real value can spoof (a column whose actual text is
  * "NULL" must NOT fingerprint like SQL NULL); and the length prefix
  * makes the concatenation a prefix-free code, so values CONTAINING the
  * separator cannot realign across column boundaries (("a0b", "X")
  * vs ("a", "b0X") — identical pre-images under the r14
  * separator-only scheme, ADVICE r14). An external system can reproduce
  * and audit the same change classification with `CASE WHEN c IS NULL
  * THEN '1' ELSE '0' END || COALESCE(CAST(length(CAST(c AS VARCHAR)) AS
  * VARCHAR), '0') || ':' || COALESCE(CAST(c AS VARCHAR), '') || chr(31)`
  * per column.
  *
  * Caller contract: `keyCols` must be unique per snapshot (it is the
  * table's primary key; duplicate keys would cross-multiply in the join);
  * `compareCols` must stringify deterministically on every engine that
  * needs to reproduce the fingerprint — floating-point columns should be
  * pre-quantized by the caller (e.g. `floor(price * 100)` cents), because
  * double→string formatting is NOT portable across engines. */
object SnapshotDiff {

  private val Sep = "\u001f"

  /** Engine-portable, injective row fingerprint over `cols`: md5 of the
    * unit-separated, null-FLAGGED, LENGTH-PREFIXED string forms
    * (flag char + char length + ':' + value — the length prefix makes the
    * encoding prefix-free, so a value containing the separator cannot
    * shift bytes into a neighboring column's slot). */
  def fingerprint(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val parts = cols.map { c =>
      val s = c.cast("string")
      concat(when(c.isNull, lit("1")).otherwise(lit("0")),
        coalesce(length(s).cast("string"), lit("0")), lit(":"),
        coalesce(s, lit("")))
    }
    md5(concat(parts.flatMap(p => Seq(p, lit(Sep))).init: _*))
  }

  /** The diff: one row per changed key — (keyCols..., change_type,
    * old_fp, new_fp), change_type ∈ insert | delete | update. */
  def diff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    require(compareCols.nonEmpty, "diff needs at least one compared column")
    def slim(df: DataFrame, fpName: String): DataFrame =
      df.select(keyCols.map(col) :+
        fingerprint(compareCols.map(col)).as(fpName): _*)
    val o = slim(oldDf, "old_fp")
    val n = slim(newDf, "new_fp")
    // join on the key columns by NAME (coalesced output key): a NULL key
    // component never matches anything on the other side, so such rows
    // surface as delete+insert pairs — the honest reading of a NULL key
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("new_fp").isNull, "delete")
          .when(col("old_fp").isNull, "insert")
          .when(col("old_fp") =!= col("new_fp"), "update"))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type") :+
        col("old_fp") :+ col("new_fp"): _*)
  }
}
