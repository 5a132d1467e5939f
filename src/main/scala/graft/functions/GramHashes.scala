package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-POSITION `w`-gram fingerprints of a token-hash array: output
  * element `i` XORs the rotations `rotl(hs(i+j), 7j+1)` for `j < w`
  * (position-distinct rotations, so reordered tokens hash differently);
  * length `max(0, n − w + 1)`, one row of the exact-substring-dedup
  * pipeline (ref dedupe semantics: `TextOps.substringDupSignal`).
  *
  * Exists because the HOF form — `transform(positions, i → xor of 8
  * element_at(hs, i+j) rotations)` — is at the optimizer's mercy: HOF
  * lambdas don't CSE, and once a consumer forces the bound `hs` alias to
  * inline, every gram element re-evaluates the whole token-hash
  * transform → O(n²·w) per document (measured 261 s vs 30 s for the
  * STRING twin on a 50k-doc corpus — the "cheaper" hashed form 9×
  * slower than what it replaced). A native expression is a guaranteed
  * single O(n·w) loop over primitive longs, whatever the surrounding
  * plan does. */
case class GramHashes(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 2, s"gram width must be >= 2 (w=$w)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull must be false: compute() reads elements with
    // ArrayData.getLong, which returns an arbitrary value (typically 0)
    // for a null slot instead of failing — a nullable array would yield
    // silently wrong gram fingerprints, so refuse it at analysis time.
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes expects array<bigint> with non-nullable elements, " +
        s"got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    GramHashes.compute(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHashes.compute($c, $w);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object GramHashes {

  def compute(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - w + 1)
    var i = 0
    while (i < out.length) {
      var g = 0L
      var j = 0
      while (j < w) {
        val x = hs.getLong(i + j)
        val k = 7 * j + 1
        g ^= java.lang.Long.rotateLeft(x, k)
        j += 1
      }
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(hs: Column, w: Int): Column =
    GraftColumnBridge.column(
      GramHashes(GraftColumnBridge.expression(hs), w))
}
