package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** LSH band hashes of a signature array: band b's hash mixes the
  * `len/bands` consecutive signature entries of that band (splitmix64
  * combine). Output: array<bigint> of length `bands`, to be `posexplode`d
  * into (band, bucket-hash) join keys.
  *
  * Replaces `bands × xxhash64(concat_ws("_", sig(i)…))` column fan-out —
  * that form stringifies every signature entry per band and Janino-compiles
  * a large expression tree per query; this is one static-call expression
  * mixing longs directly. */
case class BandHashes(child: Expression, bands: Int)
    extends UnaryExpression {
  require(bands > 0, s"bands must be positive (bands=$bands)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"band_hashes expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    BandHashes.compute(v.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BandHashes.compute($c, $bands);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BandHashes {

  def compute(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    // silent degradation guard: bands > n would hash every row to the same
    // per-band constant (quadratic bucket blowup); non-dividing bands would
    // silently ignore trailing signature entries
    require(n > 0 && n % bands == 0,
      s"signature length $n must be a positive multiple of bands=$bands")
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b97f4a7c15L * (b + 1)
      var j = 0
      while (j < r) {
        var z = h + sig.getLong(b * r + j)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        h = z ^ (z >>> 31)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  def apply(sig: Column, bands: Int): Column =
    GraftColumnBridge.column(
      BandHashes(GraftColumnBridge.expression(sig), bands))
}
