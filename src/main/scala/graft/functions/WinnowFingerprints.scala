package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (MOSS-style) as ONE fused pass: rolling 64-bit
  * polynomial hashes of character k-grams + monotonic-deque sliding-window
  * minimum, emitting the distinct window minima (sorted ascending).
  *
  * The composable alternative — `transform(sequence(...), i →
  * array_min(slice(kgramHashes, i, window)))` over a `transform`-built
  * k-gram hash array — allocates a window-sized array PER CHARACTER and is
  * O(len·window) with two intermediate arrays per row; this kernel is O(len)
  * with zero intermediate allocation, and `doGenCode` keeps the projection
  * inside whole-stage codegen (one static call per row).
  *
  * Determinism: fixed multiplier + splitmix64 finalizer, no seeds, so runs
  * and engines agree. Standard robust-winnowing guarantee holds: documents
  * sharing a substring of ≥ k + window − 1 chars share ≥ 1 fingerprint.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {
  require(k > 0 && window > 0, s"k and window must be positive (k=$k, window=$window)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    WinnowKernel.compute(s.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKernel.compute($c, $k, $window);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowFingerprints {
  def apply(text: Column, k: Int, window: Int): Column =
    GraftColumnBridge.column(
      WinnowFingerprints(GraftColumnBridge.expression(text), k, window))
}

/** Static kernel (no companion class ⇒ Java-callable static forwarder for
  * generated code). */
object WinnowKernel {

  private val M = 0x00000100000001b3L // FNV-1a prime as rolling multiplier

  /** splitmix64 finalizer — decorrelates the linear rolling hash. */
  private def mix(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * M + (bytes(i) & 0xffL); i += 1 }
      return new GenericArrayData(Array(mix(h)))
    }
    val m = n - k + 1 // number of k-grams
    // rolling hashes, finalized on the fly
    val hs = new Array[Long](m)
    var powk = 1L
    var j = 1
    while (j < k) { powk *= M; j += 1 } // M^(k-1), wraparound arithmetic
    var h = 0L
    var i = 0
    while (i < k) { h = h * M + (bytes(i) & 0xffL); i += 1 }
    hs(0) = mix(h)
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xffL) * powk) * M + (bytes(i + k - 1) & 0xffL)
      hs(i) = mix(h)
      i += 1
    }
    if (m <= w) {
      var mn = hs(0)
      i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    // sliding-window minimum via monotonic deque of indices (ring buffer);
    // robust winnowing: record a fingerprint only when the minimum's
    // POSITION changes between consecutive windows
    val deq = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    val out = new Array[Long](m - w + 1) // ≤ one emit per window
    var outN = 0
    var lastPos = -1
    i = 0
    while (i < m) {
      while (tail > head && hs(deq(tail - 1)) >= hs(i)) tail -= 1
      deq(tail) = i; tail += 1
      if (deq(head) <= i - w) head += 1
      if (i >= w - 1 && deq(head) != lastPos) {
        lastPos = deq(head)
        out(outN) = hs(lastPos); outN += 1
      }
      i += 1
    }
    // distinct + sorted ascending (deterministic output order)
    val res = java.util.Arrays.copyOf(out, outN)
    java.util.Arrays.sort(res)
    var src = 1; var dst = 1
    while (src < outN) {
      if (res(src) != res(dst - 1)) { res(dst) = res(src); dst += 1 }
      src += 1
    }
    new GenericArrayData(
      if (dst == outN) res else java.util.Arrays.copyOf(res, dst))
  }
}
