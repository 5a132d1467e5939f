package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values / bottom-k) theta sketch: keeps the `k` smallest
  * DISTINCT 64-bit hash values of the group, in UNSIGNED hash order (keys
  * are stored sign-flipped — `h ^ Long.MinValue` — so signed ordering of
  * the stored key equals unsigned ordering of the hash).
  *
  * What it buys over the sketches already in the engine: HLL (q17) answers
  * union cardinality only — its intersection via inclusion-exclusion blows
  * up for small overlaps; Bloom (d12) answers membership, not cardinality.
  * KMV sketches COMPOSE: the union of two sketches' key sets, re-trimmed to
  * the k smallest, is exactly the sketch of the union, and the overlap of
  * the trimmed union with both input sketches yields an unbiased Jaccard
  * estimate, so |A∩B| ≈ ρ·(k−1)/θ comes from two k-sized arrays — the
  * decontamination-sizing question ("how much of the test set is in this
  * 100 TB crawl?") answered without the exact distinct join.
  *
  * State is a bounded sorted set (≤ k keys, ~8k bytes), updates are
  * O(log k), partials merge by set-union + trim — fully map-side
  * combinable, skew-immune by construction.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 16, s"kmv sketch needs k >= 16, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long],
      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long] ^ Long.MinValue // unsigned order
      if (buf.size < k) { buf.add(key); () }
      else if (key < buf.last) {
        if (buf.add(key)) { buf.pollLast(); () }
      }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[Long],
      b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val key = it.next()
      if (a.size < k) { a.add(key); () }
      else if (key < a.last) {
        if (a.add(key)) { a.pollLast(); () }
      } else return a // b is sorted: everything after is larger still
    }
    a
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KmvAgg {

  /** Column API: bottom-k sketch (ascending array<bigint> of sign-flipped
    * keys) over an already-hashed 64-bit column (pair with `xxhash64`). */
  def apply(hash64: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvAgg(GraftColumnBridge.expression(hash64), k)
        .toAggregateExpression())

  /** Normalized position in [0,1) of a stored (sign-flipped) key — the θ
    * of the sketch when applied to its k-th smallest key. */
  def frac(key: Column): Column =
    key.cast("double") / org.apache.spark.sql.functions.lit(
      18446744073709551616.0) + org.apache.spark.sql.functions.lit(0.5)
}
