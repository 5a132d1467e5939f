package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass MinHash signature aggregate: for each input 64-bit shingle
  * hash, updates all `k` minima of the universal-hash family
  * h_i(x) = (a_i·x + b_i) mod p in one mutable long-array buffer.
  *
  * Compared to k separate `min(...)` aggregate columns this is one buffer
  * update per row (tight JIT'd loop over a primitive array) instead of k
  * independent aggregate slots, and the group-by output is a single
  * array<bigint> column. Buffers merge element-wise (map-side partial
  * aggregation works as usual).
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = 1000000007L
  // deterministic (a_i, b_i): splitmix64-derived, bounded so a·h+b < 2^62
  private lazy val as: Array[Long] =
    Array.tabulate(k)(i => MinHashAgg.mix(0x5eedL, i) % P + 1)
  private lazy val bs: Array[Long] =
    Array.tabulate(k)(i => MinHashAgg.mix(0xf00dL, i) % P)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // bound the key to 2^31 so a·h+b never overflows a long
      val h0 = v.asInstanceOf[Long] % (1L << 31)
      val h = if (h0 < 0) h0 + (1L << 31) else h0
      var i = 0
      while (i < k) {
        val hv = (as(i) * h + bs(i)) % P
        if (hv < buf(i)) buf(i) = hv
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MinHashAgg {
  private[functions] def mix(seed: Long, i: Int): Long = {
    var z = seed + 0x9e3779b97f4a7c15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  /** Column API: minhash signature (array<bigint> of width k) of the group's
    * shingle-hash values. */
  def apply(shingleHash: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashAgg(GraftColumnBridge.expression(shingleHash), k)
        .toAggregateExpression())
}
