package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded posting-list buffer: collects long ids until `cap` is exceeded,
  * then flips to OVERFLOWED and stores nothing further. An overflowed
  * buffer serializes to a 5-byte tombstone — after map-side partial
  * aggregation a hot key ships almost no bytes, which is the point. */
final class CappedListBuffer(val cap: Int) extends Serializable {
  var ids = new Array[Long](math.min(cap, 16))
  var n = 0
  var overflowed = false

  def insert(id: Long): Unit = {
    if (overflowed) return
    if (n >= cap) { overflowed = true; return }
    if (n == ids.length)
      ids = java.util.Arrays.copyOf(ids, math.min(cap, ids.length * 2))
    ids(n) = id
    n += 1
  }
}

/** Distributed bounded `collect_list` over integral ids: per group, the
  * complete id list when the group has at most `cap` elements, NULL when it
  * exceeds `cap`.
  *
  * This is the scale-safe skew guard for inverted-index builds (n-gram
  * Jaccard posting lists, LSH buckets): the r6 form computed per-key
  * document frequencies in one aggregate, anti-joined the hot keys away,
  * and then SELF-JOINED the surviving (key, id) rows — three corpus-wide
  * shuffles of the exploded table. With CappedListAgg the guard is
  * STRUCTURAL: one groupBy builds every posting list, a key past `cap`
  * overflows during aggregation (each map-side partial holds ≤ cap ids, an
  * overflowed partial serializes to a tombstone, and merging anything into
  * an overflowed buffer is a no-op), and the NULL rows are filtered out.
  * A plain `collect_list` + size filter would materialize the full hot-key
  * list in one reducer buffer first — at 100 TB a stop-word shingle's list
  * is corpus-sized, which is exactly the OOM the guard exists to prevent.
  *
  * Ids ride the buffer as longs (the [[TopKAgg]] convention); callers cast
  * back to the source id type on output. Null ids are ignored (SQL
  * aggregate convention). Output order is insertion order — semantically a
  * multiset; callers needing determinism sort the array. */
case class CappedListAgg(
    id: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedListBuffer] {

  require(cap >= 1, "cap >= 1")

  // fail at ANALYSIS time, not as a MatchError deep inside an executor
  // task: the buffer stores longs, so only integral id columns are legal
  // (callers with string/decimal ids dictionary-encode first — see
  // [[graft.llm.Dedup.ngramJaccardPairs]]).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    id.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"CappedListAgg requires an integral id column (byte/short/int/long), got $t")
    }

  override def children: Seq[Expression] = Seq(id)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CappedListBuffer =
    new CappedListBuffer(cap)

  override def update(buf: CappedListBuffer, input: InternalRow): CappedListBuffer = {
    val v = id.eval(input)
    if (v != null) buf.insert(v match {
      case x: java.lang.Long    => x.longValue()
      case x: java.lang.Integer => x.toLong
      case x: java.lang.Number  => x.longValue()
    })
    buf
  }

  override def merge(a: CappedListBuffer, b: CappedListBuffer): CappedListBuffer = {
    if (b.overflowed) a.overflowed = true
    else {
      var i = 0
      while (i < b.n && !a.overflowed) { a.insert(b.ids(i)); i += 1 }
    }
    a
  }

  override def eval(buf: CappedListBuffer): Any =
    if (buf.overflowed) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf.ids, buf.n))

  override def serialize(buf: CappedListBuffer): Array[Byte] = {
    // overflow tombstone: 5 bytes, no ids — hot keys ship nothing
    val n = if (buf.overflowed) 0 else buf.n
    val bb = java.nio.ByteBuffer.allocate(5 + n * 8)
    bb.put(if (buf.overflowed) 1.toByte else 0.toByte)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedListBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val over = bb.get() == 1.toByte
    val n = bb.getInt
    val buf = new CappedListBuffer(cap)
    buf.overflowed = over
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedListAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedListAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(id = c(0))
}

object CappedListAgg {
  /** Column API: the group's complete id list as `array<bigint>` when the
    * group has ≤ cap elements, NULL past the cap. */
  def apply(id: Column, cap: Int): Column =
    GraftColumnBridge.column(
      CappedListAgg(GraftColumnBridge.expression(id), cap)
        .toAggregateExpression())
}
