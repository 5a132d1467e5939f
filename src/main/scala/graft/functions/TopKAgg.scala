package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k buffer: keeps the k best (score desc, id asc) entries
  * seen so far in a binary heap with the WORST kept entry at the root, so
  * insert beyond capacity is an O(log k) root replacement.
  *
  * -0.0 scores are normalized to 0.0 on insert so ties resolve by id exactly
  * as Spark's SQL ordering does (where -0.0 == 0.0). NaN scores (impossible
  * for [[CosineSimilarity]], which guards zero norms) would rank greatest,
  * matching Spark's NaN-largest sort order.
  */
final class TopKBuffer(val k: Int) extends Serializable {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  // entry (ci, di) is strictly worse than (cj, dj) under (score desc, id asc)
  @inline private def worseThan(ci: Double, di: Long, cj: Double, dj: Long): Boolean = {
    val c = java.lang.Double.compare(ci, cj)
    c < 0 || (c == 0 && di > dj)
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val c = scores(i); scores(i) = scores(j); scores(j) = c
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worseThan(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i
      if (l < n && worseThan(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worseThan(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def insert(score: Double, id: Long): Unit = {
    val s = if (score == 0.0d) 0.0d else score // normalize -0.0
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1; siftUp(n - 1)
    } else if (worseThan(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id; siftDown()
    }
  }

  /** Entries best-first as (score, id) pairs. */
  def sortedEntries: Array[(Double, Long)] = {
    val arr = Array.tabulate(n)(i => (scores(i), ids(i)))
    // total order even under NaN (java Double.compare), best first
    java.util.Arrays.sort(arr, new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    arr
  }
}

/** Distributed exact top-k aggregate: per group, the k best (score desc,
  * id asc) entries, returned as a best-first `array<struct<score,id>>`.
  *
  * This is the scale-safe replacement for `row_number() OVER
  * (PARTITION BY group ORDER BY score DESC)` + `rank <= k`: the window
  * shape funnels EVERY candidate row of a group into one reducer task
  * (at 100 TB an ANN query's candidate set is ~0.1% of the corpus — ~100 GB
  * in one task), while a TypedImperativeAggregate gets map-side partial
  * aggregation for free, so each map partition ships at most k entries per
  * group and a reducer merges ≤ k·P entries. Result sets are identical —
  * the heap's ordering mirrors the window's (score desc, id asc) tie-break.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, "k >= 1")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val d = id.eval(input)
    if (s != null && d != null) {
      val sv = s match {
        case x: java.lang.Double => x.doubleValue()
        case x: java.lang.Float  => x.toDouble
        case x: java.lang.Number => x.doubleValue()
      }
      val dv = d match {
        case x: java.lang.Long    => x.longValue()
        case x: java.lang.Integer => x.toLong
        case x: java.lang.Number  => x.longValue()
      }
      buf.insert(sv, dv)
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedEntries.map { case (s, d) =>
      new GenericInternalRow(Array[Any](s, d))
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble; val d = bb.getLong
      buf.insert(s, d)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

object TopKAgg {
  /** Column API: top-k (score desc, id asc) entries of the group as a
    * best-first `array<struct<score:double, id:bigint>>`. */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAgg(GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k)
        .toAggregateExpression())
}
