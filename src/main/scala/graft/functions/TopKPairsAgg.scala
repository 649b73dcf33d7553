package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_pairs(score, id, k)` — bounded-heap top-k aggregate: keeps the `k`
  * best (score, id) pairs under the total order (score DESC, id ASC) in an
  * O(k) buffer, evaluated as a sorted `array<struct<s: double, i: long>>`.
  *
  * This is the SCALE replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id) <= k`
  * rank-limit window in top-k-per-group pipelines (the ANN shortlist
  * shape): Spark's rank-limit pushdown (WindowGroupLimit) still requires
  * its input LOCALLY SORTED on (g, score, id), so a 10⁸-candidate scored
  * stream pays a full per-partition sort before a single row is dropped —
  * `PqScaleSpec`'s 1M-vector probe measured the window form costing ~10×
  * the scoring scan itself. This aggregate runs as a hash aggregate with
  * MAP-SIDE COMBINE: each input row is one O(log k) bounded-heap offer, no
  * sort, and the shuffle carries one ≤ k-pair buffer per group instead of
  * every candidate row.
  *
  * Determinism: the comparator is the TOTAL order (score DESC, id ASC) —
  * the same tie-break discipline every graft top-k pins — so the result is
  * independent of partitioning and merge order whenever the k-th/k+1-th
  * boundary is not a tie, and tie boundaries resolve by id exactly like
  * the window form. NULL score or id rows are skipped. NaN scores are
  * skipped too (a NaN can never be "better" under a total order on
  * doubles) — NOTE this deliberately differs from the window form, where
  * Spark's sort order places NaN ABOVE +Infinity; graft's similarity
  * pipelines cannot produce NaN scores (norms are > 0 by construction).
  *
  * `k` must be an integer literal: it bounds the aggregation buffer, the
  * same literal-bound discipline as `collect_capped_long`. */
case class TopKPairsAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsAgg.Heap]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20),
    s"topk_pairs k must be in [1, ${1 << 20}] (it bounds the aggregation buffer), got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult = (score.dataType, id.dataType) match {
    case (DoubleType | FloatType, ByteType | ShortType | IntegerType | LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case (s, i) => TypeCheckResult.TypeCheckFailure(
      s"topk_pairs requires (double/float score, integral id), got ${s.catalogString} and ${i.catalogString}")
  }

  private lazy val toDouble: Any => Double = score.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType  => v => v.asInstanceOf[Float].toDouble
    case other      => throw new IllegalStateException(s"unreachable: $other")
  }

  private lazy val toLong: Any => Long = id.dataType match {
    case LongType    => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType   => v => v.asInstanceOf[Short].toLong
    case ByteType    => v => v.asInstanceOf[Byte].toLong
    case other       => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): TopKPairsAgg.Heap = new TopKPairsAgg.Heap(k)

  override def update(buffer: TopKPairsAgg.Heap, input: InternalRow): TopKPairsAgg.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = toDouble(s)
      if (!java.lang.Double.isNaN(sv)) buffer.offer(sv, toLong(i))
    }
    buffer
  }

  override def merge(buffer: TopKPairsAgg.Heap, input: TopKPairsAgg.Heap): TopKPairsAgg.Heap = {
    var i = 0
    while (i < input.len) { buffer.offer(input.s(i), input.id(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKPairsAgg.Heap): Any = {
    // sort a copy best-first (score desc, id asc) — the buffer itself stays
    // a heap so a shared/reused buffer is not corrupted by eval
    val idx = Array.tabulate(buffer.len)(identity)
    val sorted = idx.sortWith { (a, b) =>
      val sa = buffer.s(a); val sb = buffer.s(b)
      if (sa != sb) sa > sb else buffer.id(a) < buffer.id(b)
    }
    new GenericArrayData(sorted.map(j =>
      InternalRow(buffer.s(j), buffer.id(j)): Any))
  }

  override def serialize(buffer: TopKPairsAgg.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.len)
    bb.putInt(buffer.len)
    var i = 0
    while (i < buffer.len) { bb.putDouble(buffer.s(i)); bb.putLong(buffer.id(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKPairsAgg.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", DoubleType, nullable = false),
      StructField("i", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(score = newLeft, id = newRight)
}

object TopKPairsAgg {
  /** Size-bounded binary min-heap on the "keep" order: the ROOT is the
    * WORST kept pair — (smallest score, largest id among score ties) — so
    * a full heap admits a new pair iff it beats the root, in O(log k).
    * Capacity grows lazily to k (a small group never allocates k slots). */
  final class Heap(val k: Int) {
    var s: Array[Double] = new Array[Double](math.min(8, k))
    var id: Array[Long] = new Array[Long](math.min(8, k))
    var len: Int = 0

    /** a strictly better (higher-ranked) than b under (score desc, id asc). */
    @inline private def better(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa > sb || (sa == sb && ia < ib)

    def offer(sv: Double, iv: Long): Unit = {
      if (len < k) {
        if (len == s.length) {
          val cap = math.min(k, s.length * 2)
          s = java.util.Arrays.copyOf(s, cap)
          id = java.util.Arrays.copyOf(id, cap)
        }
        s(len) = sv; id(len) = iv
        len += 1
        siftUp(len - 1)
      } else if (better(sv, iv, s(0), id(0))) {
        s(0) = sv; id(0) = iv
        siftDown(0)
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >> 1
        // min-heap on "keep" order: parent must be WORSE-or-equal than child
        if (better(s(p), id(p), s(i), id(i))) {
          val ts = s(p); val ti = id(p)
          s(p) = s(i); id(p) = id(i)
          s(i) = ts; id(i) = ti
          i = p
        } else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i // the WORST of the triple belongs on top
        if (l < len && better(s(w), id(w), s(l), id(l))) w = l
        if (r < len && better(s(w), id(w), s(r), id(r))) w = r
        if (w == i) return
        val ts = s(w); val ti = id(w)
        s(w) = s(i); id(w) = id(i)
        s(i) = ts; id(i) = ti
        i = w
      }
    }
  }
}
