package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType}

/** `collect_capped_long(col, cap)` — collect long values into an array whose
  * AGGREGATION BUFFER is hard-bounded at `cap + 1` elements, evaluated as
  * the sorted array.
  *
  * This is the memory-safe twin of `sort_array(collect_list(col))` for the
  * "collect then drop oversize groups" pattern
  * ([[graft.queries.SimilarityQueries.bandedCandidates]]'s hot-bucket
  * guard): a plain `collect_list` materializes a degenerate group's FULL
  * value list in one aggregation buffer before any size filter can drop it —
  * at 100 TB a boilerplate LSH band-hash shared by 10⁸ rows is an
  * executor OOM. Here `update` and `merge` stop appending once the buffer
  * holds `cap + 1` values, so the buffer never exceeds `cap + 1` longs
  * regardless of the group's true cardinality.
  *
  * Exact filter-equivalence with the uncapped form: let `n` be the group's
  * true row count. Partials each hold `min(partial_n, cap+1)` values and
  * merge concatenates with truncation at `cap + 1`, so the final buffer
  * holds `min(n, cap+1)` values — if `n <= cap` the array is COMPLETE and
  * sorted (bit-identical to `sort_array(collect_list(col))`), and if
  * `n > cap` the array's size is exactly `cap + 1`, so a downstream
  * `size(ids) BETWEEN 2 AND cap` drops precisely the same groups the
  * uncapped form would — the decision is identical, only the discarded
  * intermediate is bounded. Which `cap + 1` values survive truncation is
  * partitioning-dependent, but only for groups the filter then drops.
  *
  * NULL inputs are skipped. A [[TypedImperativeAggregate]] like
  * `collect_list` itself, so the execution shape (ObjectHashAggregateExec)
  * is unchanged — the rewrite costs nothing but the append bound check.
  */
case class CollectCappedLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectCappedLong.Buf]
  with UnaryLike[Expression] {

  require(cap >= 1 && cap < Int.MaxValue, s"collect_capped_long cap must be >= 1, got $cap")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"collect_capped_long requires an integral column, got ${other.catalogString}")
  }

  private lazy val toLong: Any => Long = child.dataType match {
    case LongType    => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType   => v => v.asInstanceOf[Short].toLong
    case ByteType    => v => v.asInstanceOf[Byte].toLong
    case other       => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): CollectCappedLong.Buf =
    new CollectCappedLong.Buf(cap + 1)

  override def update(buffer: CollectCappedLong.Buf, input: InternalRow): CollectCappedLong.Buf = {
    val v = child.eval(input)
    if (v != null) buffer.append(toLong(v))
    buffer
  }

  override def merge(buffer: CollectCappedLong.Buf, input: CollectCappedLong.Buf)
      : CollectCappedLong.Buf = {
    buffer.appendAll(input)
    buffer
  }

  override def eval(buffer: CollectCappedLong.Buf): Any = {
    val out = java.util.Arrays.copyOf(buffer.arr, buffer.len)
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buffer: CollectCappedLong.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.len)
    bb.putInt(buffer.len)
    var i = 0
    while (i < buffer.len) { bb.putLong(buffer.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CollectCappedLong.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new CollectCappedLong.Buf(cap + 1)
    var i = 0
    while (i < n) { buf.append(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_capped_long"

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCappedLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCappedLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCappedLong =
    copy(child = newChild)
}

object CollectCappedLong {
  /** Append-bounded long buffer: `append` is a no-op once `len == limit`,
    * so the backing array can never grow past `limit` elements. Capacity
    * starts small and doubles (clamped to `limit`) — a healthy bucket of a
    * few ids never allocates the full cap. */
  final class Buf(val limit: Int) {
    var arr: Array[Long] = new Array[Long](math.min(8, limit))
    var len: Int = 0

    def append(v: Long): Unit = {
      if (len < limit) {
        if (len == arr.length) {
          arr = java.util.Arrays.copyOf(arr, math.min(limit, arr.length * 2))
        }
        arr(len) = v
        len += 1
      }
    }

    def appendAll(other: Buf): Unit = {
      var i = 0
      while (i < other.len && len < limit) { append(other.arr(i)); i += 1 }
    }
  }
}
