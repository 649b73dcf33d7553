package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import graft.wheel.WheelAggregators

/** `hdr_quantile(col, q[, s])` — native log-bucketed approximate-quantile
  * SQL aggregate whose content semantics are IDENTICAL to
  * [[graft.wheel.WheelAggregators.HdrQuantile]]: per-row updates bucket by
  * the same IEEE-754 truncation, merges add counts, and the final lowering
  * goes through the aggregator's shared `quantileOfSorted` — so a flat SQL
  * fold over any partitioning produces the same (bucket → count) content,
  * and therefore the SAME quantile, as a wheel decomposition over the same
  * rows. That equality is what lets [[graft.rules.UWheelRule]] answer this
  * aggregate over a time range from a registered quantile-sketch wheel
  * with a result indistinguishable from running the query.
  *
  * The answer is the q-quantile's bucket lower edge: a deterministic value
  * ≤ the true quantile with relative error < 2^−s (s=7 default → 0.79 %).
  * NULL inputs are skipped; zero rows lower to NULL (SQL aggregate
  * convention); NaN buckets greatest, matching Spark's sort order, so
  * `hdr_quantile(x, 1.0)` over data containing NaN is NaN exactly like
  * `MAX`. Counts are order-free, so the sketch is deterministic under any
  * shuffle or replay.
  *
  * The aggregation buffer is a mutable (bucket → count) map — O(1)
  * per row, no per-row encoding — serialized to the aggregator's CANONICAL
  * sorted byte form at exchange boundaries and for the `returnBins` form
  * the fused index build consumes ([[graft.index.UWheelIndex]]).
  */
case class HdrQuantileAgg(
    child: Expression,
    q: Double,
    s: Int = 7,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    /** Internal (not SQL-exposed): evaluate to the canonical bin array
      * (BinaryType) instead of the quantile — the fused index build uses
      * this to compute per-second sketch partials in the SAME scan as the
      * numeric wheels. The rewrite rule only matches the quantile form. */
    returnBins: Boolean = false)
  extends TypedImperativeAggregate[mutable.LongMap[Long]]
  with UnaryLike[Expression] {

  require(s >= 1 && s <= 20, s"hdr_quantile resolution must be in [1, 20], got $s")
  require(returnBins || (q >= 0.0 && q <= 1.0),
    s"hdr_quantile q must be in [0, 1], got $q")

  // shared semantics: the wheel aggregator IS the implementation
  private lazy val hdr = new WheelAggregators.HdrQuantile(s)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | ByteType | ShortType | IntegerType | LongType |
        _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hdr_quantile requires a numeric column, got ${other.catalogString}")
  }

  // the same numeric→double image the index build's `cast(col as double)`
  // projection produces, so both sides bucket identical doubles
  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType     => v => v.asInstanceOf[Double]
    case FloatType      => v => v.asInstanceOf[Float].toDouble
    case LongType       => v => v.asInstanceOf[Long].toDouble
    case IntegerType    => v => v.asInstanceOf[Int].toDouble
    case ShortType      => v => v.asInstanceOf[Short].toDouble
    case ByteType       => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType => v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case other          => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buffer: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = hdr.bucketOf(toDouble(v)).toLong
      buffer.update(b, buffer.getOrElse(b, 0L) + 1L)
    }
    buffer
  }

  override def merge(buffer: mutable.LongMap[Long], input: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    input.foreachEntry { (k, c) =>
      buffer.update(k, Math.addExact(buffer.getOrElse(k, 0L), c))
    }
    buffer
  }

  /** Sorted (bucket, count) content of the buffer. */
  private def sorted(buffer: mutable.LongMap[Long]): (Array[Int], Array[Long]) = {
    val n = buffer.size
    val ks = new Array[Long](n)
    var i = 0
    buffer.foreachKey { k => ks(i) = k; i += 1 }
    java.util.Arrays.sort(ks)
    val idxs = new Array[Int](n)
    val cnts = new Array[Long](n)
    i = 0
    while (i < n) { idxs(i) = ks(i).toInt; cnts(i) = buffer(ks(i)); i += 1 }
    (idxs, cnts)
  }

  override def eval(buffer: mutable.LongMap[Long]): Any = {
    val (idxs, cnts) = sorted(buffer)
    if (returnBins) hdr.encodeSorted(idxs, cnts)
    else if (idxs.isEmpty) null
    else hdr.quantileOfSorted(idxs, cnts, q)
  }

  override def serialize(buffer: mutable.LongMap[Long]): Array[Byte] = {
    val (idxs, cnts) = sorted(buffer)
    hdr.encodeSorted(idxs, cnts)
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val (idxs, cnts) = hdr.decode(bytes)
    val m = mutable.LongMap.empty[Long]
    var k = 0
    while (k < idxs.length) { m.update(idxs(k).toLong, cnts(k)); k += 1 }
    m
  }

  override def dataType: DataType = if (returnBins) BinaryType else DoubleType
  override def nullable: Boolean = !returnBins
  override def prettyName: String = if (returnBins) "hdr_bins" else "hdr_quantile"

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HdrQuantileAgg =
    copy(child = newChild)
}
