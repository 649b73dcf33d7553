package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import graft.wheel.WheelAggregators

/** `cms_freq(key, target[, logW, d])` — native Count-Min point-frequency
  * SQL aggregate whose content semantics are IDENTICAL to
  * [[graft.wheel.WheelAggregators.CmsFreq]]: per-row updates hash into the
  * same `d` counter slots, merges add counts, and the final lowering goes
  * through the aggregator's `freqOf` — so a flat SQL fold over any
  * partitioning produces the same (slot → count) content, and therefore
  * the SAME estimate, as a wheel decomposition over the same rows. That
  * equality is what lets [[graft.rules.UWheelRule]] answer this aggregate
  * over a time range from a registered frequency-sketch wheel with a
  * result indistinguishable from running the query.
  *
  * The answer is an OVERestimate of the target's true row count, never an
  * under-estimate (`P[err > 2n/2^logW] < 2^−d`); 0 means provably absent.
  * NULL keys are skipped; zero rows lower to 0 (a frequency, like
  * COUNT). Counters are order-free, so the sketch is deterministic under
  * any shuffle or replay.
  *
  * The aggregation buffer is a mutable (slot → count) map — O(d) per row,
  * no per-row encoding — serialized to the aggregator's CANONICAL sorted
  * byte form at exchange boundaries and for the `returnSketch` form the
  * fused index build consumes ([[graft.index.UWheelIndex]]).
  */
case class CmsFreqAgg(
    child: Expression,
    target: Long,
    logW: Int = 12,
    d: Int = 4,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    /** Internal (not SQL-exposed): evaluate to the canonical sketch array
      * (BinaryType) instead of the estimate — the fused index build uses
      * this to compute per-second sketch partials in the SAME scan as the
      * numeric wheels. The rewrite rule only matches the frequency form. */
    returnSketch: Boolean = false)
  extends TypedImperativeAggregate[mutable.LongMap[Long]]
  with UnaryLike[Expression] {

  require(d >= 1 && d <= 8, s"cms_freq depth must be in [1, 8], got $d")
  require(logW >= 4 && logW <= 20, s"cms_freq logW must be in [4, 20], got $logW")

  // shared semantics: the wheel aggregator IS the implementation
  private lazy val cms = new WheelAggregators.CmsFreq(d, logW)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_freq requires an integral key column, got ${other.catalogString}")
  }

  // the same integral→long widening the index build's `cast(col as long)`
  // projection performs, so both sides hash identical longs
  private lazy val toLong: Any => Long = child.dataType match {
    case LongType    => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType   => v => v.asInstanceOf[Short].toLong
    case ByteType    => v => v.asInstanceOf[Byte].toLong
    case other       => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buffer: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val slots = cms.slotsOf(toLong(v))
      var i = 0
      while (i < slots.length) {
        val s = slots(i).toLong
        // addExact for the same overflow-degrade discipline as merge()/
        // combine(); unreachable in practice (2^63 rows per counter)
        buffer.update(s, Math.addExact(buffer.getOrElse(s, 0L), 1L))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: mutable.LongMap[Long], input: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    input.foreachEntry { (k, c) =>
      buffer.update(k, Math.addExact(buffer.getOrElse(k, 0L), c))
    }
    buffer
  }

  /** Sorted (slot, count) content of the buffer. */
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
    val p = cms.encodeSorted(idxs, cnts)
    if (returnSketch) p else cms.freqOf(p, target)
  }

  override def serialize(buffer: mutable.LongMap[Long]): Array[Byte] = {
    val (idxs, cnts) = sorted(buffer)
    cms.encodeSorted(idxs, cnts)
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val (idxs, cnts) = cms.decode(bytes)
    val m = mutable.LongMap.empty[Long]
    var k = 0
    while (k < idxs.length) { m.update(idxs(k).toLong, cnts(k)); k += 1 }
    m
  }

  override def dataType: DataType = if (returnSketch) BinaryType else LongType
  override def nullable: Boolean = false
  override def prettyName: String = if (returnSketch) "cms_sketch" else "cms_freq"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsFreqAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsFreqAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsFreqAgg =
    copy(child = newChild)
}
