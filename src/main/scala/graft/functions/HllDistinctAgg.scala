package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType}

import graft.wheel.WheelAggregators

/** `hll_distinct(col[, p])` — native HyperLogLog distinct-count SQL
  * aggregate whose fold semantics are BIT-IDENTICAL to
  * [[graft.wheel.WheelAggregators.HllDistinct]]: every per-row update and
  * every partial merge delegates to the same aggregator instance, so a flat
  * SQL fold over any partitioning produces the same register array — and
  * therefore the same estimate — as a wheel decomposition over the same
  * rows (the property `HllWheelSpec` proves for the wheel side). That
  * equality is what lets [[graft.rules.UWheelRule]] answer this aggregate
  * over a time range from a registered HLL wheel with a result
  * indistinguishable from running the query.
  *
  * Register-max merging is commutative, associative, and idempotent, so the
  * estimate is deterministic under any shuffle partitioning and replay.
  * NULL inputs are skipped (SQL `COUNT(DISTINCT col)` semantics); zero rows
  * lower to 0, never NULL. Input is any integral column, widened to Long —
  * exact, so the hashes match the wheel build's cast-to-long values.
  *
  * A [[TypedImperativeAggregate]], not a codegen'd DeclarativeAggregate:
  * the buffer is one 2^p-byte array mutated in place per row
  * (ObjectHashAggregateExec), which is the same execution shape Spark's own
  * sketch aggregates use — per-row cost is one hash + one register compare,
  * no allocation. (Reference extension surface this generalizes:
  * `/root/reference/datafusion-uwheel/src/aggregator/mod.rs:8-64`.)
  */
case class HllDistinctAgg(
    child: Expression,
    p: Int = 11,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    /** Internal (not SQL-exposed): evaluate to the raw register array
      * (BinaryType) instead of the estimate — the fused index build uses
      * this to compute per-second register partials in the SAME scan as the
      * numeric wheels ([[graft.index.UWheelIndex]]). The rewrite rule only
      * matches the estimate form. */
    returnRegisters: Boolean = false)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll_distinct precision must be in [4, 16], got $p")

  // shared semantics: the wheel aggregator IS the implementation
  private lazy val hll = new WheelAggregators.HllDistinct(p)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_distinct requires an integral column, got ${other.catalogString}")
  }

  // integral widening is exact, so narrower columns hash the same longs the
  // wheel build's cast-to-long produces
  private lazy val toLong: Any => Long = child.dataType match {
    case LongType    => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType   => v => v.asInstanceOf[Short].toLong
    case ByteType    => v => v.asInstanceOf[Byte].toLong
    case other       => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): Array[Byte] = hll.identity

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer else hll.accumulate(buffer, toLong(v))
  }

  /** Register max via the shared aggregator — partials are in the
    * aggregator's canonical sparse/dense form, so the merge must be
    * format-aware (returning a fresh buffer is allowed under the
    * TypedImperativeAggregate contract). */
  override def merge(buffer: Array[Byte], input: Array[Byte]): Array[Byte] =
    hll.combine(buffer, input)

  override def eval(buffer: Array[Byte]): Any =
    if (returnRegisters) buffer else hll.lower(buffer)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = if (returnRegisters) BinaryType else LongType
  override def nullable: Boolean = false
  override def prettyName: String = if (returnRegisters) "hll_regs" else "hll_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinctAgg =
    copy(child = newChild)
}
