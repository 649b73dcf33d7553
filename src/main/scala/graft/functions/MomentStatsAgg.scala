package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import graft.wheel.WheelAggregators
import graft.wheel.WheelAggregators.Moments

/** `wheel_var_samp(col)` / `wheel_var_pop(col)` / `wheel_stddev_samp(col)` /
  * `wheel_stddev_pop(col)` — EXACT-moment variance/stddev SQL aggregates
  * whose content semantics are IDENTICAL to
  * [[graft.wheel.WheelAggregators.MomentStats]]: per-row updates add the
  * value's unscaled integer (and its square) to exact `BigInt` sums, merges
  * add component-wise, and finalization goes through the aggregator's
  * shared `statOf` — so a flat SQL fold over any partitioning produces the
  * same (n, Σx, Σx²) content, and therefore the SAME stat, as a wheel
  * decomposition over the same rows. That equality is what lets
  * [[graft.rules.UWheelRule]] answer these aggregates over a time range
  * from a registered moment wheel with a result indistinguishable from
  * running the query.
  *
  * Unlike Spark's native `var_samp`/`stddev` (a streaming central-moment
  * recurrence whose float result depends on partition merge order), the
  * moment arithmetic here is exact integer math with ONE correctly-rounded
  * double conversion per term and a fixed two-division finalization —
  * deterministic under any shuffle, and expressible verbatim as oracle SQL
  * (`CAST(n·Σx² − Σx² AS DOUBLE) / CAST(den AS DOUBLE) / 10^(2s)`).
  *
  * The input must carry an exact fixed-point representation: a DECIMAL
  * column (moments at the column's own scale) or an integral column
  * (scale 0). DOUBLE inputs are rejected — cast them
  * (`wheel_var_samp(CAST(v AS DECIMAL(18,2)))`), which pins the exactness
  * contract in the query text. NULLs are skipped; n = 0 lowers to NULL for
  * every stat, n = 1 to NULL for the sample forms (SQL convention).
  */
case class MomentStatsAgg(
    child: Expression,
    stat: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentStatsAgg.Buf]
  with UnaryLike[Expression] {

  require(MomentStatsAgg.Stats.contains(stat),
    s"unknown moment stat: $stat (one of ${MomentStatsAgg.Stats.mkString(", ")})")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DecimalType | ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wheel_$stat requires a DECIMAL or integral column (cast DOUBLE explicitly: " +
        s"wheel_$stat(CAST(col AS DECIMAL(18,2)))), got ${other.catalogString}")
  }

  /** The input's fixed-point scale — the moment wheel serving this
    * aggregate must have been built at the same one. */
  lazy val inputScale: Int = child.dataType match {
    case d: DecimalType => d.scale
    case _              => 0
  }

  private lazy val ma = new WheelAggregators.MomentStats(inputScale)

  // unscaled-integer image of the input value (exact by construction)
  private lazy val toUnscaled: Any => BigInt = child.dataType match {
    case d: DecimalType if d.precision <= 18 =>
      v => BigInt(v.asInstanceOf[Decimal].toUnscaledLong)
    case _: DecimalType =>
      v => BigInt(v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue())
    case LongType    => v => BigInt(v.asInstanceOf[Long])
    case IntegerType => v => BigInt(v.asInstanceOf[Int].toLong)
    case ShortType   => v => BigInt(v.asInstanceOf[Short].toLong)
    case ByteType    => v => BigInt(v.asInstanceOf[Byte].toLong)
    case other       => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): MomentStatsAgg.Buf = new MomentStatsAgg.Buf

  override def update(b: MomentStatsAgg.Buf, input: InternalRow): MomentStatsAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val u = toUnscaled(v)
      b.n = Math.addExact(b.n, 1L)
      b.sx += u
      b.sxx += u * u
    }
    b
  }

  override def merge(b: MomentStatsAgg.Buf, o: MomentStatsAgg.Buf): MomentStatsAgg.Buf = {
    b.n = Math.addExact(b.n, o.n)
    b.sx += o.sx
    b.sxx += o.sxx
    b
  }

  override def eval(b: MomentStatsAgg.Buf): Any =
    ma.statOf(Moments(b.n, b.sx, b.sxx), stat).map(Double.box).orNull

  override def serialize(b: MomentStatsAgg.Buf): Array[Byte] =
    ma.encode(Moments(b.n, b.sx, b.sxx))

  override def deserialize(bytes: Array[Byte]): MomentStatsAgg.Buf = {
    val m = ma.decode(bytes)
    val b = new MomentStatsAgg.Buf
    b.n = m.n; b.sx = m.sx; b.sxx = m.sxx
    b
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"wheel_$stat"

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentStatsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MomentStatsAgg =
    copy(child = newChild)
}

object MomentStatsAgg {
  val Stats: Seq[String] = Seq("var_samp", "var_pop", "stddev_samp", "stddev_pop")

  /** Mutable aggregation state (exact moments). */
  final class Buf {
    var n: Long = 0L
    var sx: BigInt = BigInt(0)
    var sxx: BigInt = BigInt(0)
  }
}
