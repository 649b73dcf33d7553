package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

import graft.wheel.WheelAggregators
import graft.wheel.WheelAggregators.CoMoments

/** `wheel_covar_samp(x, y)` / `wheel_covar_pop(x, y)` / `wheel_corr(x, y)` —
  * EXACT co-moment covariance/correlation SQL aggregates whose content
  * semantics are IDENTICAL to
  * [[graft.wheel.WheelAggregators.CoMomentStats]]: per-row updates add the
  * pair's unscaled integers (and their squares and product) to exact
  * `BigInt` sums, merges add component-wise, finalization goes through the
  * aggregator's shared `statOf` — order-free under any partitioning, so a
  * wheel decomposition returns exactly what running the query would
  * ([[graft.rules.UWheelRule]]).
  *
  * Row discipline matches Spark's native `covar_*`/`corr`: a row
  * contributes only when BOTH inputs are non-NULL. Inputs must carry an
  * exact fixed-point representation (DECIMAL or integral — cast DOUBLE
  * explicitly), like [[MomentStatsAgg]]. n = 0 lowers to NULL; n = 1 to
  * NULL for the sample form; zero variance in either column lowers corr
  * to NULL (the 0/0 case Spark's native corr surfaces as NaN — here the
  * SQL-NULL convention keeps the result oracle-comparable).
  */
case class CoMomentStatsAgg(
    left: Expression,
    right: Expression,
    stat: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CoMomentStatsAgg.Buf]
  with BinaryLike[Expression] {

  require(CoMomentStatsAgg.Stats.contains(stat),
    s"unknown co-moment stat: $stat (one of ${CoMomentStatsAgg.Stats.mkString(", ")})")

  private def okType(dt: DataType): Boolean = dt match {
    case _: DecimalType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wheel_$stat requires DECIMAL or integral columns (cast DOUBLE explicitly), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def scaleOf(dt: DataType): Int = dt match {
    case d: DecimalType => d.scale
    case _              => 0
  }
  lazy val scaleX: Int = scaleOf(left.dataType)
  lazy val scaleY: Int = scaleOf(right.dataType)

  private lazy val ca = new WheelAggregators.CoMomentStats(scaleX, scaleY)

  private def unscaler(dt: DataType): Any => BigInt = dt match {
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
  private lazy val toX = unscaler(left.dataType)
  private lazy val toY = unscaler(right.dataType)

  override def createAggregationBuffer(): CoMomentStatsAgg.Buf = new CoMomentStatsAgg.Buf

  override def update(b: CoMomentStatsAgg.Buf, input: InternalRow): CoMomentStatsAgg.Buf = {
    val xv = left.eval(input)
    val yv = right.eval(input)
    if (xv != null && yv != null) {
      val x = toX(xv); val y = toY(yv)
      b.n = Math.addExact(b.n, 1L)
      b.sx += x; b.sy += y
      b.sxx += x * x; b.syy += y * y; b.sxy += x * y
    }
    b
  }

  override def merge(b: CoMomentStatsAgg.Buf, o: CoMomentStatsAgg.Buf): CoMomentStatsAgg.Buf = {
    b.n = Math.addExact(b.n, o.n)
    b.sx += o.sx; b.sy += o.sy
    b.sxx += o.sxx; b.syy += o.syy; b.sxy += o.sxy
    b
  }

  private def toCo(b: CoMomentStatsAgg.Buf): CoMoments =
    CoMoments(b.n, b.sx, b.sy, b.sxx, b.syy, b.sxy)

  override def eval(b: CoMomentStatsAgg.Buf): Any =
    ca.statOf(toCo(b), stat).map(Double.box).orNull

  override def serialize(b: CoMomentStatsAgg.Buf): Array[Byte] = ca.encode(toCo(b))

  override def deserialize(bytes: Array[Byte]): CoMomentStatsAgg.Buf = {
    val m = ca.decode(bytes)
    val b = new CoMomentStatsAgg.Buf
    b.n = m.n; b.sx = m.sx; b.sy = m.sy; b.sxx = m.sxx; b.syy = m.syy; b.sxy = m.sxy
    b
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"wheel_$stat"

  override def withNewMutableAggBufferOffset(newOffset: Int): CoMomentStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CoMomentStatsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CoMomentStatsAgg =
    copy(left = newLeft, right = newRight)
}

object CoMomentStatsAgg {
  val Stats: Seq[String] = Seq("covar_samp", "covar_pop", "corr")

  /** Mutable aggregation state (exact co-moments). */
  final class Buf {
    var n: Long = 0L
    var sx: BigInt = BigInt(0)
    var sy: BigInt = BigInt(0)
    var sxx: BigInt = BigInt(0)
    var syy: BigInt = BigInt(0)
    var sxy: BigInt = BigInt(0)
  }
}
