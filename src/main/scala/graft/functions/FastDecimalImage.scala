package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `try_cast(double AS decimal(precision, scale))` with a scaled-long fast
  * path — the index build's exactness probe and sum-image cast, minus the
  * `Decimal.set(double)` → `Double.toString` → `BigDecimal` parse that
  * dominated the lineitem build's executor samples (~40%, round-10
  * verdict task 6).
  *
  * Fast path: the candidate unscaled long `u = rint(v·10^s)` is accepted
  * when `|u| ≤ 2^50` and `(double) u / 10^s == v` — i.e. the s-digit
  * decimal `u·10^-s` round-trips to exactly this double. Under the 2^50
  * bound, `|v| ≤ 2^50/10^s` gives `ulp(v) ≤ |v|·2^-51 ≤ 10^-s/2`, so only
  * half-ulp distances (`≤ 10^-s/4`) separate v from both `u·10^-s` and
  * from any decimal representation of v: (a) `u·10^-s` is the UNIQUE
  * s-digit decimal in v's rounding interval (interval width `ulp ≤
  * 10^-s/2` < the `10^-s` grid spacing), and (b) every decimal
  * representation of v — in particular the shortest one `Double.toString`
  * produces — lies within `2·(10^-s/4) = 10^-s/2` of `u·10^-s`, with
  * equality only if both half-ulp distances are exactly `10^-s/4`, i.e.
  * `ulp(v) = 10^-s/2` — excluded by the bound: for s ≥ 1 that is not a
  * power of two (every ulp is), and for s = 0 it needs `|v| ≥ 2^51 > 2^50`.
  * `HALF_UP`
  * rounding of the representation to s digits therefore yields `u`.
  * Half-even vs half-up cannot diverge either: a true .5 tie fails the
  * round-trip check and falls through. Everything else — NaN/Infinity (→ NULL like
  * `try_cast`), subnormals, magnitudes past 2^50, genuine > s-digit
  * doubles — takes Spark's own conversion, bit-for-bit the `try_cast`
  * result (`FastDecimalImageSpec` fuzzes the equivalence).
  */
case class FastDecimalImage(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression {
  require(precision >= 1 && precision <= 38 && scale >= 0 && scale <= precision,
    s"invalid decimal($precision, $scale)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fast_decimal_image requires a DOUBLE child, got ${child.dataType.catalogString}")

  override def dataType: DataType = DecimalType(precision, scale)
  override def nullable: Boolean = true

  private val pow: Double = math.pow(10d, scale) // exact for scale ≤ 22

  override def nullSafeEval(input: Any): Any =
    FastDecimalImages.convert(input.asInstanceOf[Double], precision, scale, pow)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.FastDecimalImages.convert($v, $precision, $scale, ${pow}D);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FastDecimalImage =
    copy(child = newChild)

  override def prettyName: String = "fast_decimal_image"
}

object FastDecimalImages {
  /** |unscaled| bound of the fast path — see [[FastDecimalImage]]'s
    * uniqueness argument. 2^50 at scale 2 still covers ±11.2 trillion. */
  private val MaxFastUnscaled: Double = (1L << 50).toDouble

  private val Pow10: Array[Double] =
    (0 to 15).map(i => math.pow(10d, i)).toArray

  /** NULL (like `try_cast`) on NaN/Infinity/precision overflow; otherwise
    * the HALF_UP s-digit decimal of v's shortest decimal representation —
    * Spark's exact double→decimal semantics, via the long fast path when
    * the round-trip proves it sound. The fast path additionally requires
    * (a) the candidate to FIT the target precision — `Decimal(u, p, s)`
    * would otherwise throw where `try_cast` returns NULL (review finding:
    * precision ≤ 15 with an in-2^50-range value) — and (b) `scale ≤ 15`,
    * keeping `pow = 10^s` trivially exact; larger scales take the slow
    * path wholesale (no call site uses them, but the expression's
    * contract covers [0, 38]). */
  def convert(v: Double, precision: Int, scale: Int, pow: Double): Decimal = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return null
    if (scale <= 15) {
      val bound =
        if (precision > 15) MaxFastUnscaled
        else math.min(MaxFastUnscaled, Pow10(precision) - 1d)
      val r = Math.rint(v * pow)
      if (Math.abs(r) <= bound) {
        val u = r.toLong
        if (u.toDouble / pow == v) return Decimal(u, precision, scale)
      }
    }
    val d = Decimal(v) // shortest-repr parse — the exact slow path
    if (d.changePrecision(precision, scale)) d else null
  }
}
