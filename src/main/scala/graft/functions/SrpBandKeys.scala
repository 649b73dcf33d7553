package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane (SRP) LSH band keys as ONE codegen'd expression:
  * `srp_band_keys(vec, bits, rowsPerBand)` returns `bits / rowsPerBand`
  * Long bucket keys, where bit `i` of band `b` is the sign of the dot
  * product with deterministic Rademacher hyperplane `b·r + i`.
  *
  * The declarative alternative — `bits` separate `vec_dot(v, typedlit(
  * plane))` columns folded into band keys — builds a Catalyst tree of
  * ~`bits × dim` literal nodes (16k for 256×64) that the optimizer and
  * codegen must chew through on every query; this expression is a single
  * node, the planes are process-cached per (bits, dim), and the whole
  * signature is one tight generated loop inside WholeStageCodegen.
  */
case class SrpBandKeys(child: Expression, bits: Int, rowsPerBand: Int)
    extends UnaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!okType(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"srp_band_keys requires array<float>/array<double>, got ${child.dataType.catalogString}")
    else if (bits <= 0 || rowsPerBand <= 0 || rowsPerBand > 63 || bits % rowsPerBand != 0)
      TypeCheckResult.TypeCheckFailure(
        s"srp_band_keys needs rowsPerBand in [1,63] dividing bits, got $bits/$rowsPerBand")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = a.numElements()
    val planes = SrpBandKeys.planesFor(bits, dim)
    val keys = new Array[Long](bits / rowsPerBand)
    val f = isFloat
    var p = 0
    while (p < bits) {
      val pl = planes(p)
      var s = 0.0
      var d = 0
      while (d < dim) {
        if (!a.isNullAt(d)) s += (if (f) a.getFloat(d).toDouble else a.getDouble(d)) * pl(d)
        d += 1
      }
      if (s > 0) keys(p / rowsPerBand) |= 1L << (p % rowsPerBand)
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    // planes held in operator state, refreshed only when the vector dim
    // changes — the hot loop must not pay a map lookup per row
    val planesField = ctx.addMutableState("double[][]", "srpPlanes")
    val dimField = ctx.addMutableState("int", "srpPlanesDim", v => s"$v = -1;")
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.freshName("planes")
      val keys = ctx.freshName("keys")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val pl = ctx.freshName("pl")
      val n = ctx.freshName("n")
      s"""
         |if ($dimField != $a.numElements()) {
         |  $planesField = graft.functions.SrpBandKeys.planesFor($bits, $a.numElements());
         |  $dimField = $a.numElements();
         |}
         |double[][] $planes = $planesField;
         |long[] $keys = new long[${bits / rowsPerBand}];
         |for (int $p = 0; $p < $bits; $p++) {
         |  double[] $pl = $planes[$p];
         |  double $s = 0.0;
         |  int $n = java.lang.Math.min($a.numElements(), $pl.length);
         |  for (int $d = 0; $d < $n; $d++) {
         |    if (!$a.isNullAt($d)) $s += (double) $a.$get($d) * $pl[$d];
         |  }
         |  if ($s > 0) $keys[$p / $rowsPerBand] |= 1L << ($p % $rowsPerBand);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBandKeys =
    copy(child = newChild)

  override def prettyName: String = "srp_band_keys"
}

object SrpBandKeys {
  /** SplitMix64 finalizer — a pure bit mix, so the hyperplanes are library
    * constants reproducible across sessions and processes (no RNG state). */
  def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()

  /** Deterministic ±1 Rademacher hyperplanes, cached per (bits, dim) per
    * process — executors pay the generation once, not per row. */
  def planesFor(bits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((bits.toLong << 32) | dim.toLong, _ =>
      Array.tabulate(bits, dim) { (p, d) =>
        if ((mix64(p.toLong * dim + d) & 1L) == 1L) 1.0 else -1.0
      })
}
