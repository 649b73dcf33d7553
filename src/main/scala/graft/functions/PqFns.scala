package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives — the memory tier BELOW raw vectors for
  * ANN at 100 TB. A dim-`d` float vector is 4·d bytes; its PQ code is `m`
  * bytes (one sub-quantizer index per `d/m`-component subspace), a 32×
  * compression at d=64/m=8 that turns a 1 TB embedding column into ~32 GB
  * of codes — the difference between "the scan tier fits in cluster
  * memory" and not. Queries score codes by ADC (asymmetric distance
  * computation): ONE dot-product table per (query, subspace) against the
  * shared codebook, then each candidate costs `m` table lookups + adds
  * instead of a `d`-wide dot product.
  *
  * All arithmetic is sequential double folds in fixed index order, so
  * codes and scores are deterministic under any partitioning AND
  * reproducible by the DuckDB oracle (the same cross-engine float-parity
  * discipline `emb_quant` and `ann_ivf` already rely on). The codebook is
  * deterministic too: stride-picked donor vectors sliced per subspace
  * ([[graft.queries.SimilarityQueries]]), not k-means — same trade the
  * IVF centroids make so the contract stays exactly checkable.
  */
object Pq {

  /** Flattened codebook layout: `cents((mi * ks + j) * sub + t)` is
    * component `t` of centroid `j` of subspace `mi`; `sub` derives as
    * `cents.length / (m * ks)`. */
  def subDim(cents: Array[Double], m: Int, ks: Int): Int = cents.length / (m * ks)

  /** Per-subspace L2 argmin over the codebook → one byte per subspace.
    * Fixed iteration order (t ascending, j ascending, first-wins ties) —
    * byte-identical codes under any partitioning. Vectors shorter than
    * m·sub read missing components as 0 (degenerate; the corpus case is
    * fixed-dim). */
  def encode(v: ArrayData, isFloat: Boolean, cents: Array[Double], m: Int, ks: Int): Array[Byte] = {
    val sub = subDim(cents, m, ks)
    val n = v.numElements()
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ks) {
        var d = 0.0
        var t = 0
        while (t < sub) {
          val idx = mi * sub + t
          val x =
            if (idx >= n || v.isNullAt(idx)) 0.0
            else if (isFloat) v.getFloat(idx).toDouble else v.getDouble(idx)
          val diff = x - cents((mi * ks + j) * sub + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  /** Query-side ADC table: `lut(mi * ks + j)` = dot(q's subspace-`mi`
    * slice, centroid `j` of subspace `mi`). One m·ks-entry table per
    * query, computed ONCE; every candidate then scores in m lookups. */
  def lut(q: ArrayData, isFloat: Boolean, cents: Array[Double], m: Int, ks: Int): Array[Double] = {
    val sub = subDim(cents, m, ks)
    val n = q.numElements()
    val out = new Array[Double](m * ks)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < ks) {
        var d = 0.0
        var t = 0
        while (t < sub) {
          val idx = mi * sub + t
          val x =
            if (idx >= n || q.isNullAt(idx)) 0.0
            else if (isFloat) q.getFloat(idx).toDouble else q.getDouble(idx)
          d += x * cents((mi * ks + j) * sub + t)
          t += 1
        }
        out(mi * ks + j) = d
        j += 1
      }
      mi += 1
    }
    out
  }

  /** ADC score: Σ over subspaces of the candidate's code-indexed table
    * entry — the approximate dot(query, candidate). Sequential fold in
    * subspace order. `ks` derives from the shapes. */
  def adc(lut: ArrayData, codes: Array[Byte]): Double = {
    val m = codes.length
    val ks = lut.numElements() / math.max(1, m)
    var s = 0.0
    var mi = 0
    while (mi < m) {
      s += lut.getDouble(mi * ks + (codes(mi) & 0xff))
      mi += 1
    }
    s
  }
}

private[functions] trait PqCodebookExpr { self: UnaryExpression =>
  def cents: Array[Double]
  def m: Int
  def ks: Int
  require(m >= 1 && ks >= 1 && ks <= 256 &&
    cents.length % (m * ks) == 0 && cents.length > 0,
    s"pq codebook shape mismatch: ${cents.length} doubles for m=$m, ks=$ks")

  protected def isFloatChild: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq expressions require array<float>/array<double>, got ${other.catalogString}")
  }
}

/** `PqEncode(vector)` → BinaryType code (m bytes). The codebook rides the
  * expression as a plan-time constant (ctx reference object in codegen) —
  * it is m·ks·sub doubles ≈ 16 KB at the defaults, broadcast implicitly
  * with the plan like the SRP planes. */
case class PqEncode(child: Expression, cents: Array[Double], m: Int, ks: Int)
    extends UnaryExpression with PqCodebookExpr {

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    Pq.encode(v.asInstanceOf[ArrayData], isFloatChild, cents, m, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Pq.encode($v, $isFloatChild, $centsRef, $m, $ks);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** `PqLut(query)` → array<double> of m·ks dot-product entries. */
case class PqLut(child: Expression, cents: Array[Double], m: Int, ks: Int)
    extends UnaryExpression with PqCodebookExpr {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Pq.lut(v.asInstanceOf[ArrayData], isFloatChild, cents, m, ks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Pq.lut($v, $isFloatChild, $centsRef, $m, $ks));
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

/** `PqAdc(lut, codes)` → double approximate dot product: m lookups + adds
  * per candidate inside whole-stage codegen — the per-row cost that
  * replaces a d-wide dot product on the scan side. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<double> lut, binary codes), got ${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, c: Any): Any =
    Pq.adc(l.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, c) =>
      s"${ev.value} = graft.functions.Pq.adc($l, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}
