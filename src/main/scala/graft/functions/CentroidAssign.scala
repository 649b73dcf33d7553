package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Two-level coarse→fine IVF centroid assignment as ONE codegen'd map
  * expression — the r18 optimization replacing the join/aggregate
  * assignment's two corpus-wide shuffles (guide §2.4: the argmax form
  * `cross join broadcast(cands) → groupBy(vec) → max(struct(sim, -id))`
  * shuffles one row per corpus vector per level, when both centroid sets
  * are broadcast-small by construction — so the decision is computable
  * where the row already is).
  *
  * The hierarchy rides as a plan constant ([[CentroidAssign.Hier]]):
  * O(√n·d) doubles — the same payload every consumer already collects for
  * `broadcast(fines)`, and the discipline [[PqEncode]]'s codebook
  * established.
  *
  * Exactness contract (vs the join/aggregate form it replaces):
  *  - similarity is the identical arithmetic in the identical order:
  *    `vec_dot(v, c) / (nrm * nc)` with [[VecDot]]'s sequential
  *    float→double widening fold;
  *  - the argmax order is SQL's total order on DOUBLE (java.lang.Double
  *    .compare: NaN greatest, -0.0 < 0.0 — what max(struct(...)) uses),
  *    ties broken to the SMALLER centroid id (≡ the `-id` struct field);
  *  - a vector whose winning coarse cell holds no fine centroids yields
  *    NULL (callers filter it) — replicating the inner join's drop of
  *    such rows.
  */
object CentroidAssign {

  /** Flattened hierarchy: coarse cell `c`'s fine centroids occupy indices
    * `cellOff(c) until cellOff(c + 1)` of the fine arrays; vectors are
    * dim-`d` slices of the flat vecs arrays (exact float→double widening
    * of the corpus values). */
  final case class Hier(
      d: Int,
      coarseIds: Array[Long], coarseVecs: Array[Double], coarseNorms: Array[Double],
      cellOff: Array[Int],
      fineIds: Array[Long], fineVecs: Array[Double], fineNorms: Array[Double])
    extends Serializable

  /** Sentinel for "no assignable fine cell" — converted to NULL by the
    * expression (never a legal vec_id: ids are non-negative in every
    * corpus, and the join form could not produce it either). */
  val Miss: Long = Long.MinValue

  private def simAt(
      v: ArrayData, isFloat: Boolean, nrm: Double,
      vecs: Array[Double], norms: Array[Double], j: Int, d: Int): Double = {
    val n = math.min(v.numElements(), d)
    var s = 0.0
    var i = 0
    val base = j * d
    while (i < n) {
      if (!v.isNullAt(i)) {
        val xv = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += xv * vecs(base + i)
      }
      i += 1
    }
    s / (nrm * norms(j))
  }

  /** The assignment kernel (interpreted + codegen entry point). */
  def assign(v: ArrayData, isFloat: Boolean, nrm: Double, h: Hier): Long = {
    val kc = h.coarseIds.length
    if (kc == 0) return Miss
    var bestC = -1
    var bestCs = 0.0
    var j = 0
    while (j < kc) {
      val s = simAt(v, isFloat, nrm, h.coarseVecs, h.coarseNorms, j, h.d)
      if (bestC < 0 || java.lang.Double.compare(s, bestCs) > 0 ||
          (java.lang.Double.compare(s, bestCs) == 0 && h.coarseIds(j) < h.coarseIds(bestC))) {
        bestC = j; bestCs = s
      }
      j += 1
    }
    var bestF = -1
    var bestFs = 0.0
    var f = h.cellOff(bestC)
    val end = h.cellOff(bestC + 1)
    while (f < end) {
      val s = simAt(v, isFloat, nrm, h.fineVecs, h.fineNorms, f, h.d)
      if (bestF < 0 || java.lang.Double.compare(s, bestFs) > 0 ||
          (java.lang.Double.compare(s, bestFs) == 0 && h.fineIds(f) < h.fineIds(bestF))) {
        bestF = f; bestFs = s
      }
      f += 1
    }
    if (bestF < 0) Miss else h.fineIds(bestF)
  }
}

/** `CentroidAssignExpr(v, nrm)` → assigned fine centroid id (LONG, NULL on
  * an unassignable row — see [[CentroidAssign]]). */
case class CentroidAssignExpr(left: Expression, right: Expression,
    h: CentroidAssign.Hier) extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_assign requires (array<float|double> vec, double nrm), " +
            s"got ${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def isFloatVec: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, n: Any): Any = {
    val r = CentroidAssign.assign(
      v.asInstanceOf[ArrayData], isFloatVec, n.asInstanceOf[Double], h)
    if (r == CentroidAssign.Miss) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hRef = ctx.addReferenceObj("caHier", h, classOf[CentroidAssign.Hier].getName)
    val r = ctx.freshName("car")
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"""long $r = graft.functions.CentroidAssign.assign($v, $isFloatVec, $n, $hRef);
         |if ($r == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidAssignExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "centroid_assign"
}
