package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The rolling polynomial token fingerprint of `txt_fingerprint`, as ONE
  * codegen'd pass (r18 optimization, guide §4.1/task rule 4): the SQL HOF
  * form `aggregate(transform(ws, w -> CAST(length(w)*131 + ascii(w) AS
  * BIGINT)), 7L, (h, x) -> (h*31 + x) % 1000000007)` evaluates through
  * Spark's higher-order-function machinery — a CodegenFallback path with a
  * lambda-variable environment per ELEMENT — where this expression is a
  * tight fused loop inside whole-stage codegen.
  *
  * Exactness contract (pinned by `PolyFingerprintSpec` against the HOF form
  * itself, element for element):
  *  - `length(w)` is `UTF8String.numChars` (codepoints);
  *  - `ascii(w)` is Spark's `Ascii`: the first character's code point via
  *    `substring(0, 1).toString.codePointAt(0)`, 0 for the empty string
  *    (verified against the Spark 4.1.2 bytecode);
  *  - the per-word value is computed in INT arithmetic then widened, like
  *    the SQL CAST (same wraparound on absurd lengths);
  *  - the fold runs in Long with Scala/Java `%` (sign-preserving remainder,
  *    = the SQL `%`);
  *  - a NULL element poisons the running hash to NULL exactly as the HOF's
  *    `h*31 + NULL` does (and it never recovers), a NULL array yields NULL.
  */
object PolyFp {
  val Seed = 7L
  val WordMult = 131
  val FoldMult = 31L
  val Mod = 1000000007L

  /** NULL sentinel: the fold's range is (−Mod, Mod), so MIN_VALUE is
    * unreachable as a real hash (the CentroidAssign.Miss discipline). */
  val Miss: Long = Long.MinValue

  def fold(arr: ArrayData): Long = {
    var h = Seed
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return Miss
      val w = arr.getUTF8String(i)
      val len = w.numChars()
      val cp = if (len > 0) w.substring(0, 1).toString.codePointAt(0) else 0
      val x = len * WordMult + cp
      h = (h * FoldMult + x) % Mod
      i += 1
    }
    h
  }
}

/** `poly_fp(tokens)` — see [[PolyFp]]. */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"poly_fp requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val r = PolyFp.fold(a.asInstanceOf[ArrayData])
    if (r == PolyFp.Miss) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("pfp")
    nullSafeCodeGen(ctx, ev, a =>
      s"""long $r = graft.functions.PolyFp.fold($a);
         |if ($r == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
  override def prettyName: String = "poly_fp"
}
