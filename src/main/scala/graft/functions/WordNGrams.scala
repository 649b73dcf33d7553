package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a token array — a native one-pass replacement
  * for the pipeline's hot gram-generation shape
  *
  * {{{ array_distinct(transform(sequence(0, size(w) - n),
  *                              i -> concat_ws(' ', slice(w, i + 1, n)))) }}}
  *
  * which dominated `ds_curated` / `txt_decontaminate` (the higher-order
  * chain allocates a sequence array, a slice array per position, and a
  * lambda dispatch per element before `array_distinct` re-hashes
  * everything). This expression emits each gram once (first-occurrence
  * order, like `array_distinct`) from a single sliding pass with one
  * reused window buffer.
  *
  * Exact-equivalence contract with the HOF chain (`WordNGramsSpec` fuzzes
  * it): NULL array → NULL; NULL elements are SKIPPED inside a window
  * (`concat_ws` semantics); grams compare as full strings. One deliberate
  * divergence: `size(w) < n` yields an EMPTY array, where the raw chain's
  * `sequence(0, negative)` would walk backwards and throw on `slice` —
  * every caller guards `WHERE size(w) >= n` precisely because of that; the
  * empty result makes the guard a pure optimization instead of a
  * correctness requirement. */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 64, s"word_ngrams n must be in [1, 64], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordNGramsUtil.eval(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.WordNGramsUtil.eval($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNGramsUtil {
  private val Space = UTF8String.fromString(" ")

  def eval(arr: ArrayData, n: Int): ArrayData = {
    val num = arr.numElements()
    if (num < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet: distinct in first-occurrence order, matching
    // array_distinct over the position-ordered transform
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= num - n) {
      var cnt = 0
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(i + j)) { // concat_ws skips NULL elements
          window(cnt) = arr.getUTF8String(i + j)
          cnt += 1
        }
        j += 1
      }
      val gram =
        if (cnt == n) UTF8String.concatWs(Space, window: _*)
        else UTF8String.concatWs(Space, java.util.Arrays.copyOf(window, cnt).toIndexedSeq: _*)
      seen.add(gram)
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}
