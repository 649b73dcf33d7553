package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered positional pairs of an array — a native one-pass replacement
  * for the co-occurrence pair-generation shape
  *
  * {{{ flatten(transform(ds, (x, xi) ->
  *       transform(slice(ds, xi + 2, size(ds)),
  *                 y -> named_struct('i', x, 'j', y)))) }}}
  *
  * which dominated the shingle-Jaccard family: for a k-element list the HOF
  * chain allocates k slice copies (O(k²) element copies BEFORE any pair
  * exists), k inner result arrays, a k-array outer array, and a flattened
  * copy of all k·(k−1)/2 structs — plus two lambda dispatches per pair.
  * This expression writes each pair struct exactly once into one result
  * array.
  *
  * Semantics (fuzz-pinned to the HOF chain by `ArrayPairsSpec`): input
  * array<T> → array<struct<i:T, j:T>> with one entry per position pair
  * a < b, in (a, b) lexicographic order; NULL array → NULL; arrays of size
  * < 2 → empty. NULL elements pass through into the structs unchanged
  * (callers pair grouped key lists, which are non-null by construction).
  * Over a sorted doc-id list this yields exactly the i < j candidate pairs
  * the dedup family counts. */
case class ArrayPairs(child: Expression) extends UnaryExpression {

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType // checkInputDataTypes rejects before eval
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_pairs requires an array, got ${other.catalogString}")
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(et, n) => ArrayType(
      StructType(Seq(StructField("i", et, n), StructField("j", et, n))),
      containsNull = false)
    case _ => ArrayType(StructType(Nil), containsNull = false)
  }

  override def nullSafeEval(input: Any): Any =
    ArrayPairsUtil.eval(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType, classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.ArrayPairsUtil.eval($arr, $et);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayPairs =
    copy(child = newChild)

  override def prettyName: String = "array_pairs"
}

object ArrayPairsUtil {
  def eval(arr: ArrayData, elemType: DataType): ArrayData = {
    val k = arr.numElements()
    if (k < 2) return new GenericArrayData(Array.empty[Any])
    // k is a grouped-list size; k(k-1)/2 structs are materialized exactly
    // once (callers cap k — TextQueries.ShingleCapDf — so this is bounded)
    val elems = new Array[Any](k)
    var p = 0
    while (p < k) { elems(p) = arr.get(p, elemType); p += 1 }
    val out = new Array[Any](k * (k - 1) / 2)
    var w = 0
    var a = 0
    while (a < k - 1) {
      val ea = elems(a)
      var b = a + 1
      while (b < k) {
        out(w) = new GenericInternalRow(Array[Any](ea, elems(b)))
        w += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }
}
