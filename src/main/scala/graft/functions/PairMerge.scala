package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_pair_merge(tokens, a, b)` — one BPE merge application:
  * every non-overlapping adjacent occurrence of (a, b) in the token
  * array is replaced by the concatenated token `a+b`, scanning left
  * to right greedily (the byte-pair-encoding convention: "a a a a"
  * under merge (a,a) → ["aa","aa"], two merges, not three).
  *
  * This is inherently sequential per row — not expressible as a
  * `transform` lambda (each output token depends on whether the
  * previous pair merged) — which is exactly what makes a native
  * kernel the right Spark extension point: one generated-code call,
  * no per-row closures, codegen-friendly in the merge-round scan.
  */
case class PairMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_pair_merge"

  override protected def nullSafeEval(toks: Any, a: Any, b: Any): Any =
    PairMerge.merge(toks.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, a, b) => s"graft.functions.PairMerge.merge($t, $a, $b)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PairMerge =
    copy(first = f, second = s, third = t)
}

object PairMerge {
  def merge(toks: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val m = toks.numElements()
    val out = new java.util.ArrayList[UTF8String](m)
    var i = 0
    while (i < m) {
      if (i + 1 < m && toks.getUTF8String(i).equals(a) &&
          toks.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(toks.getUTF8String(i))
        i += 1
      }
    }
    val arr = new Array[Any](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}
