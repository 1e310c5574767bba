package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `graft_dot(a, b)` — dot product of two `array<double>` columns.
  *
  * Spark has no built-in vector dot: `aggregate(zip_with(...))`
  * builds per-element interpreted lambda calls, and an unrolled
  * 64-term `a[0]*b[0] + ...` expression tree blows up generated-code
  * size (risking the 64KB method limit → interpreted fallback). This
  * native expression evaluates as one tight primitive loop in both
  * interpreted and codegen paths — the hot inner kernel of every
  * similarity/dedup operator over embeddings.
  *
  * Nulls: null array → null; elements are read as primitive doubles
  * (embedding arrays are dense, never element-null). Length = min of
  * the two arrays.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Called from generated code — keep it a static, JIT-friendly loop. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
