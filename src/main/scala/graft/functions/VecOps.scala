package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the embedding kernels (dot product and
  * L2 norm over array<float> columns).
  *
  * These replace Scala UDFs in the ANN/near-dup hot path: a UDF boxes every
  * float of every vector into Seq[java.lang.Float] per row, while these
  * read the unsafe ArrayData directly (one primitive-array copy), stay
  * inside whole-stage codegen via a static call, and keep the exact
  * summation semantics of the DuckDB oracle (in-order left fold, float
  * upcast to double per element).
  */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    DotF.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotF.compute($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF =
    copy(left = l, right = r)
  override def prettyName: String = "dot_f"
}

object DotF {
  /** Static kernel referenced from generated code. In-order sum, identical
    * to any engine's element-wise fold. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      DotF(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}

case class NormF(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = NormF.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormF.compute($c)")
  override protected def withNewChildInternal(c: Expression): NormF = copy(c)
  override def prettyName: String = "norm_f"
}

object NormF {
  def compute(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      NormF(org.apache.spark.sql.GraftBridge.expression(c)))
}
