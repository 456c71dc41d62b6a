package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding kernels (dot product and
  * L2 norm over array<float> / array<double> columns).
  *
  * These replace Scala UDFs in the ANN/near-dup/k-means hot paths: a UDF
  * boxes every element of every vector into Seq[java.lang.Float/Double]
  * per row, while these read the unsafe ArrayData directly (one
  * primitive-array copy), stay inside whole-stage codegen via a static
  * call, and keep the exact summation semantics of the DuckDB oracle
  * (in-order left fold, float upcast to double per element). The element
  * type is resolved once at plan time from the input schema — float and
  * double arrays each get their own primitive kernel.
  */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }
  // both sides must share one primitive element width: the kernel is picked
  // from the LEFT type, and reading a double-backed array with getFloat
  // would silently return garbage — fail at plan time instead
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _))   => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_f needs two array<float> or two array<double> inputs, got $l and $r")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (isDouble) DotF.computeD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else DotF.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isDouble) "computeD" else "compute"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotF.$fn($a, $b)")
  }
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

  def computeD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
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
  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm_f needs array<float> or array<double>, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    if (isDouble) NormF.computeD(v.asInstanceOf[ArrayData])
    else NormF.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isDouble) "computeD" else "compute"
    defineCodeGen(ctx, ev, c => s"graft.functions.NormF.$fn($c)")
  }
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

  def computeD(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      NormF(org.apache.spark.sql.GraftBridge.expression(c)))
}
