package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
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

/** Affine projection kernel `W · (x − μ)` for PCA/whitening: centers the
  * input vector on `mean` and applies the flattened row-major `k×d` matrix
  * `mat` in one compiled pass, emitting the k-dim projected vector. Both
  * `mean` (length d) and `mat` (length k·d) are array<double> — in the PCA
  * path they are plan-time literals baked into codegen, so projection of a
  * 100 TB corpus is pure map-side whole-stage-codegen work with zero
  * shuffle and no per-element lambda interpretation. */
case class ProjectF(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private def isDouble: Boolean = first.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
            ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"project_f needs (array<float|double> vec, array<double> mean, array<double> mat), got $a, $b, $c")
    }
  override def nullSafeEval(v: Any, m: Any, w: Any): Any = {
    val fn = if (isDouble) ProjectF.computeD _ else ProjectF.compute _
    fn(v.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isDouble) "computeD" else "compute"
    defineCodeGen(ctx, ev, (v, m, w) => s"graft.functions.ProjectF.$fn($v, $m, $w)")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ProjectF = copy(f, s, t)
  override def prettyName: String = "project_f"
}

object ProjectF {
  private def kernel(get: Int => Double, mean: ArrayData, mat: ArrayData): ArrayData = {
    val d = mean.numElements()
    val k = mat.numElements() / d
    val c = new Array[Double](d)
    var i = 0
    while (i < d) { c(i) = get(i) - mean.getDouble(i); i += 1 }
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      var s = 0.0
      var j = 0
      val base = r * d
      while (j < d) { s += mat.getDouble(base + j) * c(j); j += 1 }
      out(r) = s
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def compute(v: ArrayData, mean: ArrayData, mat: ArrayData): ArrayData =
    kernel(i => v.getFloat(i).toDouble, mean, mat)

  def computeD(v: ArrayData, mean: ArrayData, mat: ArrayData): ArrayData =
    kernel(i => v.getDouble(i), mean, mat)

  def apply(vec: Column, mean: Column, mat: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ProjectF(
        org.apache.spark.sql.GraftBridge.expression(vec),
        org.apache.spark.sql.GraftBridge.expression(mean),
        org.apache.spark.sql.GraftBridge.expression(mat)))
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
