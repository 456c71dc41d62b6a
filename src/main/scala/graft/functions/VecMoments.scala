package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** First and second vector moments in ONE corpus pass — the distributed
  * half of PCA fitting (Similarity.pcaFit) and of any covariance-shaped
  * statistic over an embedding column.
  *
  * State is a fixed Array[Double] of `1 + d + d·(d+1)/2` slots: row count,
  * per-dimension sums, and the upper triangle of the Σxxᵀ Gram sums (the
  * matrix is symmetric — storing half keeps a d=1024 state at ~4 MB
  * instead of 8). Update is the d·(d+1)/2 fused multiply-adds of one outer
  * product; merge is elementwise addition — so the full corpus folds
  * through Spark's partial aggregation with one constant-size buffer per
  * partition on the shuffle, the same shape as [[KmvSketch]]/[[CmsSketch]].
  * At 100 TB this is the ONLY scan PCA needs; the eigensolve downstream
  * runs on the d×d driver-side matrix, never on data.
  *
  * Rows whose vector is NULL or whose length differs from `dim` are
  * skipped (count excludes them), mirroring the skip-null convention of
  * the other sketch aggregates.
  */
case class VecMoments(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  require(dim >= 1, "vec_moments needs dim >= 1")

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_moments needs array<float> or array<double>, got $other")
  }

  private val stateLen = 1 + dim + dim * (dim + 1) / 2

  override def createAggregationBuffer(): Array[Double] = new Array[Double](stateLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // Rows with null ELEMENTS are skipped like full-null / wrong-length
      // vectors — ArrayData.getDouble on a null slot would silently read
      // 0.0 and bias every mean/covariance instead of honoring the
      // documented skip-null convention.
      var hasNull = false
      var n = 0
      while (n < arr.numElements() && !hasNull) {
        if (arr.isNullAt(n)) hasNull = true; n += 1
      }
      if (arr.numElements() == dim && !hasNull) {
        val x = new Array[Double](dim)
        var i = 0
        if (isDouble) while (i < dim) { x(i) = arr.getDouble(i); i += 1 }
        else while (i < dim) { x(i) = arr.getFloat(i).toDouble; i += 1 }
        buf(0) += 1.0
        i = 0
        while (i < dim) { buf(1 + i) += x(i); i += 1 }
        var o = 1 + dim
        i = 0
        while (i < dim) {
          val xi = x(i)
          var j = i
          while (j < dim) { buf(o) += xi * x(j); j += 1; o += 1 }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): VecMoments =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecMoments =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(nc: Expression): VecMoments =
    copy(child = nc)
  override def prettyName: String = "vec_moments"
}

object VecMoments {

  /** Column-API aggregate: `[n, sum_0..sum_{d-1}, upper-triangle Σx_i·x_j]`
    * over the group's vectors. */
  def moments(vec: Column, dim: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      VecMoments(
        org.apache.spark.sql.GraftBridge.resolvedExpression(vec),
        dim).toAggregateExpression())

  /** Offset of the (i, j) upper-triangle Gram slot (i <= j) inside the
    * state array — shared by the aggregate and its consumers. */
  def triOffset(dim: Int, i: Int, j: Int): Int =
    1 + dim + (i * (2 * dim - i - 1)) / 2 + j
}
