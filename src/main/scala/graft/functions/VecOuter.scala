package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cross outer-product sums Σ aᵢ·bᵢᵀ over two vector columns in ONE corpus
  * pass — the distributed half of the orthogonal-Procrustes rotation
  * update (Similarity.opqTrain): OPQ's R-step needs B = Σ x·q(Rx)ᵀ, a
  * dimA×dimB matrix, and this aggregate reduces the whole corpus to that
  * matrix with one constant-size buffer per partition on the shuffle (the
  * [[VecMoments]] contract for the asymmetric case — VecMoments stores the
  * symmetric Gram triangle, this stores the full rectangle because a≠b).
  *
  * State is `1 + dimA·dimB` doubles: row count then the row-major matrix
  * sums. Update is one fused outer product; merge is elementwise addition,
  * so at 100 TB the rotation update is ONE scan however the corpus is
  * partitioned — the d×d polar decomposition downstream runs driver-side
  * on metadata. Rows where either vector is NULL, wrong-length, or carries
  * null elements are skipped (count excludes them), mirroring
  * [[VecMoments]]' skip-null convention.
  */
case class VecOuter(
    left: Expression,
    right: Expression,
    dimA: Int,
    dimB: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with BinaryLike[Expression] {

  require(dimA >= 1 && dimB >= 1, "vec_outer needs positive dims")

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_outer needs two array<float|double> columns, got " +
        s"${left.dataType} and ${right.dataType}")

  private val stateLen = 1 + dimA * dimB

  override def createAggregationBuffer(): Array[Double] = new Array[Double](stateLen)

  private def readVec(e: Expression, input: InternalRow, dim: Int): Array[Double] = {
    val v = e.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val isDouble = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      out(i) = if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      i += 1
    }
    out
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val a = readVec(left, input, dimA)
    if (a != null) {
      val b = readVec(right, input, dimB)
      if (b != null) {
        buf(0) += 1.0
        var i = 0
        var o = 1
        while (i < dimA) {
          val ai = a(i)
          var j = 0
          while (j < dimB) { buf(o) += ai * b(j); j += 1; o += 1 }
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
  override def withNewMutableAggBufferOffset(offset: Int): VecOuter =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecOuter =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecOuter =
    copy(left = l, right = r)
  override def prettyName: String = "vec_outer"
}

object VecOuter {

  /** Column-API aggregate: `[n, row-major Σ a_i·b_j]` over the group. */
  def outer(a: Column, b: Column, dimA: Int, dimB: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      VecOuter(
        org.apache.spark.sql.GraftBridge.resolvedExpression(a),
        org.apache.spark.sql.GraftBridge.resolvedExpression(b),
        dimA, dimB).toAggregateExpression())
}
