package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** PER-GROUP uniform row sample as a native aggregate: the k rows whose
  * 60-bit id hash is smallest, carried as (hash, value) pairs in O(k)
  * mergeable state — [[graft.operators.Profile.sampleQuantiles]]'s
  * bottom-k-by-hash draw made GROUPABLE. The global version rides
  * TakeOrdered; inside a groupBy only an aggregate can bound state, and
  * this one keeps every group's buffer at k pairs through the partial-agg
  * shuffle however large the group is — per-group quantiles at 100 TB
  * without sorting any group.
  *
  * Determinism/replay contract: the sample is the k smallest DISTINCT
  * (hash, value) pairs (set semantics — id hashes are effectively unique,
  * so a dropped duplicate means the same row counted once); an external
  * engine re-draws it as DISTINCT (hash, value) ORDER BY hash, value
  * LIMIT k per group (q_profile_group_quantiles). eval returns the
  * sample's VALUES sorted ascending, ready for discrete quantile
  * indexing.
  *
  * The child must evaluate to struct(hash: LONG, value: DOUBLE) — callers
  * go through [[BottomKSample.bottomKByHash]] so the hash definition
  * stays [[Funcs.md5Hash60]].
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    emitPairs: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Double)]]
  with UnaryLike[Expression] {

  require(k >= 2, "need a sample of at least 2")

  private def ord: Ordering[(Long, Double)] = Ordering.Tuple2[Long, Double]

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Double)] =
    new java.util.TreeSet[(Long, Double)](ord)

  override def update(
      buf: java.util.TreeSet[(Long, Double)],
      input: InternalRow): java.util.TreeSet[(Long, Double)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        buf.add((row.getLong(0), row.getDouble(1)))
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Long, Double)],
      other: java.util.TreeSet[(Long, Double)]): java.util.TreeSet[(Long, Double)] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Double)]): Any =
    if (emitPairs) {
      // (hash, value) pairs in hash order — the RESUMABLE face: a frame
      // carrying pairs can union+trim with another frame's pairs and the
      // result is the combined population's exact bottom-k (min-k of a
      // set union is associative, commutative, and order-free)
      val out = new Array[Any](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) {
        val (h, v) = it.next()
        out(i) = InternalRow(h, v)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      val arr = new Array[Double](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next()._2; i += 1 }
      java.util.Arrays.sort(arr)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }

  override def serialize(buf: java.util.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (h, v) = it.next(); bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Double)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[(Long, Double)](ord)
    var i = 0
    while (i < n) { s.add((bb.getLong, bb.getDouble)); i += 1 }
    s
  }

  override def dataType: DataType =
    if (emitPairs)
      ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("v", DoubleType, nullable = false))),
        containsNull = false)
    else ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): BottomKSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSample =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(nc: Expression): BottomKSample =
    copy(child = nc)
  override def prettyName: String = "bottom_k_sample"
}

object BottomKSample {
  import org.apache.spark.sql.functions._

  /** Column-API entry: the group's k-smallest-by-id-hash sample of
    * `value`, as an ascending double array. */
  def bottomKByHash(value: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BottomKSample(
        org.apache.spark.sql.GraftBridge.resolvedExpression(
          struct(Funcs.md5Hash60(id).as("h"), value.cast("double").as("v"))),
        k).toAggregateExpression())

  /** Column-API entry, pair-emitting: the group's bottom-k sample as
    * array<struct<h, v>> in hash order — the mergeable state itself, for
    * frames (Profile.statsOf) that carry the sample across batches and
    * union+trim it without revisiting rows. */
  def bottomKPairsByHash(value: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BottomKSample(
        org.apache.spark.sql.GraftBridge.resolvedExpression(
          struct(Funcs.md5Hash60(id).as("h"), value.cast("double").as("v"))),
        k, emitPairs = true).toAggregateExpression())
}
