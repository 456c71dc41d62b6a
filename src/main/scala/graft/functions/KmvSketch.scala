package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the mergeable constant-state cardinality estimator
  * (Bar-Yossef et al. 2002; the theta-sketch family's core).
  *
  * Why not count_distinct / approx_count_distinct: exact distinct shuffles
  * every distinct value (the thing that dies at 100 TB), and Spark's HLL++
  * cannot be replayed by another engine for verification. KMV with an md5
  * hash domain is BOTH constant-state-mergeable (update: insert into a
  * k-bounded ordered set; merge: set union, trim to k — O(k) bytes per
  * group flowing through the partial-aggregation shuffle, regardless of
  * group size) AND deterministically replayable by any engine with md5:
  * the estimate is a pure function of the k smallest distinct 60-bit
  * hashes (q_profile_kmv's DuckDB oracle recomputes it exactly).
  *
  * Estimator: with S = the k smallest distinct hash values of the group
  * (uniform on [0, 2^60) by the hash assumption),
  *   |S| < k  -> |S| (the sketch holds every distinct hash: exact);
  *   |S| = k  -> (k-1) * 2^60 / max(S)  (the classic unbiased KMV form).
  * All doubles derive from exactly-representable integers via IEEE
  * round-to-nearest, so any engine computes the identical bits.
  *
  * The child must evaluate to the 60-bit hash (LongType) — callers hash
  * with [[Funcs.md5Hash60]] so the hash definition lives in one place.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "KMV needs k >= 2")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * 1152921504606846976.0 / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(nc: Expression): KmvSketch =
    copy(child = nc)
  override def prettyName: String = "kmv_distinct"
}

object KmvSketch {
  /** Column-API entry point: estimated distinct count of `value` with a
    * k-minimum-values sketch over the 60-bit md5 hash domain. */
  def kmvDistinct(value: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      KmvSketch(
        org.apache.spark.sql.GraftBridge
          .resolvedExpression(Funcs.md5Hash60(value)),
        k).toAggregateExpression())

  /** The sketch ITSELF (ascending array of the k smallest distinct 60-bit
    * hashes) instead of the point estimate — the form set algebra needs:
    * two groups' sketches union+trim to the union's sketch, and the KMV
    * intersection estimator reads shared hashes out of that union
    * ([[graft.operators.Profile.sketchOverlap]]). Same O(k) mergeable
    * state as [[kmvDistinct]]. */
  def kmvHashes(value: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      KmvHashes(
        org.apache.spark.sql.GraftBridge
          .resolvedExpression(Funcs.md5Hash60(value)),
        k).toAggregateExpression())
}

/** [[KmvSketch]]'s buffer exposed as its value: the ascending array of the
  * k smallest distinct hashes. Kept as a separate node so each aggregate
  * has a stable SQL name and return type. */
case class KmvHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "KMV needs k >= 2")

  private val inner = KmvSketch(child, k)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    inner.createAggregationBuffer()
  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = inner.update(buf, input)
  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    inner.merge(buf, other)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    inner.deserialize(bytes)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): KmvHashes =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvHashes =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(nc: Expression): KmvHashes =
    copy(child = nc)
  override def prettyName: String = "kmv_hashes"
}
