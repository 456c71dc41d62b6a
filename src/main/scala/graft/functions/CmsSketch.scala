package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native Catalyst
  * aggregate — the mergeable constant-state POINT-FREQUENCY estimator, the
  * third leg of the sketch stool next to KMV (cardinality, [[KmvSketch]])
  * and SON (heavy-hitter identity, TextOps.heavyHitters).
  *
  * Why not exact groupBy counts: an exact frequency table shuffles one row
  * per distinct value — the thing that dies when the value domain is
  * billions of urls/tokens at 100 TB. The CMS state is a fixed depth×width
  * counter matrix (d=4, w=512 → 16 KB) regardless of domain size; update
  * is d counter increments, merge is elementwise addition, so the full
  * corpus folds through Spark's partial aggregation with O(d·w) bytes per
  * group on the shuffle. Estimates are biased UP only (each cell
  * overcounts by colliding values; min over d rows takes the least-damaged
  * cell): est(x) >= true(x), and est(x) <= true(x) + εN with prob 1-δ for
  * w = e/ε, d = ln(1/δ).
  *
  * Engine-portable determinism: row hashes are NOT JVM-private — bucket
  * i of value v is `md5(i || ':' || v)` folded to 60 bits mod width
  * (the [[Funcs.md5Hash60]] domain), computed by the same Column
  * expression the estimator uses, so any engine with md5 rebuilds the
  * identical matrix cell-for-cell (q_profile_cms's DuckDB oracle does).
  *
  * The child must evaluate to the Array[Int] of d bucket indexes — built
  * by [[CmsSketch.buckets]] so the hash definition lives in one place.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && width >= 2, "CMS needs depth >= 1, width >= 2")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < depth) { buf(i * width + arr.getInt(i)) += 1L; i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): CmsSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(nc: Expression): CmsSketch =
    copy(child = nc)
  override def prettyName: String = "cms_sketch"
}

object CmsSketch {

  /** The d seeded bucket indexes of `value`: bucket i = 60-bit md5 of
    * `"i:" || value` mod width. Pure codegen built-ins — the ONE hash
    * definition shared by the sketch update and [[estimate]], and the
    * contract an external replayer follows. NULL values yield a NULL
    * array (concat propagates the null), so update() skips them and
    * estimate() returns NULL — matching KmvSketch's skip-null convention
    * and the SQL replay, where `i || ':' || v` is NULL for NULL v. */
  def buckets(value: Column, depth: Int, width: Int): Column =
    when(value.isNull, lit(null).cast("array<int>"))
      .otherwise(transform(
        sequence(lit(0), lit(depth - 1)),
        i => pmod(
          Funcs.md5Hash60(concat(i.cast("string"), lit(":"), value.cast("string"))),
          lit(width)).cast("int")))

  /** Column-API aggregate: the depth×width counter matrix (row-major
    * Array[Long]) over the group's values. */
  def cms(value: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      CmsSketch(
        org.apache.spark.sql.GraftBridge
          .resolvedExpression(buckets(value, depth, width)),
        depth, width).toAggregateExpression())

  /** Point-frequency estimate of `value` from a sketch column: min over
    * the d cells the value hashes to. Pure built-ins over the same
    * [[buckets]] definition — usable map-side against a broadcast sketch. */
  def estimate(sketch: Column, value: Column, depth: Int, width: Int): Column =
    array_min(transform(
      buckets(value, depth, width),
      (b, i) => element_at(sketch, i * width + b + 1)))

  /** JOIN-SIZE estimate from two sketches over the join key (AMS / CM
    * inner product, Cormode & Muthukrishnan 2005): |A ⋈ B| = Σ_k
    * f_A(k)·f_B(k), estimated as min over depth of the row-wise inner
    * product Σ_w A[d][w]·B[d][w] — collisions only ADD, so like
    * [[estimate]] it overcounts, never undercounts. The pre-shuffle
    * optimizer statistic at 100 TB: both sides sketch in one pass each
    * (O(d·w) state), and the estimate prices the join BEFORE any shuffle
    * of either table. Integer arithmetic end-to-end. */
  def joinSizeEstimate(skA: Column, skB: Column, depth: Int, width: Int): Column = {
    // DECIMAL(38,0) accumulation: the true inner product is bounded by
    // |A|·|B| — two 10^10-row sides already exceed Long range (~9.2e18),
    // and a wrapped negative sum would invert the overcount-only
    // guarantee exactly at the scale this statistic exists for. Decimal
    // keeps every cell product and the row sum exact to 38 digits.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    array_min(transform(
      sequence(lit(0), lit(depth - 1)),
      d =>
        aggregate(
          zip_with(
            slice(skA, d * width + 1, lit(width)),
            slice(skB, d * width + 1, lit(width)),
            (a, b) => a.cast(dec) * b.cast(dec)),
          lit(0L).cast(dec),
          (acc, x) => acc + x)))
  }
}
