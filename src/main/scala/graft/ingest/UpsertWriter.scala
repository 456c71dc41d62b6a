package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Dynamic-schema DataFrame construction + merge-upsert onto Parquet.
  *
  * Merge rule (the system-wide upsert semantics, firepit/sqlstorage.py:
  * 367-380): per id, first_observed = MIN, last_observed = MAX,
  * number_observed = SUM, every other column = newest non-null value
  * (null never clobbers — reference tests/test_null.py). Within one batch,
  * later records win (splitter.py:161-187); across batches, the incoming
  * batch wins over stored rows.
  *
  * Implemented as one distributed groupBy(id): the newest-non-null rule is
  * `max(struct(seq, col))` over rows where col is non-null — an ordinary
  * codegen'd aggregate, no window, no collect. Schema evolution is
  * unionByName(allowMissingColumns). Storage is copy-on-write Parquet
  * (write temp, swap), the Spark analogue of the reference's view-rewrite
  * copy-on-write; at 100 TB the same merge runs per id-hash partition so
  * only affected files rewrite.
  */
object UpsertWriter {

  /** Infer a column type from observed values (firepit infer_type analogue,
    * sqlstorage.py:89-104): Long/Double/Boolean kept native; primitive
    * lists -> array<string>; dict/mixed lists -> JSON text (the reference
    * stores ALL lists as JSON text; we keep arrays queryable). */
  def rowsToDF(spark: SparkSession, rows: Seq[Map[String, Any]]): DataFrame = {
    val cols = rows.flatMap(_.keys).distinct.sorted
    def typeOf(values: Seq[Any]): DataType = {
      val nn = values.filter(_ != null)
      if (nn.isEmpty) StringType
      else if (nn.forall(_.isInstanceOf[Boolean])) BooleanType
      else if (nn.forall(_.isInstanceOf[Long])) LongType
      else if (nn.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double])) DoubleType
      // collection.Seq, not immutable.Seq: Row.toSeq yields mutable
      // ArraySeq for array columns (reassign round-trips)
      else if (nn.forall(_.isInstanceOf[collection.Seq[_]])) {
        if (nn.forall(_.asInstanceOf[collection.Seq[_]].forall(e =>
            !e.isInstanceOf[collection.Map[_, _]] && !e.isInstanceOf[collection.Seq[_]])))
          ArrayType(StringType)
        else StringType // JSON-encoded (struct lists, e.g. registry values)
      } else StringType
    }
    val types = cols.map(c => c -> typeOf(rows.flatMap(_.get(c)))).toMap
    val schema = StructType(cols.map(c => StructField(c, types(c), nullable = true)))
    def conv(v: Any, t: DataType): Any = (v, t) match {
      case (null, _)                  => null
      case (x: Long, DoubleType)      => x.toDouble
      case (x: collection.Seq[_], ArrayType(StringType, _)) =>
        x.toSeq.map(e => if (e == null) null else e.toString)
      case (x: collection.Seq[_], StringType) => graft.model.StixId.canonicalJson(x.toSeq)
      case (x: collection.Map[_, _], StringType) => graft.model.StixId.canonicalJson(x)
      case (x, StringType)            => x.toString
      case (x, _)                     => x
    }
    val data = rows.map(r => Row.fromSeq(cols.map(c => conv(r.getOrElse(c, null), types(c)))))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }

  private def pathOf(dir: String, table: String): Path = Paths.get(dir, s"$table.parquet")

  def exists(dir: String, table: String): Boolean = Files.exists(pathOf(dir, table))

  def tables(dir: String): Seq[String] =
    if (!Files.exists(Paths.get(dir))) Nil
    else
      Files.list(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".parquet"))
        .map(_.stripSuffix(".parquet"))
        .toSeq.sorted

  /** Merge-upsert `incoming` into `dir/table.parquet` by `id`. */
  def upsert(spark: SparkSession, dir: String, table: String, incoming: DataFrame): Unit = {
    val p = pathOf(dir, table)
    val merged =
      if (!Files.exists(p)) mergeById(incoming.withColumn("__seq", monotonically_increasing_id()))
      else {
        val old = spark.read.parquet(p.toString).withColumn("__seq", lit(-1L))
        val nw = incoming.withColumn("__seq", monotonically_increasing_id())
        mergeById(old.unionByName(nw, allowMissingColumns = true))
      }
    writeSwap(merged, p)
  }

  /** Insert-or-ignore upsert (observed-data rows, sqlstorage.py:389-392):
    * existing ids keep their stored row untouched. */
  def insertIgnore(spark: SparkSession, dir: String, table: String, incoming: DataFrame): Unit = {
    val p = pathOf(dir, table)
    val dedupedNew = incoming.dropDuplicates("id")
    val merged =
      if (!Files.exists(p)) dedupedNew
      else {
        val old = spark.read.parquet(p.toString)
        val fresh = dedupedNew.join(old.select("id"), Seq("id"), "left_anti")
        old.unionByName(fresh, allowMissingColumns = true)
      }
    writeSwap(merged, p)
  }

  /** Append with full-row dedup (edge/provenance tables without ids). */
  def appendDistinct(spark: SparkSession, dir: String, table: String, incoming: DataFrame): Unit = {
    val p = pathOf(dir, table)
    val merged =
      if (!Files.exists(p)) incoming.distinct()
      else spark.read.parquet(p.toString).unionByName(incoming, allowMissingColumns = true).distinct()
    writeSwap(merged, p)
  }

  /** Append only rows whose key tuple isn't already stored — first sighting
    * wins, the __columns metadata contract (the reference records a column's
    * dtype once, at its new-column hook; a later conflicting sighting must
    * not add a second row). Callers pass a batch already deduped by key. */
  def appendKeyedFirst(
      spark: SparkSession, dir: String, table: String,
      incoming: DataFrame, keys: Seq[String]): Unit = {
    val p = pathOf(dir, table)
    val merged =
      if (!Files.exists(p)) incoming
      else {
        val existing = spark.read.parquet(p.toString)
        existing.unionByName(
          incoming.join(
            existing.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct(),
            keys, "left_anti"),
          allowMissingColumns = true)
      }
    writeSwap(merged, p)
  }

  private def mergeById(df: DataFrame): DataFrame = {
    val dataCols = df.columns.filterNot(c => c == "id" || c == "__seq")
    // an SCO can be ALL reference lists (e.g. x-oca-asset with only
    // ip_refs/mac_refs): after reflist extraction its table is just ids
    if (dataCols.isEmpty) return df.select("id").distinct()
    // backtick-quoted refs: flattened STIX columns contain literal dots and
    // quotes (hashes.'SHA-1')
    def bq(c: String) = col(s"`$c`")
    val aggs = dataCols.map { c =>
      c match {
        case "first_observed"  => min(bq(c)).as(c)
        case "last_observed"   => max(bq(c)).as(c)
        case "number_observed" => sum(bq(c)).as(c)
        case _ =>
          // newest non-null: max over (seq, value) structs of non-null rows
          max(when(bq(c).isNotNull, struct(col("__seq").as("s"), bq(c).as("v"))))
            .getField("v").as(c)
      }
    }
    df.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** Copy-on-write: write to a temp dir, then swap into place (Parquet has
    * no in-place update; same pattern the reference uses for view rewrite).
    */
  private def writeSwap(df: DataFrame, target: Path): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (Files.exists(target)) deleteRecursively(target)
    Files.move(tmp, target)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
