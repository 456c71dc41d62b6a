package graft

import graft.ingest.UpsertWriter
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The incremental-rewrite economics of the bucketed store: an upsert
  * batch rewrites ONLY the id-hash buckets it touches (file-level
  * assertion), a schema-evolving batch migrates the whole table once, and
  * per-bucket merge output is identical to the global merge. */
class UpsertBucketSpec extends SparkSpec {

  /** (relative file path -> last-modified) for every data file under a
    * table dir, grouped by bucket subdirectory. */
  private def filesByBucket(table: Path): Map[String, Map[String, Long]] = {
    val s = Files.walk(table)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toSeq
      .groupBy(p => table.relativize(p).getName(0).toString)
      .map { case (b, ps) =>
        b -> ps.map(p => table.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis).toMap
      }
    finally s.close()
  }

  private def df(rows: Seq[(String, String, Long)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("id", "name", "number_observed")
  }

  test("single-id upsert rewrites exactly one bucket; all others byte-stable") {
    val dir = Files.createTempDirectory("graft-bucket").toString
    val table = java.nio.file.Paths.get(dir, "t.parquet")
    // seed enough ids to populate many buckets
    UpsertWriter.upsert(spark, dir, "t",
      df((0 until 200).map(i => (s"id-$i", s"n$i", 1L))))
    val before = filesByBucket(table)
    assert(before.size > 4, s"expected many buckets, got ${before.keySet}")

    UpsertWriter.upsert(spark, dir, "t", df(Seq(("id-7", "renamed", 2L))))
    val after = filesByBucket(table)
    val expectedBucket = spark.range(1)
      .select(pmod(hash(lit("id-7")), lit(UpsertWriter.DefaultBuckets)))
      .head().getInt(0).toString
    val changed = (before.keySet ++ after.keySet).filter(b => before.get(b) != after.get(b))
    assert(changed == Set(s"__bucket=$expectedBucket"),
      s"expected only bucket $expectedBucket to change, got $changed")

    // merge semantics across the bucket boundary: newest-non-null + SUM
    val merged = UpsertWriter.readTable(spark, dir, "t")
      .where(col("id") === "id-7").head()
    assert(merged.getAs[String]("name") == "renamed")
    assert(merged.getAs[Long]("number_observed") == 3L)
    // untouched row unchanged
    assert(UpsertWriter.readTable(spark, dir, "t")
      .where(col("id") === "id-9").head().getAs[String]("name") == "n9")
    graft.ingest.FsUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("incremental merge's old-side scan is partition-pruned to touched buckets") {
    val dir = Files.createTempDirectory("graft-bucket-prune").toString
    UpsertWriter.upsert(spark, dir, "t",
      df((0 until 200).map(i => (s"id-$i", s"n$i", 1L))))
    // the same pruned read the incremental path plans: only the touched
    // bucket's files are listed (PartitionFilters on __bucket, and the
    // scan's partition count collapses to the touched set)
    val pruned = spark.read.parquet(s"$dir/t.parquet")
      .where(col("__bucket").isin(3, 5))
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in pruned plan"))
    assert(scan.partitionFilters.nonEmpty, "expected partition filters on __bucket")
    val scanned = scan.selectedPartitions.partitionCount
    assert(scanned == 2, s"expected 2 pruned partitions, scanned $scanned")
    graft.ingest.FsUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("schema-evolving batch rewrites all buckets once, keeping them uniform") {
    val dir = Files.createTempDirectory("graft-bucket-schema").toString
    UpsertWriter.upsert(spark, dir, "t",
      df((0 until 50).map(i => (s"id-$i", s"n$i", 1L))))
    val sp = spark
    import sp.implicits._
    UpsertWriter.upsert(spark, dir, "t",
      Seq(("id-1", "x")).toDF("id", "added"))
    val out = UpsertWriter.readTable(spark, dir, "t")
    // every bucket's files carry the evolved schema (a uniform-schema glob
    // read succeeds and surfaces the new column everywhere)
    assert(out.columns.toSet == Set("id", "name", "number_observed", "added"))
    assert(out.where(col("id") === "id-1").head().getAs[String]("added") == "x")
    assert(out.where(col("added").isNotNull).count() == 1)
    assert(out.count() == 50)
    graft.ingest.FsUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("appendDistinct/appendKeyedFirst bucket on their dedup keys (global dedup holds)") {
    val dir = Files.createTempDirectory("graft-bucket-edges").toString
    val sp = spark
    import sp.implicits._
    val e1 = (0 until 100).map(i => (s"s-$i", s"t-$i")).toDF("source_ref", "target_ref")
    UpsertWriter.appendDistinct(spark, dir, "__contains", e1)
    // re-appending the same edges (any partitioning) must not duplicate
    UpsertWriter.appendDistinct(spark, dir, "__contains", e1.repartition(7))
    assert(UpsertWriter.readTable(spark, dir, "__contains").count() == 100)

    val m1 = Seq(("url", "value", "str")).toDF("otype", "path", "dtype")
    UpsertWriter.appendKeyedFirst(spark, dir, "__columns", m1, Seq("otype", "path"))
    // a conflicting later sighting of the same key must not add a row
    val m2 = Seq(("url", "value", "int"), ("url", "other", "int"))
      .toDF("otype", "path", "dtype")
    UpsertWriter.appendKeyedFirst(spark, dir, "__columns", m2, Seq("otype", "path"))
    val cols = UpsertWriter.readTable(spark, dir, "__columns").collect()
      .map(r => (r.getAs[String]("path"), r.getAs[String]("dtype"))).toMap
    assert(cols == Map("value" -> "str", "other" -> "int"))
    graft.ingest.FsUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("appendDistinct: coercible-type and subset-column batches neither lose rows nor crash") {
    val dir = Files.createTempDirectory("graft-bucket-coerce").toString
    val sp = spark
    import sp.implicits._
    // stored schema: (k string, w double, extra string)
    UpsertWriter.appendDistinct(spark, dir, "e",
      Seq(("a", 1.5, "x"), ("b", 2.0, "y")).toDF("k", "w", "extra"))
    // batch 2: w arrives as LONG (coerces to the stored double) — the
    // bucket hash must be computed on the coerced value or the row lands
    // outside the touched set and is silently dropped
    UpsertWriter.appendDistinct(spark, dir, "e",
      Seq(("c", 3L, "z")).toDF("k", "w", "extra"))
    // batch 3: subset of the stored columns (no `extra`)
    UpsertWriter.appendDistinct(spark, dir, "e",
      Seq(("d", 4.0)).toDF("k", "w"))
    val out = UpsertWriter.readTable(spark, dir, "e")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Double]("w"),
        r.getAs[String]("extra"))).toSet
    assert(out == Set(("a", 1.5, "x"), ("b", 2.0, "y"), ("c", 3.0, "z"), ("d", 4.0, null)))
    // and re-appending the coerced row stays deduped
    UpsertWriter.appendDistinct(spark, dir, "e",
      Seq(("c", 3L, "z")).toDF("k", "w", "extra"))
    assert(UpsertWriter.readTable(spark, dir, "e").count() == 4)
    graft.ingest.FsUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("a data column named __bucket is rejected, not silently clobbered") {
    val dir = Files.createTempDirectory("graft-bucket-reserved").toString
    val sp = spark
    import sp.implicits._
    intercept[IllegalArgumentException] {
      UpsertWriter.upsert(spark, dir, "t",
        Seq(("a", 1)).toDF("id", "__bucket"))
    }
    // Spark resolves columns case-insensitively by default, so any casing
    // of the reserved name must be rejected too
    intercept[IllegalArgumentException] {
      UpsertWriter.upsert(spark, dir, "t",
        Seq(("a", 1)).toDF("id", "__Bucket"))
    }
    graft.ingest.FsUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("upsert with a coercing id type (long batch into double-id table) hashes aligned") {
    val dir = Files.createTempDirectory("graft-bucket-upsert-coerce").toString
    val sp = spark
    import sp.implicits._
    UpsertWriter.upsert(spark, dir, "n",
      (0 until 40).map(i => (i.toDouble, s"v$i")).toDF("id", "v"))
    // longs coerce to the stored double ids: one new id, one merging update
    UpsertWriter.upsert(spark, dir, "n",
      Seq((100L, "new"), (7L, "updated")).toDF("id", "v"))
    val out = UpsertWriter.readTable(spark, dir, "n")
    assert(out.count() == 41)
    assert(out.where(col("id") === 7.0).head().getAs[String]("v") == "updated")
    assert(out.where(col("id") === 100.0).head().getAs[String]("v") == "new")
    graft.ingest.FsUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("insertIgnore keeps stored rows and rewrites only touched buckets") {
    val dir = Files.createTempDirectory("graft-bucket-ii").toString
    val table = java.nio.file.Paths.get(dir, "o.parquet")
    UpsertWriter.insertIgnore(spark, dir, "o",
      df((0 until 100).map(i => (s"od-$i", s"n$i", 1L))))
    val before = filesByBucket(table)
    UpsertWriter.insertIgnore(spark, dir, "o",
      df(Seq(("od-3", "CLOBBER", 99L), ("od-new", "new", 1L))))
    val after = filesByBucket(table)
    val changed = (before.keySet ++ after.keySet).filter(b => before.get(b) != after.get(b))
    assert(changed.size <= 2, s"at most the two touched buckets may change, got $changed")
    val out = UpsertWriter.readTable(spark, dir, "o")
    assert(out.where(col("id") === "od-3").head().getAs[String]("name") == "n3") // ignored
    assert(out.where(col("id") === "od-new").count() == 1)
    graft.ingest.FsUtil.deleteTree(java.nio.file.Paths.get(dir))
  }
}
