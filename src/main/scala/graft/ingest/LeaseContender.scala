package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** One writer PROCESS in the cross-JVM lease-contention proof — spawned as
  * a separate `java` process by MultiProcessLeaseSpec so that the advisory
  * lease is exercised where it actually matters: between OS processes that
  * share nothing but the filesystem (no JVM-wide `processToken`, no shared
  * `heldLeases` ThreadLocal, no common scheduler).
  *
  * Each batch does two lease-serialized things:
  *  1. an `upsert` of a writer-unique id range PLUS a contended shared id
  *     range into one table — lost rows here mean the publish protocol
  *     interleaved;
  *  2. a deliberately non-atomic read-sleep-increment of a plain text
  *     counter file inside `withTableLease` on the SAME table path — the
  *     classic lost-update detector. After W writers × B batches the
  *     counter reads W·B iff at most one process ever held the lease at a
  *     time; any overlap loses an increment.
  *
  * Exits 0 and writes `done-<writerId>` on success so the spawning spec can
  * distinguish a wedged child from a slow one. */
object LeaseContender {
  def main(args: Array[String]): Unit = {
    val (dir, writerId, nBatchesS, perBatchS) = (args(0), args(1), args(2), args(3))
    // optional 5th arg "s3": contend through OBJECT-STORE semantics
    // (S3SimTableFs — copy+delete moves, conditional-PUT createNew), so
    // mutual exclusion is proven cross-PROCESS on the store mapping too,
    // not just on POSIX renames
    if (args.length > 4 && args(4) == "s3") UpsertWriter.fs = S3SimTableFs
    val nBatches = nBatchesS.toInt
    val perBatch = perBatchS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-lease-contender-$writerId")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try contend(spark, dir, writerId, nBatches, perBatch)
    finally spark.stop()
  }

  /** One writer's verb sequence — also callable in-process so the spawning
    * test JVM can be the third contender. */
  def contend(
      spark: SparkSession, dir: String, writerId: String,
      nBatches: Int, perBatch: Int): Unit = {
    import spark.implicits._
    val tablePath = Paths.get(dir, "t.parquet")
    val counter = Paths.get(dir, "counter.txt")
    (0 until nBatches).foreach { b =>
      val rows =
        (0 until perBatch).map(i => (s"$writerId-$b-$i", writerId, b.toLong)) ++
          (0 until 4).map(i => (s"shared-$i", writerId, b.toLong))
      UpsertWriter.upsert(spark, dir, "t", rows.toDF("id", "name", "v"), numBuckets = 4)
      UpsertWriter.withTableLease(tablePath) {
        val cur =
          if (Files.exists(counter))
            new String(Files.readAllBytes(counter), "UTF-8").trim.toLong
          else 0L
        Thread.sleep(5L) // widen the lost-update window
        Files.write(counter, (cur + 1).toString.getBytes("UTF-8"))
        ()
      }
    }
    Files.write(Paths.get(dir, s"done-$writerId"), "ok".getBytes("UTF-8"))
    ()
  }
}
