package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, decoded/feature-extracted in batched partition-local
  * passes.
  *
  * The decode step is a STUB — no image/audio codecs exist in this
  * environment — implemented as a deterministic fake (byte histogram) so
  * the Spark-side contract is real and testable: binary schema, metadata
  * struct, batch shape (fixed-size batches inside mapPartitions, the JVM
  * analogue of a Pandas-UDF batch), and decode-cost partitioning.
  *
  * Scale notes: feature extraction is embarrassingly parallel; the only
  * planning decision is spreading decode cost evenly — `repartitionForDecode`
  * hashes on the id so skewed upstream layouts (e.g. one parquet file per
  * crawl host) don't serialize decoding on a few tasks.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("source", StringType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap a text corpus as binary media rows (demo source: UTF-8 bytes). */
  def fromDocuments(docs: DataFrame, modality: String = "image"): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit(modality).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col("text")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** Hash-repartition so decode cost spreads evenly across executors. */
  def repartitionForDecode(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions, col("media_id"))

  val featureDim = 16

  /** STUB decoder: deterministic 16-bin byte histogram, L1-normalized.
    * A real deployment swaps this one function for the codec call (JNI,
    * ONNX runtime, subprocess); everything around it is unchanged. */
  private[operators] def decodeBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
    batch.map { bytes =>
      val hist = new Array[Float](featureDim)
      if (bytes != null) {
        bytes.foreach(b => hist((b & 0xff) % featureDim) += 1f)
        val total = bytes.length.max(1)
        var i = 0
        while (i < featureDim) { hist(i) /= total; i += 1 }
      }
      hist
    }

  /** Batched partition-local feature extraction. Rows are processed in
    * fixed-size batches (the Arrow-batch shape a Pandas UDF would see) so a
    * real decoder can amortize model/codec setup per batch. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "modality", "content").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = decodeBatch(batch.map(_.getAs[Array[Byte]]("content")).toSeq)
        batch.lazyZip(feats).map { (r, f) =>
          Row(r.getLong(0), r.getString(1), f.toSeq)
        }
      }
    }(encoder)
  }

  /** STUB resize: stride-sample the payload down to at most `targetBytes`
    * (the byte-level stand-in for image downscaling — a real deployment
    * swaps the kernel for the codec resize; schema, metadata update, and
    * partition-local shape are the contract). Deterministic: byte i of the
    * output is byte floor(i*len/outLen) of the input. */
  private val resizeKernel = udf((bytes: Array[Byte], target: Int) => {
    if (bytes == null || bytes.length <= target) bytes
    else Array.tabulate(target)(i => bytes((i.toLong * bytes.length / target).toInt))
  })

  def resize(media: DataFrame, targetBytes: Int = 64): DataFrame =
    media
      .withColumn("content", resizeKernel(col("content"), lit(targetBytes)))
      .withColumn(
        "meta",
        struct(
          col("meta.mime").as("mime"),
          length(col("content")).cast("long").as("n_bytes"),
          col("meta.source").as("source")))

  /** "Frame sampling" for video-like payloads: split the binary into
    * `frames` evenly-spaced fixed-width slices (stub of keyframe extract;
    * slicing and row-explosion shape are the real contract). */
  def sampleFrames(media: DataFrame, frames: Int = 4, frameBytes: Int = 32): DataFrame =
    media
      .select(
        col("media_id"),
        posexplode(
          transform(sequence(lit(0), lit(frames - 1)), i =>
            substring(
              col("content"),
              (i * greatest(length(col("content")) / frames, lit(1)) + 1).cast("int"),
              lit(frameBytes)))).as(Seq("frame_idx", "frame")))
      .where(length(col("frame")) > 0)
}
