package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Toy "external model" for the MediaEmbedder seam spec: embeds the
  * LOWERCASED letter histogram of the payload (so case variants of one text
  * embed identically) over an 8-dim space; abstains (null) on non-image
  * rows to prove per-row fallback composes with the built-in kernel. A
  * top-level object so the JVM-static call counter survives task
  * serialization (local[*] executors share the JVM). */
object ToyClip extends graft.operators.MediaEmbedder {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  def embed(batch: Seq[(Long, String, Array[Byte])]): Seq[Array[Float]] = {
    calls.incrementAndGet()
    batch.map { case (_, modality, bytes) =>
      if (modality != "image") null
      else {
        val c = new Array[Float](8)
        new String(bytes, "UTF-8").toLowerCase.foreach(ch =>
          if (ch.isLetter) c((ch - 'a') % 8) += 1f)
        val n = math.sqrt(c.map(x => x.toDouble * x).sum).toFloat
        if (n == 0f) c else c.map(_ / n)
      }
    }
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromDocuments(
    Seq((1L, "hello world", "s1"), (2L, "abcabcabc", "s2"))
      .toDF("doc_id", "text", "source"))

  test("fromDocuments produces binary content with typed metadata") {
    val rows = media.orderBy("media_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Array[Byte]]("content").sameElements("hello world".getBytes("UTF-8")))
    val meta = rows(0).getStruct(rows(0).fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") == 11L)
  }

  test("extractFeatures: undecodable payload falls back to the byte histogram, batch shape preserved") {
    val f1 = Multimodal.extractFeatures(media, batchSize = 1).orderBy("media_id").collect()
    val f64 = Multimodal.extractFeatures(media, batchSize = 64).orderBy("media_id").collect()
    assert(f1.length == 2 && f64.length == 2)
    // batch size must not change results
    (f1 zip f64).foreach { case (a, b) =>
      assert(a.getSeq[Float](2) == b.getSeq[Float](2))
    }
    val feats = f1(0).getSeq[Float](2)
    assert(feats.length == Multimodal.featureDim)
    assert(math.abs(feats.sum - 1.0f) < 1e-5) // L1-normalized histogram
  }

  test("repartitionForDecode spreads rows by id hash") {
    val parts = Multimodal.repartitionForDecode(media, 4).rdd.getNumPartitions
    assert(parts == 4)
  }

  test("resize stride-samples content and updates metadata") {
    val r = Multimodal.resize(media, targetBytes = 4).orderBy("media_id").collect()
    val c1 = r(0).getAs[Array[Byte]]("content")
    assert(c1.length == 4)
    // deterministic stride: byte i = input(floor(i*11/4)) -> indices 0,2,5,8
    assert(new String(c1, "UTF-8") == "hl r")
    assert(r(0).getStruct(r(0).fieldIndex("meta")).getAs[Long]("n_bytes") == 4L)
    // short payloads pass through untouched
    val small = Multimodal.resize(media, targetBytes = 1024).orderBy("media_id").collect()
    assert(small(0).getAs[Array[Byte]]("content").length == 11)
  }

  test("decodeGray round-trips the exact pixel matrix through PNG encode/decode") {
    MediaCorpus.allPixels.take(3).foreach { case (_, px) =>
      val png = MediaCorpus.pngOf(px)
      val Some((w, h, decoded)) = Multimodal.decodeGray(png)
      assert(w == MediaCorpus.W && h == MediaCorpus.H)
      assert(decoded.sameElements(px), "lossless PNG round-trip must be exact")
    }
    // undecodable bytes -> None, not an exception
    assert(Multimodal.decodeGray("not a png".getBytes).isEmpty)
    assert(Multimodal.decodeGray(null).isEmpty)
  }

  test("dHash is invariant to exact upscaling (perceptual, not byte, identity)") {
    val (_, px) = MediaCorpus.allPixels.head
    val w = MediaCorpus.W; val h = MediaCorpus.H
    // 2x nearest-neighbor upscale: every grid cell's mean is unchanged
    val up = new Array[Int](w * 2 * h * 2)
    for (y <- 0 until h * 2; x <- 0 until w * 2)
      up(y * w * 2 + x) = px((y / 2) * w + (x / 2))
    assert(Multimodal.dHash(px, w, h) == Multimodal.dHash(up, w * 2, h * 2))
    // aHash uses an 8x8 grid, and 36 % 8 != 0: upscaling re-partitions the
    // near-equal cells, so exact invariance only holds on a divisible
    // geometry — check it on the 32x32 crop (32 % 8 == 0)
    val crop = Array.tabulate(32 * 32)(i => px((i / 32) * w + i % 32))
    val cropUp = new Array[Int](64 * 64)
    for (y <- 0 until 64; x <- 0 until 64)
      cropUp(y * 64 + x) = crop((y / 2) * 32 + (x / 2))
    assert(Multimodal.aHash(crop, 32, 32) == Multimodal.aHash(cropUp, 64, 64))
  }

  test("imageHashes: batch-size invariant; nearDupImages finds exactly the planted pairs") {
    MediaCorpus.ensure(spark)
    val images = spark.read.parquet(MediaCorpus.table)
    val h1 = Multimodal.imageHashes(images, binCol = "png", batchSize = 1)
      .orderBy("media_id").collect()
    val h64 = Multimodal.imageHashes(images, binCol = "png", batchSize = 64)
      .orderBy("media_id").collect()
    assert(h1.length == 48 && (h1 zip h64).forall { case (a, b) => a == b })
    val pairs = Multimodal
      .nearDupImages(Multimodal.imageHashes(images, binCol = "png"), maxDist = 3)
      .orderBy("id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == (0 until 8).map(i => (i.toLong, (40 + i).toLong)),
      s"expected the 8 planted near-dup pairs, got ${pairs.toSeq}")
  }

  test("resizeImages: exact area means, invariant to exact upscaling") {
    MediaCorpus.ensure(spark)
    val images = spark.read.parquet(MediaCorpus.table)
    val out = Multimodal.resizeImages(images, outW = 9, outH = 8, binCol = "png")
      .orderBy("media_id").collect()
    assert(out.length == 48)
    // hand-check one cell of image 0: mean of the top-left 4x4 block
    val (_, px) = MediaCorpus.allPixels.head
    val expected0 =
      (for (y <- 0 until 4; x <- 0 until 4) yield px(y * MediaCorpus.W + x).toLong)
        .sum / 16
    assert(out(0).getSeq[Int](3).head == expected0.toInt)
    // undecodable bytes yield a null matrix, not a crash
    val sp = spark
    import sp.implicits._
    val bad = Multimodal.resizeImages(
      Seq((9L, "junk".getBytes)).toDF("media_id", "png"), 9, 8, binCol = "png").head()
    assert(bad.isNullAt(3))
  }

  test("decodePcm round-trips the exact sample array through WAV encode/decode") {
    AudioCorpus.allSamples.take(3).foreach { case (_, s) =>
      val wav = AudioCorpus.wavOf(s)
      val Some((rate, decoded)) = Multimodal.decodePcm(wav)
      assert(rate == AudioCorpus.Rate)
      assert(decoded.sameElements(s), "lossless PCM round-trip must be exact")
    }
    // undecodable bytes -> None, not an exception
    assert(Multimodal.decodePcm("not a wav".getBytes).isEmpty)
    assert(Multimodal.decodePcm(null).isEmpty)
  }

  test("audioStats: integer features match a hand computation; batch-size invariant") {
    AudioCorpus.ensure(spark)
    val audio = spark.read.parquet(AudioCorpus.table)
    val s1 = Multimodal.audioStats(audio, binCol = "wav", batchSize = 1)
      .orderBy("media_id").collect()
    val s64 = Multimodal.audioStats(audio, binCol = "wav", batchSize = 64)
      .orderBy("media_id").collect()
    assert(s1.length == 48 && s64.length == 48)
    (s1 zip s64).foreach { case (a, b) => assert(a == b) }
    // hand-check clip 0 against the ground-truth samples
    val (_, gt) = AudioCorpus.allSamples.head
    val r = s1(0)
    assert(r.getAs[Long]("n_samples") == gt.length.toLong)
    assert(r.getAs[Int]("peak") == gt.map(math.abs).max)
    assert(r.getAs[Long]("sum_sq") == gt.map(v => v.toLong * v).sum)
    val zc = gt.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
    assert(r.getAs[Long]("zero_cross") == zc.toLong)
    // undecodable bytes yield null features, not a crash
    val sp = spark
    import sp.implicits._
    val bad = Multimodal.audioStats(
      Seq((9L, "junk".getBytes)).toDF("media_id", "wav"), binCol = "wav").head()
    assert(bad.isNullAt(4) && bad.isNullAt(7))
  }

  test("nearDupAudio finds the planted perturbed clips and nothing spurious") {
    AudioCorpus.ensure(spark)
    val stats = Multimodal.audioStats(spark.read.parquet(AudioCorpus.table), binCol = "wav")
    val pairs = Multimodal.nearDupAudio(stats, maxDist = 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val planted = (0 until 8).map(i => (i.toLong, (40 + i).toLong)).toSet
    assert(planted.subsetOf(pairs.toSet),
      s"all 8 planted near-dup pairs must surface, got ${pairs.toSeq}")
    assert(pairs.toSet.subsetOf(planted),
      s"no spurious pairs among independent clips, got ${pairs.toSeq}")
    // and the perturbation must be audible to the fingerprint for at least
    // one pair (true NEAR-duplicates, not only hash-identical copies)
    val dists = Multimodal.nearDupAudio(stats, maxDist = 3).collect().map(_.getLong(2))
    assert(dists.forall(_ <= 3))
  }

  test("resampleAudio: truncated block means, batch-invariant, null on junk") {
    AudioCorpus.ensure(spark)
    val audio = spark.read.parquet(AudioCorpus.table)
    val out = Multimodal.resampleAudio(audio, outN = 32, binCol = "wav")
      .orderBy("media_id").collect()
    assert(out.length == 48)
    // hand-check clip 0, block 0: truncated mean of samples [0, n/32-ish)
    val (_, gt) = AudioCorpus.allSamples.head
    val n = gt.length
    val block0 = gt.zipWithIndex.filter { case (_, i) => i.toLong * 32 / n == 0 }.map(_._1)
    val expected0 = (block0.map(_.toLong).sum / block0.length).toInt
    assert(out(0).getSeq[Int](2).head == expected0)
    val sp = spark
    import sp.implicits._
    val bad = Multimodal.resampleAudio(
      Seq((9L, "junk".getBytes)).toDF("media_id", "wav"), outN = 32, binCol = "wav").head()
    assert(bad.isNullAt(2))
  }

  test("decodeFrames round-trips every exact frame matrix through animated-GIF encode/decode") {
    VideoCorpus.allFrames.take(3).foreach { case (_, fs) =>
      val gif = VideoCorpus.gifOf(fs)
      val Some(decoded) = Multimodal.decodeFrames(gif)
      assert(decoded.size == fs.size)
      (decoded zip fs).foreach { case ((w, h, px), gt) =>
        assert(w == VideoCorpus.W && h == VideoCorpus.H)
        assert(px.sameElements(gt), "palette-indexed GIF round-trip must be exact")
      }
    }
    assert(Multimodal.decodeFrames("not a gif".getBytes).isEmpty)
    assert(Multimodal.decodeFrames(null).isEmpty)
  }

  test("videoFrameHashes: per-frame dHash of ground truth; batch-size invariant") {
    VideoCorpus.ensure(spark)
    val videos = spark.read.parquet(VideoCorpus.table)
    val h1 = Multimodal.videoFrameHashes(videos, binCol = "gif", batchSize = 1)
      .orderBy("media_id", "frame_idx").collect()
    val h16 = Multimodal.videoFrameHashes(videos, binCol = "gif", batchSize = 16)
      .orderBy("media_id", "frame_idx").collect()
    assert(h1.length == 26 * VideoCorpus.F && (h1 zip h16).forall { case (a, b) => a == b })
    // decoded-frame hashes must equal hashes of the ground-truth matrices
    val gt = VideoCorpus.allFrames.flatMap { case (id, fs) =>
      fs.zipWithIndex.map { case (px, f) =>
        (id.toLong, f, Multimodal.dHash(px, VideoCorpus.W, VideoCorpus.H))
      }
    }.sortBy(t => (t._1, t._2))
    (h1 zip gt).foreach { case (r, (id, f, (dh, dl))) =>
      assert(r.getLong(0) == id && r.getInt(1) == f)
      assert(r.getLong(4) == dh && r.getLong(5) == dl)
    }
  }

  test("videoStats + nearDupVideo: temporal fp matches ground truth; pairs = brute force; planted dups surface") {
    VideoCorpus.ensure(spark)
    val videos = spark.read.parquet(VideoCorpus.table)
    val stats = Multimodal.videoStats(videos, binCol = "gif")
    val got = stats.orderBy("media_id").collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    val gtFp = VideoCorpus.allFrames
      .map { case (id, fs) => id.toLong -> Multimodal.temporalFingerprint(fs) }.toMap
    assert(got == gtFp, "decoded temporal fingerprints must equal ground-truth ones")
    // planted duplicates carry their base's energy profile exactly
    (0 until 6).foreach(i => assert(gtFp(i.toLong) == gtFp(20L + i)))
    // operator pairs == brute force over the ground-truth fingerprints
    val brute = (for {
      (a, fa) <- gtFp.toSeq; (b, fb) <- gtFp.toSeq if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } yield (a, b, d.toLong)).sortBy(t => (t._1, t._2))
    val pairs = Multimodal.nearDupVideo(stats, maxDist = 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == brute)
    assert((0 until 6).forall(i => pairs.exists(p => p._1 == i && p._2 == 20 + i)))
  }

  test("sampleFrames explodes evenly-spaced slices") {
    val frames = Multimodal.sampleFrames(media, frames = 2, frameBytes = 4)
      .where(col("media_id") === 1L)
      .orderBy("frame_idx")
      .collect()
    assert(frames.length == 2)
    assert(new String(frames(0).getAs[Array[Byte]]("frame"), "UTF-8") == "hell")
  }

  test("MediaEmbedder seam: an external toy model plugs into extractFeatures and flows through nearDup") {
    val calls = ToyClip.calls
    calls.set(0)
    // corpus: two case-variant near-dups (1,2), one distinct (3), and one
    // audio row (4) that must fall back to the built-in byte histogram
    val docs = Seq(
      (1L, "Hello World Pipeline", "s"), (2L, "hello world pipeline", "s"),
      (3L, "zzzz qqqq vvvv", "s")).toDF("doc_id", "text", "source")
    val m = Multimodal.fromDocuments(docs)
      .unionByName(Multimodal.fromDocuments(
        Seq((4L, "hello world pipeline", "s")).toDF("doc_id", "text", "source"),
        modality = "audio"))
    val feats = Multimodal.extractFeatures(m, batchSize = 2, embedder = Some(ToyClip))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(feats(1).length == 8 && feats(1) == feats(2), "case variants must embed identically")
    assert(feats(4).length == Multimodal.featureDim,
      "abstained row must carry built-in features, not the external dim")
    assert(calls.get() > 0, "the external embed() was never invoked")
    // external embeddings flow through the standard cosine near-dup
    // operator unchanged: (1,2) pair surfaces, 3 pairs with nothing
    val pairs = graft.operators.Similarity.cosineNearDupPairs(
        Multimodal.extractFeatures(
            m.where(col("modality") === "image"), embedder = Some(ToyClip))
          .select(col("media_id").as("vec_id"), col("features").as("embedding")),
        threshold = 0.95, bands = 2, bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected exactly the planted near-dup pair, got $pairs")
  }

  test("nearDupImagesIncremental: fold == whole, transitive blocking, null hashes keep") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def hashes(rows: Seq[(Long, Option[Long], Option[Long])]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (i, h, l) => Row(i, h.map(Long.box).orNull, l.map(Long.box).orNull) }, 1),
        StructType(Seq(
          StructField("media_id", LongType, nullable = false),
          StructField("dhash_hi", LongType, nullable = true),
          StructField("dhash_lo", LongType, nullable = true))))
    // A(0x0), B 3 bits from A, C 3 bits from B but 6 from A — the chain
    // where a kept-only index would wrongly revive C; D far from all;
    // E undecodable (null hashes)
    val all = hashes(Seq(
      (1L, Some(0L), Some(0L)),                     // A
      (2L, Some(0L), Some(7L)),                     // B: dist(A)=3 -> drops vs A
      (3L, Some(0L), Some(0x3FL)),                  // C: dist(B)=3, dist(A)=6 -> drop vs B
      (4L, Some(0x00FF00FFL), Some(0x0F0F0F0FL)),   // D: far from everything -> kept
      (5L, None, None)))                            // E: undecodable -> kept, inert
    val empty = hashes(Seq.empty)
    def keptMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val whole = keptMap(Multimodal.nearDupImagesIncremental(all, empty))
    assert(whole == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L),
      s"whole=$whole")
    // fold over id-ordered batches == whole (the index carries kept AND
    // dropped rows — batch 2's C drops against the DROPPED B)
    val b1 = all.where(col("media_id") <= 2)
    val b2 = all.where(col("media_id") > 2)
    val out1 = Multimodal.nearDupImagesIncremental(b1, empty).localCheckpoint()
    val out2 = Multimodal.nearDupImagesIncremental(
      b2, out1.select("media_id", "dhash_hi", "dhash_lo")).localCheckpoint()
    val folded = keptMap(out1) ++ keptMap(out2)
    assert(folded == whole, s"folded=$folded whole=$whole")
    // a kept-only index would revive C — prove the contract matters
    val keptOnly = Multimodal.nearDupImagesIncremental(
      b2, out1.where(col("kept") === 1).select("media_id", "dhash_hi", "dhash_lo"))
    assert(keptMap(keptOnly)(3L) == 1L,
      "sanity: without the dropped row B in the index, C would wrongly keep")
    // assertOrdered: the fold==whole precondition fails loudly instead of
    // returning silently order-dependent kept flags
    val idx2 = out2.select("media_id", "dhash_hi", "dhash_lo")
    val inOrder = Multimodal.nearDupImagesIncremental(
      b2, out1.select("media_id", "dhash_hi", "dhash_lo"), assertOrdered = true)
    assert(keptMap(inOrder) == keptMap(out2), "in-order batch must pass the guard")
    val exn = intercept[IllegalArgumentException] {
      Multimodal.nearDupImagesIncremental(b1, idx2, assertOrdered = true)
    }
    assert(exn.getMessage.contains("id-ordered"), exn.getMessage)
    // empty index and empty batch are both vacuously ordered
    assert(keptMap(Multimodal.nearDupImagesIncremental(
      all, empty, assertOrdered = true)) == whole)
    assert(Multimodal.nearDupImagesIncremental(
      empty, idx2, assertOrdered = true).count() == 0L)
  }
}
