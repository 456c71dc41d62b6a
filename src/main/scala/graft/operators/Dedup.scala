package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus pipelines: exact, MinHash+LSH,
  * n-gram Jaccard verification, and SimHash with pigeonhole blocking.
  *
  * Scale design (the point of every choice here):
  *  - All signatures are computed map-side from codegen'd array expressions —
  *    one narrow pass over the corpus, no UDFs, no shuffle.
  *  - Candidate generation NEVER does an all-pairs join. MinHash pairs come
  *    from an equi-join on (band_idx, band_hash) — a shuffle keyed on the
  *    band hash whose per-key groups are tiny; SimHash pairs come from an
  *    equi-join on 8-bit signature blocks (pigeonhole: hamming <= 3 over 4
  *    blocks implies one identical block). Both stay equi-joins so Catalyst
  *    can shuffle-hash them, and both scale linearly in corpus size.
  *  - Exact verification (Jaccard / hamming) runs only on the candidate set.
  *
  * Hash function: md5 hex strings with lexicographic MIN — deterministic and
  * engine-independent (any engine's md5 renders identically), unlike
  * xxhash/murmur whose seeds differ across systems.
  */
object Dedup {

  /** Word 3-gram shingles of the normalized text (whole text when < 3
    * tokens). Built with SQL higher-order functions; stays in codegen. */
  def shingles(text: Column): Column = {
    val toks = TextOps.tokens(text)
    when(
      size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i => concat_ws(" ", slice(toks, i, lit(3)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Repartition a small-partition-count input so the expensive map-side
    * signature pass uses every core: a corpus read from a few files arrives
    * in a few partitions, and the interpreted higher-order folds would
    * otherwise serialize on them. At cluster scale the input already has
    * thousands of partitions and this is a cheap no-op-ish rebalance. */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Modulus for the affine hash family (2^31 - 1, prime). */
  val HashP = 2147483647L

  // ---- compiled signature kernels ----------------------------------------
  // These per-row computations are the hot map-side pass of corpus dedup.
  // Expressed as Catalyst higher-order functions they do NOT enter
  // whole-stage codegen and run interpreted (measured ~50x slower, with the
  // optimizer additionally inlining them into every consumer); a compiled
  // Scala function is the next rung down the preference ladder (native
  // Expression > Scala UDF > rest) and keeps the exact same engine-portable
  // semantics: md5 hex -> 60-bit int -> affine hash family mod 2^31-1.

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  private def normTokens(text: String): Array[String] =
    if (text == null) Array.empty
    else text.replaceAll("\\s+", " ").trim.toLowerCase(java.util.Locale.ROOT)
      .split(' ').filter(_.nonEmpty)

  /** md5 of each word n-gram — the compiled mirror of
    * TextOps.ngramHashes (same normalization, same hex; parity pinned by
    * PipelineOpsSpec). */
  private[graft] def ngramMd5Strings(text: String, n: Int): Array[String] = {
    val toks = normTokens(text)
    if (toks.length < n) Array.empty
    else Array.tabulate(toks.length - n + 1)(i => md5Hex(toks.slice(i, i + n).mkString(" ")))
  }

  private val ngramMd5Udf =
    org.apache.spark.sql.functions.udf((text: String, n: Int) => ngramMd5Strings(text, n))

  private def shingleStrings(text: String): Array[String] = {
    val toks = normTokens(text)
    if (toks.length >= 3) Array.tabulate(toks.length - 2)(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
    else Array(toks.mkString(" "))
  }

  /** k-element MinHash signature: sig[i] = min over shingles of
    * ((a_i * (h mod p)) mod p + b_i) mod p, where h = first 15 md5 hex
    * digits of the shingle as a 60-bit int, a_i = ((i+1)*1103515245) mod p,
    * b_i = i*12345 + 1, p = 2^31-1. One md5 per shingle. */
  private[operators] def minhashSig(text: String, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    shingleStrings(text).foreach { s =>
      val h = java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16) % HashP
      var i = 0
      while (i < k) {
        val a = ((i + 1).toLong * 1103515245L) % HashP
        val v = ((a * h) % HashP + (i.toLong * 12345L + 1L)) % HashP
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  private def minhashUdf(k: Int) = udf((text: String) => minhashSig(text, k))

  /** Winnowing document fingerprints (the rolling-hash scheme of MOSS):
    * hash every word 3-gram, slide a window of `w` consecutive gram hashes,
    * keep each window's minimum — a deterministic, position-robust
    * fingerprint SET whose density is ~2/(w+1) of the grams. Texts sharing
    * a long-enough passage share fingerprints regardless of where the
    * passage sits. Same engine-portable hash family as minhash (md5 60-bit
    * -> mod 2^31-1). */
  private[operators] def winnowKernel(text: String, w: Int): Array[Long] = {
    val hs = shingleStrings(text)
      .map(s => java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16) % HashP)
    if (hs.isEmpty) Array.empty
    else if (hs.length <= w) Array(hs.min)
    else (0 to hs.length - w).map(i => {
      var m = Long.MaxValue
      var j = i
      while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
      m
    }).distinct.sorted.toArray
  }

  def winnowFingerprints(docs: DataFrame, textCol: String = "text", w: Int = 4): DataFrame = {
    val kernel = udf((text: String) => winnowKernel(text, w))
    spread(docs).select(col("doc_id"), explode(kernel(col(textCol))).as("fingerprint"))
  }

  /** EXACT shingle Jaccard >= `minJaccard` — the ground truth LSH is
    * measured against, free of LSH's own candidate restriction. Requires
    * minJaccard > 0, which makes the EQUI-JOIN formulation exact: a pair
    * with positive Jaccard shares at least one shingle, so generating
    * candidates from shared shingles (one (doc, shingle) equi-join +
    * per-pair shared counts) loses nothing, and the zero-overlap pairs it
    * skips were excluded anyway. Logically all-pairs truth, physically
    * never a cross join — docs meet only where they share a shingle.
    * Still quadratic in the worst case (every doc sharing every shingle);
    * run it on a content-hash SAMPLE of the corpus, never the corpus. */
  def exactJaccardPairs(
      docs: DataFrame,
      minJaccard: Double = 0.5,
      textCol: String = "text"): DataFrame = {
    require(minJaccard > 0.0, "equi-join truth needs a positive threshold")
    // pinned: the exploded shingle frame feeds sizes + BOTH self-join
    // sides — unpinned, the shingle pass re-runs per consumer (no
    // exchange canonicalization through the round-robin spread)
    val s = docs
      .select(col("doc_id"), explode(array_distinct(shingles(col(textCol)))).as("sh"))
      .localCheckpoint()
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = s.as("x")
      .join(s.as("y"), col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    shared
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .select(
        col("a_id"), col("b_id"),
        round(
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")),
          6).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Measured LSH dedup quality — precision/recall of the banded-minhash
    * pair set (est_jaccard >= `tau`) against the EXACT all-pairs truth at
    * the same threshold. The "measure, don't guess" answer to "are my
    * band/row parameters right for THIS corpus": recall falls when bands
    * are too selective for the similarity level, precision when the
    * estimator passes pairs the exact Jaccard rejects. The truth side is
    * quadratic — feed a content-hash sample (hash of the normalized text,
    * so exact-duplicate groups stay intact inside the sample). */
  def lshQuality(
      docs: DataFrame,
      tau: Double = 0.5,
      k: Int = 16,
      bands: Int = 4,
      textCol: String = "text"): DataFrame = {
    val pred = minhashPairs(docs, textCol, k, bands)
      .where(col("est_jaccard") >= tau).select("a_id", "b_id")
    val truth = exactJaccardPairs(docs, tau, textCol).select("a_id", "b_id")
    // ONE pass over each side: a full-outer join on the pair key classifies
    // every pair as pred-only / truth-only / both, and a single aggregate
    // reads off all three counts — the naive both-join + three separate
    // count jobs evaluates the (expensive) pred and truth plans twice each
    val counts = pred.withColumn("p", lit(1))
      .join(truth.withColumn("t", lit(1)), Seq("a_id", "b_id"), "full_outer")
      .agg(
        count(col("p")).as("n_pred"),
        count(col("t")).as("n_truth"),
        count(when(col("p").isNotNull && col("t").isNotNull, 1)).as("n_both"))
    counts.select(
      col("n_pred"), col("n_truth"), col("n_both"),
      when(col("n_pred") > 0, round(col("n_both").cast("double") / col("n_pred"), 6))
        .otherwise(lit(0.0)).as("precision"),
      when(col("n_truth") > 0, round(col("n_both").cast("double") / col("n_truth"), 6))
        .otherwise(lit(0.0)).as("recall"))
  }

  /** Edit-distance near-duplicate pairs for SHORT strings — titles,
    * names, metadata fields — where token-shingle machinery has nothing
    * to shingle: distinct values sharing a `blockPrefix`-char prefix are
    * candidates, kept when codegen'd levenshtein <= `maxDist`. The
    * blocking join is the scale contract (candidates meet on the prefix
    * key, never all-pairs) and also the recall contract: pairs that
    * differ inside the first `blockPrefix` chars are not candidates —
    * the standard trade, widen the prefix window by unioning a
    * suffix-block pass if the field edits its head. Distinct-values
    * first: the pair frame is vocabulary-sized, not row-sized. */
  def editDistancePairs(
      df: DataFrame,
      valueCol: String,
      maxDist: Int = 3,
      blockPrefix: Int = 2): DataFrame = {
    require(maxDist >= 1 && blockPrefix >= 1, "need positive maxDist/blockPrefix")
    val names = df.select(col(valueCol).as("v")).where(col("v").isNotNull).distinct()
      .withColumn("blk", substring(col("v"), 1, blockPrefix))
    names.as("x")
      .join(names.as("y"), col("x.blk") === col("y.blk") && col("x.v") < col("y.v"))
      .select(
        col("x.v").as("value_a"), col("y.v").as("value_b"),
        levenshtein(col("x.v"), col("y.v")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** ASYMMETRIC near-containment pairs: (container, contained) where the
    * contained doc's winnow fingerprints are mostly a subset of the
    * container's — |fp(A) ∩ fp(B)| / |fp(B)| >= `tau`. Jaccard-style
    * near-dup ([[minhashPairs]]) is symmetric and misses the
    * quote/mirror/wrapper case: a page that EMBEDS another document
    * (plus its own chrome) has low Jaccard to it but high containment —
    * the signal that decides which of the two to keep.
    *
    * Scale shape: the same equi-join-on-fingerprint economics as the LSH
    * band join — docs only meet where they share a fingerprint, never
    * all-pairs. `maxDf` drops fingerprints shared by more than that many
    * docs (corpus boilerplate — standard winnowing practice): it bounds
    * any single join key's fanout to maxDf², keeps the pair frame
    * candidate-sized, and removes exactly the fingerprints that carry no
    * containment evidence. Denominators count the SURVIVING fingerprints
    * (both engines agree on the filtered universe —
    * q_dedup_containment). */
  def containmentPairs(
      docs: DataFrame,
      textCol: String = "text",
      w: Int = 4,
      tau: Double = 0.7,
      maxDf: Int = 1000): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    // Materialize the df-capped fingerprint table ONCE: `kept` feeds three
    // consumers (both self-join sides + the per-doc size aggregate), and
    // because winnowFingerprints spreads through a round-robin repartition
    // (nondeterministic — no exchange canonicalization), an unpinned plan
    // re-runs the winnow KERNEL + df join per consumer: measured SIX
    // parquet scans and 64-203 s first-pass spikes at sf1 vs ~5 s pinned.
    // The block-store cost is the fingerprint table (~2/(w+1) of the gram
    // count) — paid once; at 100 TB the continuous path persists this very
    // table durably instead ([[containmentIncremental]]'s index).
    val fps = winnowFingerprints(docs, textCol, w).localCheckpoint()
    val rare = fps.groupBy("fingerprint").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select("fingerprint")
    val kept = fps.join(rare, "fingerprint").localCheckpoint()
    val sizes = kept.groupBy(col("doc_id").as("contained")).agg(count(lit(1)).as("n_contained"))
    val shared = kept.as("x")
      .join(kept.as("y"),
        col("x.fingerprint") === col("y.fingerprint") && col("x.doc_id") =!= col("y.doc_id"))
      .groupBy(col("x.doc_id").as("container"), col("y.doc_id").as("contained"))
      .agg(count(lit(1)).as("shared"))
    shared.join(sizes, "contained")
      .withColumn("containment", round(col("shared").cast("double") / col("n_contained"), 6))
      .where(col("containment") >= tau)
      .select("container", "contained", "shared", "n_contained", "containment")
  }

  /** Incremental near-containment: cross pairs between an arriving BATCH
    * and a persisted winnow-fingerprint INDEX of the already-ingested
    * corpus — the continuous-crawl shape, where re-running the winnow
    * kernel over 100 TB per arriving batch is not an option. `index` is a
    * persisted [[winnowFingerprints]] table (doc_id, fingerprint),
    * appended per batch like [[minhashBands]]; only the BATCH's text runs
    * through the kernel. Emits BOTH directions (a batch doc embedded in
    * an indexed doc, and a batch doc wrapping an indexed doc) with the
    * same schema as [[containmentPairs]]; in-batch pairs are a separate
    * pass over the batch alone (the [[minhashIncremental]] convention).
    *
    * The document-frequency cap counts over the COMBINED universe
    * (index ∪ batch), so the result equals [[containmentPairs]] on
    * corpus ∪ batch restricted to cross pairs (law-tested). The df
    * aggregation scans the fingerprint INDEX — a long column, orders of
    * magnitude cheaper than the corpus text — and at scale is itself
    * maintained incrementally as a persisted (fingerprint, df) side
    * table. */
  def containmentIncremental(
      newDocs: DataFrame,
      index: DataFrame,
      textCol: String = "text",
      w: Int = 4,
      tau: Double = 0.7,
      maxDf: Int = 1000,
      /** precomputed (fingerprint, df) counts of the INDEX side — the
        * persisted side table a steady-state deployment maintains
        * alongside the index (append = add the batch's counts), so each
        * batch skips the full index re-aggregation. null recomputes from
        * `index`. Identical results either way (law-tested). */
      indexDf: DataFrame = null): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    val bfps = winnowFingerprints(newDocs, textCol, w)
    val ifps = index.select(col("doc_id"), col("fingerprint"))
    val idxCounts = Option(indexDf)
      .map(_.select(col("fingerprint"), col("df").cast("long").as("__c")))
      .getOrElse(ifps.groupBy("fingerprint").agg(count(lit(1)).as("__c")))
    val rare = bfps.groupBy("fingerprint").agg(count(lit(1)).as("__bc"))
      .join(idxCounts, Seq("fingerprint"), "full_outer")
      .select(col("fingerprint"),
        (coalesce(col("__bc"), lit(0L)) + coalesce(col("__c"), lit(0L))).as("__df"))
      .where(col("__df") <= maxDf).select("fingerprint")
    val keptB = bfps.join(rare, "fingerprint")
    val keptI = ifps.join(rare, "fingerprint")
    val sizesB = keptB.groupBy(col("doc_id")).agg(count(lit(1)).as("__n"))
    val sizesI = keptI.groupBy(col("doc_id")).agg(count(lit(1)).as("__n"))
    val shared = keptB.as("b")
      .join(keptI.as("i"), Seq("fingerprint"))
      .groupBy(col("b.doc_id").as("__bid"), col("i.doc_id").as("__iid"))
      .agg(count(lit(1)).as("shared"))
    def direction(container: String, contained: String, sizes: DataFrame): DataFrame =
      shared
        .join(sizes.select(col("doc_id").as(contained), col("__n")), Seq(contained))
        .withColumn("containment", round(col("shared").cast("double") / col("__n"), 6))
        .where(col("containment") >= tau)
        .select(
          col(container).as("container"), col(contained).as("contained"),
          col("shared"), col("__n").as("n_contained"), col("containment"))
    direction("__iid", "__bid", sizesB) // batch doc embedded in an indexed doc
      .unionByName(direction("__bid", "__iid", sizesI)) // batch doc wraps an indexed doc
  }

  /** Chunk-level storage dedup over content-defined chunks — backup-system
    * accounting applied to a corpus snapshot: a chunk content-hash stores
    * ONCE; every later instance is a pointer. Per document: total chunk
    * tokens, NOVEL tokens (instances that are their hash's first occurrence
    * in (doc_id, chunk_idx) order — the deterministic first-copy rule), and
    * the novelty ratio. `sum(chunk_tokens) / sum(novel_tokens)` over the
    * frame is the corpus storage-dedup ratio; a crawl snapshot's
    * near-zero-novelty documents are re-crawls.
    *
    * Shape at 100 TB: chunking ([[TextOps.cdcChunk]]) is zero-shuffle
    * map-side array codegen; ownership is one hash-keyed aggregate (min
    * (doc, idx) struct — map-side combinable) plus an equi-join back on the
    * hash; the rollup is one doc-keyed aggregate. No windows over the
    * corpus, no driver collects; CDC boundaries resync after edits, so a
    * revised re-crawl shares every untouched chunk (law-tested on
    * [[TextOps.cdcChunk]]). Documents with zero tokens produce no chunks
    * and no row, matching the chunker. */
  def chunkNovelty(
      docs: DataFrame,
      w: Int = 4,
      divisor: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val chunks = chunkHashes(docs, w, divisor, idCol, textCol)
    val owner = chunkOwners(chunks, idCol)
    val marked = chunks.join(owner, Seq("__h"))
      .withColumn(
        "__novel",
        col("__o.d") === col(idCol) && col("__o.i") === col("chunk_idx"))
    chunkRollup(marked, idCol)
  }

  /** The chunk kernel shared by [[chunkNovelty]] and its incremental face:
    * CDC-chunk each doc and hash the chunk text — zero-shuffle map-side
    * codegen, one row per (doc, chunk_idx, n_tokens, __h). Production
    * incremental callers run this ONCE per batch and feed the pinned frame
    * to BOTH [[chunkNoveltyAgainst]] and [[chunkOwners]] (one text pass,
    * the multi-consumer-pin discipline). */
  def chunkHashes(
      docs: DataFrame,
      w: Int = 4,
      divisor: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    // spread the single-row-group corpus before the CDC+md5 kernel (it ran
    // as ONE task: 8 jobs / 8 tasks measured on q_dedup_chunk_novelty);
    // row-derived target, results unchanged — every consumer is an exact
    // integer aggregate / min-struct / equi-join. rowsPerTask sweep
    // (sf0.1, 32 threads, min-of-3): unspread 2.90 s / 256 2.00 / 1024
    // 1.68 on chunk_novelty; the inc face prefers 1024 too (3.68 vs 3.06)
    TextOps.cdcChunk(TextOps.spreadScan(docs, rowsPerTask = 1024L), w, divisor, textCol, idCol)
      .select(
        col(idCol), col("chunk_idx"), col("n_tokens"),
        md5(col("chunk_text")).as("__h"))

  /** Chunk-ownership state of one [[chunkHashes]] frame: (__h, __o) with
    * __o the min (doc, idx) struct — "the first copy owns the chunk". The
    * persisted side table of the incremental face; [[chunkMergeOwners]]
    * folds batch states (min is set-additive), and with id-ordered batches
    * the fold equals whole-corpus ownership exactly. */
  def chunkOwners(chunks: DataFrame, idCol: String = "doc_id"): DataFrame =
    chunks
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol).as("d"), col("chunk_idx").as("i"))).as("__o"))

  /** Fold two chunk-ownership states: min-struct per hash. */
  def chunkMergeOwners(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("__h")).agg(min(col("__o")).as("__o"))

  /** Per-doc novelty of a NEW batch's chunks against the ownership store
    * so far — the incremental face of [[chunkNovelty]] (the
    * exactIncremental / semDedupIncremental contract): a chunk is novel
    * iff its hash is absent from the store AND this (doc, idx) is the
    * batch-internal first copy. With id-ordered batches the appended
    * per-doc rows EQUAL the whole-corpus pass (the global first copy of
    * any hash lives in the earliest batch carrying it), so a continuous
    * re-crawl maintains its storage-dedup accounting at batch cost —
    * the 100 TB chunk store is probed by one hash equi-join, never
    * re-chunked or re-scanned. `store` needs only its `__h` column; keys
    * are de-duplicated here so a lazy union of per-batch owner pieces is
    * a valid store. */
  def chunkNoveltyAgainst(
      chunks: DataFrame,
      store: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val batchOwner = chunkOwners(chunks, idCol)
      .withColumnRenamed("__o", "__bo")
    val marked = chunks
      .join(batchOwner, Seq("__h"))
      .join(
        store.select(col("__h")).distinct().withColumn("__seen", lit(true)),
        Seq("__h"), "left_outer")
      .withColumn(
        "__novel",
        col("__seen").isNull &&
          col("__bo.d") === col(idCol) && col("__bo.i") === col("chunk_idx"))
    chunkRollup(marked, idCol)
  }

  private def chunkRollup(marked: DataFrame, idCol: String): DataFrame =
    marked
      .groupBy(col(idCol))
      .agg(
        sum(col("n_tokens").cast("long")).as("chunk_tokens"),
        sum(when(col("__novel"), col("n_tokens").cast("long")).otherwise(lit(0L)))
          .as("novel_tokens"))
      .withColumn(
        "novelty",
        round(col("novel_tokens").cast("double") / col("chunk_tokens"), 6))

  /** Exact duplicate groups by content fingerprint. Returns one row per
    * fingerprint with the representative (min doc_id) and group size.
    * Single hash-aggregation shuffle on the fingerprint — optimal. */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), TextOps.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("rep_doc_id"), count(lit(1)).as("group_size"))

  /** Incremental exact dedup: the new batch against an already-ingested
    * fingerprint set — the shape a continuously-fed corpus needs, where
    * re-deduplicating 100 TB per arriving batch is not an option. One
    * LEFT ANTI equi-join on the fingerprint (Catalyst broadcasts a small
    * `seen` side automatically; both sides hash-partition otherwise) plus
    * an in-batch first-wins dedup. `seen` is one `fingerprint` column —
    * at scale, the persisted output of exact() reused across runs. */
  def exactIncremental(
      newDocs: DataFrame,
      seen: DataFrame,
      textCol: String = "text"): DataFrame = {
    val fp = newDocs.select(
      col("doc_id"), TextOps.fingerprint(col(textCol)).as("fingerprint"))
    val survivors = fp.join(
      seen.select(col("fingerprint")), Seq("fingerprint"), "left_anti")
    // batch-internal duplicates: keep the smallest doc_id per fingerprint
    survivors
      .groupBy("fingerprint")
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id", "fingerprint")
  }

  /** Bloom-prefiltered incremental exact dedup — same result as
    * [[exactIncremental]], different 100 TB economics. The plain version
    * left-anti-joins EVERY new fingerprint against the persisted corpus
    * store: a shuffle proportional to corpus size per arriving batch. Here
    * the corpus side is first folded into one serialized Bloom filter
    * (Spark's native `BloomFilterAggregate` — partial-aggregable, merged
    * executor-side) delivered through a scalar subquery, exactly the
    * runtime-filter mechanism Catalyst's InjectRuntimeFilter uses. The
    * batch is then split MAP-SIDE by the codegen `BloomFilterMightContain`
    * predicate: definite-new rows (the overwhelming majority of a crawl
    * batch against a deduplicated store) never shuffle at all, and only
    * maybe-hits (true duplicates + fpp false positives) reach the exact
    * left-anti join. False positives cost a join probe, never a wrong
    * answer. `expectedItems` sizes the filter; at scale pass the store's
    * row count (1B ids ≈ 1.2 GB at the default 3% fpp — one broadcast,
    * versus re-shuffling the store every batch). */
  def exactIncrementalBloom(
      newDocs: DataFrame,
      seen: DataFrame,
      textCol: String = "text",
      expectedItems: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

    val bloomDF = seen.select(
      GraftBridge.column(
        new BloomFilterAggregate(
          GraftBridge.expression(xxhash64(col("fingerprint"))),
          expectedItems).toAggregateExpression()).as("bf"))
    // null-safe: an empty store aggregates to a NULL filter -> nothing seen
    val maybeSeen = coalesce(
      GraftBridge.column(BloomFilterMightContain(
        GraftBridge.scalarSubquery(bloomDF),
        GraftBridge.expression(xxhash64(col("fingerprint"))))),
      lit(false))

    val fp = newDocs.select(
      col("doc_id"), TextOps.fingerprint(col(textCol)).as("fingerprint"))
    val definiteNew = fp.where(!maybeSeen)
    val checked = fp.where(maybeSeen)
      .join(seen.select(col("fingerprint")), Seq("fingerprint"), "left_anti")
      .select("doc_id", "fingerprint")
    definiteNew
      .unionByName(checked)
      .groupBy("fingerprint")
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id", "fingerprint")
  }

  /** Benchmark decontamination: drop corpus docs sharing ANY word n-gram
    * with the benchmark set — the overlap rule every training pipeline runs
    * to scrub eval/test material out of pre-training data. Benchmark n-gram
    * sets are small by construction (eval suites are MBs against a 100 TB
    * corpus), so the overlap probe is a BROADCAST semi-join over a pure
    * map-side explode of the corpus — no corpus shuffle — and the final
    * left-anti join keys (contaminated ids) are tiny again. n defaults to
    * 8 contiguous words (the classic 13-gram rule scaled to short docs). */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bench = broadcast(
      ngramFrame(benchmark, n, idCol, textCol).select(col("__h")).distinct())
    val contaminated = ngramFrame(corpus, n, idCol, textCol)
      .join(bench, "__h").select(col(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** NEAR-dup decontamination: drop corpus docs whose estimated Jaccard
    * against ANY benchmark doc reaches `threshold` — the fuzzier sibling
    * of [[decontaminate]] for eval material that survives exact n-gram
    * scrubbing through light paraphrase/reformatting (the Llama-style
    * near-dup guard). Pure composition: the benchmark's LSH band index
    * ([[minhashBands]]) is the "seen corpus" and [[minhashIncremental]]
    * treats the training corpus as the arriving batch — benchmark indexes
    * are tiny (MBs vs 100 TB), so the band join's build side broadcasts
    * and the corpus is never shuffled by anything bigger than its own
    * signature explode. */
  def decontaminateNearDup(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String = "text",
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    minhashIncremental(
      corpus,
      minhashBands(benchmark, textCol, k, bands)
        .select(col("sig"), col("band_idx"), col("band_hash")),
      textCol, k, bands, threshold)

  /** (id, window-hash) rows — the shared hot n-gram extraction pass.
    * Compiled kernel, not TextOps.ngramHashes: interpreted higher-order
    * md5 folds measure far slower than a compiled function (same
    * rationale as the minhash kernels; byte-identical hex output). */
  private def ngramFrame(df: DataFrame, n: Int, idCol: String, textCol: String): DataFrame =
    spread(df).select(col(idCol), explode(ngramMd5Udf(col(textCol), lit(n))).as("__h"))

  /** Cross-SOURCE overlap matrix: for every source pair, how many distinct
    * n-token window hashes they share, plus the Jaccard of their window
    * sets — the corpus-curation signal for "these two crawls/dumps cover
    * the same material" that decides dedup order and mix weights before
    * any row-level work runs.
    *
    * Scale shape: one distinct aggregation to (source, hash) — the same
    * compiled n-gram kernel every span op uses — then an equi-self-join on
    * the hash whose fan-out is bounded by sources², never docs²; per-source
    * set sizes are a sources-sized frame that broadcasts back for the
    * Jaccard. */
  def crossSourceOverlap(
      docs: DataFrame,
      n: Int = 8,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    // pinned: the distinct gram set feeds sizes + both self-join sides
    val grams = ngramFrame(docs, n, sourceCol, textCol)
      .select(col(sourceCol).as("src"), col("__h"))
      .distinct()
      .localCheckpoint()
    val sizes = grams.groupBy("src").agg(count(lit(1)).as("n_grams"))
    val shared = grams.as("a")
      .join(grams.as("b"), col("a.__h") === col("b.__h") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.select(col("src").as("source_a"), col("n_grams").as("__na"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("src").as("source_b"), col("n_grams").as("__nb"))),
        Seq("source_b"))
      .select(
        col("source_a"),
        col("source_b"),
        col("n_shared"),
        round(col("n_shared").cast("double") / (col("__na") + col("__nb") - col("n_shared")), 6)
          .as("jaccard"))
  }

  /** Cross-document duplicate-SPAN measurement — the substring-level
    * signal whole-document dedup misses (boilerplate, license blocks,
    * templated passages repeated across otherwise-distinct documents):
    * for every document, the fraction of its n-token windows whose hash
    * also occurs in at least one OTHER document. Two linear passes: one
    * hash-keyed aggregate marks a window hash cross-doc iff
    * min(doc) != max(doc) (no distinct-count sketch needed), one semi-join
    * back counts each document's windows landing in the cross-doc set.
    * Documents shorter than n tokens emit zero windows and report 0.0. */
  def duplicateSpans(
      docs: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // pinned: the gram frame feeds the cross-doc aggregate AND the
    // per-doc join back (its "runs twice" note below becomes "scans once")
    val grams = ngramFrame(docs, n, idCol, textCol).localCheckpoint()
    val crossDoc = grams
      .groupBy("__h")
      .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
      .where(col("__mn") =!= col("__mx"))
      .select(col("__h"), lit(1).as("__x"))
    // one joined aggregation computes totals AND dup counts, so the hot
    // ngram map pass runs twice (crossDoc + this), not three times
    val perDoc = grams
      .join(crossDoc, Seq("__h"), "left_outer")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_spans"),
        count(col("__x")).as("n_dup_spans"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left_outer")
      .select(
        col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        round(
          coalesce(col("n_dup_spans"), lit(0L)) /
            greatest(coalesce(col("n_spans"), lit(0L)), lit(1L)).cast("double"),
          6).as("dup_span_fraction"))
  }

  /** Cross-document duplicate-span REMOVAL — the edit step of ExactSubstr
    * dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"), where [[duplicateSpans]] is the measurement: every
    * token covered by an n-token window whose hash occurs in MORE than one
    * document is scrubbed and the surviving tokens reassembled. Removal
    * policy: a duplicated span leaves ALL documents carrying it — the
    * deterministic, order-free variant (keep-one-copy needs a global
    * document order and a second keyed pass; at 100 TB the conservative
    * scrub is the one that stays embarrassingly parallel).
    *
    * Same linear shape as the measurement: one window-hash aggregate marks
    * cross-doc hashes, one semi-join back collects per-doc duplicate window
    * STARTS (bounded by document length, never corpus size), and the edit
    * itself is a codegen index-aware array filter — token i survives iff no
    * duplicate window [s, s+n) covers it. */
  def removeDuplicateSpans(
      docs: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val win = spread(docs).select(
      col(idCol),
      posexplode(ngramMd5Udf(col(textCol), lit(n))).as(Seq("__p", "__h")))
    val crossDoc = win
      .groupBy("__h")
      .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
      .where(col("__mn") =!= col("__mx"))
      .select(col("__h"))
    val starts = win
      .join(crossDoc, Seq("__h"))
      .groupBy(idCol)
      .agg(collect_set(col("__p")).as("__starts"))
    val toks = TextOps.tokens(col(textCol))
    val st = coalesce(col("__starts"), typedLit(Array.empty[Int]))
    val kept = filter(toks, (_, i) =>
      size(filter(st, s => s <= i && i <= s + lit(n - 1))) === 0)
    docs
      .join(starts, Seq(idCol), "left_outer")
      .select(
        col(idCol),
        concat_ws(" ", kept).as("clean_text"),
        size(toks).cast("long").as("n_tokens"),
        (size(toks) - size(kept)).cast("long").as("n_removed"))
  }

  /** Per-document MinHash signature + band hashes (the map-side pass).
    *
    * Left lazy on purpose: the kernel is a compiled function, so the
    * optimizer inlining it into both self-join sides costs one extra cheap
    * pass — measured faster than any persist/checkpoint boundary at this
    * scale. (Interpreted higher-order expressions were the opposite: 50x
    * slower and worth a boundary. Measure before materializing.) At 100 TB
    * a pipeline persists this frame as a signature table and reuses it. */
  def minhashFrame(docs: DataFrame, textCol: String = "text", k: Int = 16)
      : DataFrame =
    spread(docs)
      .select(col("doc_id"), minhashUdf(k)(col(textCol)).as("sig"))

  /** Band-signature index rows (doc_id, sig, band_idx, band_hash) — the
    * persistable LSH index. [[minhashPairs]] self-joins this frame; a
    * continuously-fed corpus PERSISTS it (one parquet table, appended per
    * batch) so arriving data near-dedups against the whole corpus via an
    * equi-join on the index ([[minhashIncremental]]), never a corpus
    * rescan.
    *
    * Explodes a LITERAL band-index sequence and derives the band hash
    * above the Generate: an explode over a derived array makes the
    * optimizer infer a size()>0 filter and push the array expression
    * (signature included) below the exchange, re-evaluating it per input
    * row; a literal sequence folds that filter away and the signature
    * attribute flows through untouched. */
  def minhashBands(docs: DataFrame, textCol: String = "text", k: Int = 16, bands: Int = 4)
      : DataFrame = {
    val rows = k / bands
    minhashFrame(docs, textCol, k)
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(bands - 1))).as("band_idx"))
      .withColumn(
        "band_hash",
        md5(concat_ws(
          ",",
          transform(slice(col("sig"), col("band_idx") * rows + 1, lit(rows)), x => x.cast("string")))))
  }

  /** Candidate near-duplicate pairs via LSH banding, scored by signature
    * agreement (estimated Jaccard). Join key = (band_idx, band_hash): two
    * docs collide iff some band matches — linear-scale candidate generation.
    */
  def minhashPairs(docs: DataFrame, textCol: String = "text", k: Int = 16, bands: Int = 4)
      : DataFrame = {
    // pinned: both self-join sides read the signature table; unpinned,
    // the minhash kernel runs once per side
    val exploded = minhashBands(docs, textCol, k, bands).localCheckpoint()
    val a = exploded.select(
      col("doc_id").as("a_id"),
      col("sig").as("a_sig"),
      col("band_idx"),
      col("band_hash"))
    val b = exploded.select(
      col("doc_id").as("b_id"),
      col("sig").as("b_sig"),
      col("band_idx"),
      col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .where(col("a_id") < col("b_id"))
      .select(
        col("a_id"),
        col("b_id"),
        round(
          size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y), p => p))
            .cast("double") / k,
          6).as("est_jaccard"))
      .distinct()
  }

  /** Incremental NEAR-dup: drop new docs whose estimated Jaccard against
    * ANY already-indexed doc reaches `threshold` — the continuous-crawl
    * shape, where re-deduplicating the whole corpus per arriving batch is
    * not an option. `index` is a persisted [[minhashBands]] table (the
    * corpus's LSH signature index, appended per batch): candidates come
    * from a (band_idx, band_hash) equi-join of the batch's bands against
    * it — work scales with band-bucket occupancy, never corpus size — and
    * the dropped-id set is batch-sized, driving one left-anti join back.
    * In-batch near-dups are a separate pass ([[minhashPairs]] +
    * [[dupGroups]] over the batch alone). */
  def minhashIncremental(
      newDocs: DataFrame,
      index: DataFrame,
      textCol: String = "text",
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    // an index persisted with a different k would band-hash different
    // slice widths — near-zero candidates and SILENT dedup failure; check
    // one stored signature (limit-1 read) and fail loudly. bands must
    // match too, but band geometry isn't recoverable from the rows —
    // callers own that contract (scaladoc).
    index.select(size(col("sig"))).head(1).headOption.foreach { r =>
      require(r.getInt(0) == k,
        s"LSH index was built with k=${r.getInt(0)}, caller passed k=$k")
    }
    val nb = minhashBands(newDocs, textCol, k, bands)
      .select(
        col("doc_id"), col("sig").as("__nsig"),
        col("band_idx"), col("band_hash"))
    val dup = nb
      .join(
        index.select(col("sig").as("__osig"), col("band_idx"), col("band_hash")),
        Seq("band_idx", "band_hash"))
      .where(
        round(
          size(filter(zip_with(col("__nsig"), col("__osig"), (x, y) => x === y), p => p))
            .cast("double") / k,
          6) >= threshold)
      .select(col("doc_id"))
      .distinct()
    newDocs.join(dup, Seq("doc_id"), "left_anti")
  }

  /** Exact n-gram Jaccard on the LSH candidate pairs (verification stage —
    * the expensive set comparison runs only on candidates, never all pairs).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      minJaccard: Double = 0.0): DataFrame = {
    val k = 16
    val bands = 4
    val rows = k / bands
    // ONE map-side pass computes both the minhash signature (candidate
    // generation) and the distinct shingle set (verification) — the
    // tokenize/md5 work is shared, and the frame is materialized once (the
    // "signature table" pattern) so neither self-join side recomputes it.
    val shingleSetUdf = udf((text: String) => shingleStrings(text).distinct)
    val base = spread(docs)
      .select(
        col("doc_id"),
        minhashUdf(k)(col(textCol)).as("sig"),
        shingleSetUdf(col(textCol)).as("sh"))
      .localCheckpoint()
    val exploded = base
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(bands - 1))).as("band_idx"))
      .withColumn(
        "band_hash",
        md5(concat_ws(
          ",",
          transform(slice(col("sig"), col("band_idx") * rows + 1, lit(rows)), x => x.cast("string")))))
      .select(col("doc_id"), col("band_idx"), col("band_hash"))
    val cand = exploded
      .select(col("doc_id").as("a_id"), col("band_idx"), col("band_hash"))
      .join(
        exploded.select(col("doc_id").as("b_id"), col("band_idx"), col("band_hash")),
        Seq("band_idx", "band_hash"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
    val sh = base.select(col("doc_id"), col("sh"))
    val joined = cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val union = (size(col("a_sh")) + size(col("b_sh"))).cast("double") - inter
    joined
      .select(col("a_id"), col("b_id"), round(inter / union, 6).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Duplicate GROUPS from near-dup pairs: connected components over the
    * pair graph by iterative min-label propagation. Every doc gets a
    * group_id = the smallest doc_id reachable through near-dup edges
    * (singletons keep their own id), which is the canonical corpus-cleaning
    * shape: keep rows where doc_id == group_id.
    *
    * The iteration runs ONLY over pair-connected vertices — a set the size
    * of the near-dup pair list, orders of magnitude smaller than the
    * corpus — and singletons are attached at the end with one left join
    * (labels side is small → broadcast). Each iteration is one equi-join +
    * one min-aggregate keyed on the vertex id — partial-aggregable
    * shuffles, no windows; localCheckpoint cuts the growing lineage.
    * Converges in O(component diameter) iterations, and near-dup
    * components are shallow by construction; the per-iteration
    * changed-count action is the convergence check. */
  def dupGroups(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      maxIters: Int = 20,
      /** edge count at or below which a driver-side union-find replaces the
        * distributed iteration: the pair graph is orders of magnitude
        * smaller than the corpus, and one collect + one broadcast join
        * beats O(diameter) shuffle rounds until the edges themselves stop
        * fitting in driver memory */
      driverMaxEdges: Long = 5000000L): DataFrame = {
    val edges = pairs
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .distinct()
      .localCheckpoint()
    val nEdges = edges.count()

    val labels: DataFrame =
      if (nEdges <= driverMaxEdges) {
        // union-find with path compression; roots kept at the component
        // minimum so label == min reachable id (same result as propagation)
        val parent = scala.collection.mutable.HashMap.empty[Any, Any]
        def find(x: Any): Any = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        def lt(a: Any, b: Any): Boolean =
          a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
        edges.collect().foreach { row =>
          val (ra, rb) = (find(row.get(0)), find(row.get(1)))
          if (ra != rb) { if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
        }
        val idType = docs.schema(idCol).dataType
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vid", idType),
          org.apache.spark.sql.types.StructField("label", idType)))
        val rows = parent.keys.toSeq.map(v =>
          org.apache.spark.sql.Row(v, find(v)))
        docs.sparkSession.createDataFrame(
          docs.sparkSession.sparkContext.parallelize(rows, 1), schema)
      } else {
        // distributed min-label propagation over pair-connected vertices
        var lbl = edges
          .select(col("src").as("vid")) // both directions present: src covers all
          .distinct()
          .withColumn("label", col("vid"))
          .localCheckpoint()
        var changed = 1L
        var iter = 0
        while (changed > 0) {
          // a silent stop at maxIters would hand back labels that are NOT
          // component minima (long-path graphs: diameter > iters) and the
          // caller's "keep doc_id == group_id" dedup would keep dup rows —
          // fail loud so the caller raises maxIters deliberately
          if (iter >= maxIters)
            throw new IllegalStateException(
              s"dupGroups: min-label propagation did not converge in $maxIters " +
                "iterations (component diameter exceeds maxIters) — raise maxIters")
          val neighborMin = edges
            .join(lbl, edges("src") === lbl("vid"))
            .select(col("dst").as("vid"), col("label"))
          val updated = lbl
            .union(neighborMin)
            .groupBy("vid")
            .agg(min("label").as("label"))
            .localCheckpoint()
          changed = updated
            .join(lbl.withColumnRenamed("label", "old"), "vid")
            .where(col("label") =!= col("old"))
            .count()
          lbl = updated
          iter += 1
        }
        lbl
      }

    val d = docs.select(col(idCol)).distinct()
    d.join(labels, d(idCol) === labels("vid"), "left_outer")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("group_id"))
  }

  /** Keep ONE representative per duplicate group — the doc maximizing
    * `scoreCol`, ties to the smallest id (the post-grouping step of every
    * dedup pipeline: keep the best copy, drop the rest). One min_by hash
    * aggregate keyed on group_id — partial-aggregable, no window — then a
    * semi-join back for the full rows; the reps side is one id per group,
    * so it broadcasts at any corpus size with a sane group count. */
  def selectRepresentatives(
      docs: DataFrame,
      groups: DataFrame,
      scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    // NULL scores rank LAST (struct fields sort nulls first ascending, so a
    // raw -score would make a null-scored doc win every group; coalescing
    // to +inf matches a SQL ORDER BY score DESC NULLS LAST)
    val orderKey = struct(
      coalesce(-col(scoreCol).cast("double"), lit(Double.PositiveInfinity)),
      col(idCol))
    val reps = docs
      .select(col(idCol), col(scoreCol))
      .join(groups, idCol)
      .groupBy("group_id")
      .agg(min_by(col(idCol), orderKey).as(idCol))
    docs.join(reps.select(col(idCol)), Seq(idCol), "left_semi")
  }

  /** Per-document 64-bit simhash frame (map-side pass), via the native
    * codegen expression graft.functions.SimHash64. */
  def simhashFrame(docs: DataFrame, textCol: String = "text"): DataFrame =
    spread(docs)
      .select(col("doc_id"), graft.functions.SimHash64(col(textCol)).as("simhash"))

  /** Near-duplicate pairs with hamming(simhash) <= maxDist, candidates from
    * 16-bit block equality (pigeonhole blocking: hamming <= 3 over 4 blocks
    * implies at least one identical block — an equi-join, linear scale).
    * 16-bit blocks give 65,536 join-key values per block, which keeps the
    * candidate join linear-ish at corpus scale (8-bit blocks cap at 256 keys
    * and degenerate toward O(N^2/256)). */
  /** Incremental SimHash near-dup: drop new docs whose simhash is within
    * `maxDist` hamming of ANY already-indexed doc — the continuous-crawl
    * face of [[simhashPairs]], completing the incremental family (exact /
    * bloom / minhash / containment / embedding / simhash). `index` is a
    * persisted [[simhashFrame]] (doc_id, simhash) appended per batch — 8
    * bytes a row, so a billion-doc index is single-digit GBs; candidates
    * come from the same 4×16-bit pigeonhole block equi-join (any pair
    * within hamming 3 agrees on some block), so work scales with
    * block-bucket occupancy, never corpus size, and only the BATCH text
    * runs the hash kernel. In-batch near-dups are a separate
    * [[simhashPairs]] pass over the batch alone (the
    * [[minhashIncremental]] convention). */
  def simhashIncremental(
      newDocs: DataFrame,
      index: DataFrame,
      textCol: String = "text",
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "4x16-bit pigeonhole blocks guarantee recall only for maxDist <= 3")
    val nb = simhashFrame(newDocs, textCol)
      .select(col("doc_id"), col("simhash").as("__nsh"),
        explode(sequence(lit(0), lit(3))).as("block_idx"))
      .withColumn("block_val",
        expr("shiftrightunsigned(__nsh, cast(block_idx * 16 as int)) & 65535"))
    val ib = index
      .select(col("simhash").as("__osh"),
        explode(sequence(lit(0), lit(3))).as("block_idx"))
      .withColumn("block_val",
        expr("shiftrightunsigned(__osh, cast(block_idx * 16 as int)) & 65535"))
    val dup = nb.join(ib, Seq("block_idx", "block_val"))
      .where(expr("bit_count(__nsh ^ __osh)") <= maxDist)
      .select(col("doc_id"))
      .distinct()
    newDocs.join(dup, Seq("doc_id"), "left_anti")
  }

  def simhashPairs(docs: DataFrame, textCol: String = "text", maxDist: Int = 3): DataFrame = {
    val sf = simhashFrame(docs, textCol)
    // literal-sequence explode (see minhashPairs note), block value derived
    // above the Generate: 16-bit block k via unsigned shift (the simhash is
    // a full 64-bit pattern — sign-oblivious bit ops, not division)
    val ex = sf
      .select(col("doc_id"), col("simhash"), explode(sequence(lit(0), lit(3))).as("block_idx"))
      .withColumn(
        "block_val",
        expr("shiftrightunsigned(simhash, cast(block_idx * 16 as int)) & 65535"))
    val a = ex.select(col("doc_id").as("a_id"), col("simhash").as("a_sh"), col("block_idx"), col("block_val"))
    val b = ex.select(col("doc_id").as("b_id"), col("simhash").as("b_sh"), col("block_idx"), col("block_val"))
    // hamming filter BEFORE the distinct: on near-uniform corpora block
    // collisions degenerate toward all-pairs, and deduplicating the full
    // candidate stream would dominate; filtering first keeps the shuffle
    // proportional to true near-dups
    a.join(b, Seq("block_idx", "block_val"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), expr("bit_count(a_sh ^ b_sh)").as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }
}
