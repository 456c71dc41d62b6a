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

  /** k-element MinHash signature: element i = min over shingles of
    * md5(i || '|' || shingle). array<string>, lexicographic min. */
  def minhashSignature(text: Column, k: Int = 16): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i =>
        array_min(
          transform(shingles(text), s => md5(concat(i.cast("string"), lit("|"), s)))))

  /** LSH band hashes: `bands` hashes, each over `k/bands` signature rows. */
  def bandHashes(sig: Column, k: Int = 16, bands: Int = 4): Column = {
    val rows = k / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      j => md5(concat_ws(",", slice(sig, j * rows + 1, lit(rows)))))
  }

  /** Exact duplicate groups by content fingerprint. Returns one row per
    * fingerprint with the representative (min doc_id) and group size.
    * Single hash-aggregation shuffle on the fingerprint — optimal. */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), TextOps.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("rep_doc_id"), count(lit(1)).as("group_size"))

  /** Per-document MinHash signature + band hashes (the map-side pass). */
  def minhashFrame(docs: DataFrame, textCol: String = "text", k: Int = 16, bands: Int = 4)
      : DataFrame =
    docs
      .select(col("doc_id"), minhashSignature(col(textCol), k).as("sig"))
      .withColumn("bands", bandHashes(col("sig"), k, bands))

  /** Candidate near-duplicate pairs via LSH banding, scored by signature
    * agreement (estimated Jaccard). Join key = (band_idx, band_hash): two
    * docs collide iff some band matches — linear-scale candidate generation.
    */
  def minhashPairs(docs: DataFrame, textCol: String = "text", k: Int = 16, bands: Int = 4)
      : DataFrame = {
    val mh = minhashFrame(docs, textCol, k, bands)
    val exploded = mh
      .select(col("doc_id"), col("sig"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
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

  /** Exact n-gram Jaccard on the LSH candidate pairs (verification stage —
    * the expensive set comparison runs only on candidates, never all pairs).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      minJaccard: Double = 0.0): DataFrame = {
    val cand = minhashPairs(docs, textCol).select("a_id", "b_id")
    val sh = docs.select(
      col("doc_id"),
      array_distinct(shingles(col(textCol))).as("sh"))
    val joined = cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val union = (size(col("a_sh")) + size(col("b_sh"))).cast("double") - inter
    joined
      .select(col("a_id"), col("b_id"), round(inter / union, 6).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** 32-bit SimHash over a token-array column. Bit b is set iff the sum over
    * tokens of (2*bit_b(md5(token)) - 1) is positive. Pure nested
    * higher-order expressions — no UDF. Bit b of md5(t) = bit (3 - b%4) of
    * the nibble at hex digit (b/4), extracted arithmetically (instr on a hex
    * alphabet) so any engine computes the identical value. */
  def simhashOf(toksCol: String): Column =
    expr(
      s"""aggregate(sequence(0, 31), cast(0 as bigint), (acc, b) -> acc +
         |  CASE WHEN aggregate($toksCol, 0, (s, t) -> s +
         |    (2 * (cast(floor(
         |        (instr('0123456789abcdef', substring(md5(t), 1 + cast(b / 4 as int), 1)) - 1)
         |        / cast(pow(2, 3 - b % 4) as int)) as int) % 2) - 1)) > 0
         |  THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END)""".stripMargin)

  /** Per-document 32-bit simhash frame (map-side pass). */
  def simhashFrame(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("toks", array_distinct(TextOps.tokens(col(textCol))))
      .withColumn("simhash", simhashOf("toks"))
      .select(col("doc_id"), col("simhash"))

  /** Near-duplicate pairs with hamming(simhash) <= maxDist, candidates from
    * 8-bit block equality (pigeonhole blocking: hamming <= 3 over 4 blocks
    * implies at least one identical block — an equi-join, linear scale). */
  def simhashPairs(docs: DataFrame, textCol: String = "text", maxDist: Int = 3): DataFrame = {
    val sf = simhashFrame(docs, textCol)
    // block value k = byte k of the simhash, via arithmetic (engine-portable)
    val ex = sf
      .select(
        col("doc_id"),
        col("simhash"),
        explode(transform(
          sequence(lit(0), lit(3)),
          k =>
            struct(
              k.as("block_idx"),
              floor(col("simhash") / pow(lit(256.0), k.cast("double")))
                .cast("long")
                .mod(256)
                .as("block_val")))).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.block_idx"), col("b.block_val"))
    val a = ex.select(col("doc_id").as("a_id"), col("simhash").as("a_sh"), col("block_idx"), col("block_val"))
    val b = ex.select(col("doc_id").as("b_id"), col("simhash").as("b_sh"), col("block_idx"), col("block_val"))
    a.join(b, Seq("block_idx", "block_val"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), expr("bit_count(a_sh ^ b_sh)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }
}
