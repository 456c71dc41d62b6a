package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic k× scale-up of a TPC-H-ish test-data directory, used to
  * validate the engine's scaling behaviour empirically (per-query wall-time
  * at sf1 vs sf0.1) instead of by plan inspection alone.
  *
  * Method: each fact/dim table is replicated k times with replica-shifted
  * surrogate keys (stride = max(key)+1, so replicas never collide and
  * referential integrity is preserved within each replica). The fixed
  * dimensions (`region`, `nation`) are copied verbatim, as TPC-H holds them
  * constant across scale factors.
  *
  * Content columns are perturbed per replica so the DATA DENSITY of the
  * corpus stays constant under scaling (the realistic regime — a 10× corpus
  * has ~10× the near-dup clusters, not 10-way copies of each document):
  *  - `documents.text`: every token in replica i>0 gets a "·i" suffix, so
  *    shingles/minhashes/fingerprints never collide across replicas and
  *    each replica reproduces the original near-dup structure exactly
  *    (slightly pessimistic for vocabulary-shaped ops: vocab grows k×,
  *    where Heaps' law predicts sublinear growth);
  *  - `embeddings.embedding`: replica i>0 applies a seeded per-replica
  *    DIMENSION PERMUTATION + SIGN FLIP — cosine similarity is invariant
  *    under both, so each replica reproduces the original similarity
  *    structure EXACTLY (same near-dup pairs, same cluster geometry),
  *    while cross-replica vectors decorrelate (an additive offset or
  *    small noise would instead leave each vector with k−1 near-identical
  *    cross-replica copies, quadratically exploding near-dup pair counts
  *    — measured as a 20× wall-time blowup before this fix);
  *  - `events`: user/event ids shift per replica, timestamps are kept — a
  *    k× event stream over the same wall-clock span has k× the concurrent
  *    users, which is how real traffic scales.
  *
  * Usage: ScaleGen <baseDir> <outDir> <k>
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(base, out, kStr) = args.take(3)
    val k = kStr.toInt
    require(k >= 1, s"k must be >= 1, got $k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = spark.read.parquet(s"$base/$t.parquet")
    def wr(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[scalegen] wrote $t")
    }
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c)).cast("long")).head().getLong(0) + 1L

    // Fixed dimensions: verbatim copies.
    Seq("region", "nation").foreach(t => wr(rd(t), t))

    /** k replicas with per-replica key shifts; `mutate` perturbs content
      * columns for replicas i>0 (identity replica 0 stays byte-equal). */
    def replicate(
        df: DataFrame,
        shifts: Seq[(String, Long)],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s))
        }
        if (i == 0) shifted else mutate(shifted, i)
      }.reduce(_ union _)

    val customer = rd("customer"); val ck = stride(customer, "c_custkey")
    val supplier = rd("supplier"); val sk = stride(supplier, "s_suppkey")
    val part     = rd("part");     val pk = stride(part, "p_partkey")
    val orders   = rd("orders");   val ok = stride(orders, "o_orderkey")

    wr(replicate(customer, Seq("c_custkey" -> ck)), "customer")
    wr(replicate(supplier, Seq("s_suppkey" -> sk)), "supplier")
    wr(replicate(part, Seq("p_partkey" -> pk)), "part")
    wr(replicate(orders, Seq("o_orderkey" -> ok, "o_custkey" -> ck)), "orders")
    wr(
      replicate(
        rd("lineitem"),
        Seq("l_orderkey" -> ok, "l_partkey" -> pk, "l_suppkey" -> sk)),
      "lineitem")

    val events = rd("events")
    wr(
      replicate(
        events,
        Seq("event_id" -> stride(events, "event_id"),
            "user_id" -> stride(events, "user_id"))),
      "events")

    val docs = rd("documents")
    wr(
      replicate(
        docs,
        Seq("doc_id" -> stride(docs, "doc_id")),
        (d, i) =>
          d.withColumn(
            "text",
            // "$1·i": group ref then a literal non-digit separator, so the
            // replica digit can never be parsed as part of the group number
            regexp_replace(col("text"), "(\\S+)", "$1·" + i))
            .withColumn("n_chars", length(col("text")).cast("long"))),
      "documents")

    val emb = rd("embeddings")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    wr(
      replicate(
        emb,
        Seq("vec_id" -> stride(emb, "vec_id")),
        (d, i) => {
          val rnd = new scala.util.Random(1000 + i)
          val perm = rnd.shuffle((0 until dim).toList)
          val sign = (0 until dim).map(_ => if (rnd.nextBoolean()) 1.0f else -1.0f)
          d.withColumn(
            "embedding",
            array((0 until dim).map(j =>
              (element_at(col("embedding"), perm(j) + 1) * lit(sign(j)))
                .cast("float")): _*))
        }),
      "embeddings")

    spark.stop()
    println(s"[scalegen] done: $out = $k x $base")
  }
}
