package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * Sampling at corpus scale must be (a) reproducible across runs and
  * engines — a published dataset is defined by its recipe — and (b) pure
  * map-side work. Both rule out `DataFrame.sample` (partition-RNG; results
  * change with partitioning). The primitive here is a uniform [0,1) draw
  * derived from a content hash: u = int(md5(id || seed)[0:8]) / 2^32 —
  * engine-portable (any SQL dialect computes the same u) and independent
  * of physical layout. Keep a row iff u < rate.
  */
object Sampling {

  /** The deterministic per-row uniform draw in [0, 1). */
  def uniformDraw(key: Column, seed: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(seed))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Bernoulli sample at a single rate — zero-shuffle filter. */
  def sample(df: DataFrame, keyCol: String, rate: Double, seed: String = "s0"): DataFrame =
    df.where(uniformDraw(col(keyCol), seed) < lit(rate))

  /** Per-stratum rates (e.g. per-language mix weights): strata absent from
    * `rates` drop entirely. Still a pure map-side filter — the rate lookup
    * compiles to a CASE chain, no join, no shuffle. */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      seed: String = "s0"): DataFrame = {
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === lit(stratum), lit(r)).otherwise(acc)
    }
    df.where(uniformDraw(col(keyCol), seed) < rate)
  }

  /** Exact per-stratum quotas ("top N docs per language"): rank rows inside
    * each stratum by the deterministic draw and keep the first `quota`.
    * One shuffle on the stratum key; the draw makes the selection a stable
    * pseudo-random subset rather than "whatever sorted first". */
  def quotaSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      quota: Int,
      seed: String = "s0"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(uniformDraw(col(keyCol), seed), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Weighted mix of corpora: per-source Bernoulli rates, one union —
    * the "mix 30% web + 70% books" recipe as a single lazy plan. Sources
    * may carry different schemas (missing columns null-fill). */
  def mixCorpora(
      sources: Seq[(DataFrame, Double)],
      keyCol: String,
      seed: String = "s0"): DataFrame =
    sources.zipWithIndex
      .map { case ((df, rate), i) => sample(df, keyCol, rate, s"$seed-$i") }
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** Assign documents to fixed-token-budget training shards: shard_id =
    * floor(cumulative_tokens_before / shardTokens) in `keyCol` order.
    *
    * The running sum is one range-partitioned window (Spark's global-order
    * window = sort shuffle). That is the honest cost of a DETERMINISTIC
    * order-dependent packing; at extreme scale, pack per source/date
    * partition instead (same code over groupBy keys) and concatenate shard
    * namespaces. */
  def packShards(
      df: DataFrame,
      keyCol: String,
      tokensCol: String,
      shardTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard_id",
      floor(coalesce(sum(col(tokensCol)).over(w), lit(0L)) / lit(shardTokens))
        .cast("long"))
  }
}
