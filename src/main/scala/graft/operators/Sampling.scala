package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Deterministic train/val/test assignment: each row lands in the split
    * whose cumulative-rate interval contains its uniform draw — the
    * dataset-release primitive (published splits are DEFINED by the hash
    * recipe, so any engine, any day, any partitioning reproduces them;
    * membership is decided per-row, so a later corpus append never
    * reshuffles earlier assignments). Fractions must sum to 1; the last
    * split absorbs the draw's top end, so every row is assigned. Pure
    * map-side CASE chain — zero shuffle at any scale. */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      seed: String = "sp0"): DataFrame = {
    require(splits.size >= 2, "hashSplit needs at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split fractions must sum to 1")
    val u = uniformDraw(col(keyCol), seed)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail // cumulative upper bounds
    val assigned = splits.zip(bounds).dropRight(1).foldRight(lit(splits.last._1): Column) {
      case (((name, _), ub), acc) => when(u < lit(ub), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** LEAKAGE-FREE split: like [[hashSplit]], but members of the same
    * near-duplicate group always land in the SAME split — the assignment
    * hashes the GROUP id, not the document id. Splitting duplicates across
    * train and eval silently leaks training text into the benchmark; this
    * is the standard countermeasure (group-wise splitting over the dedup
    * operator's groups).
    *
    * `groups` is a (idCol, groupCol) map, e.g. [[Dedup.dupGroups]] output;
    * docs absent from it form their own singleton group (coalesce to the
    * doc id — LEFT join, so a partial group map is safe). Scale shape: one
    * doc-keyed equi join against the doc-sized group table (co-bucketed
    * with the corpus in a real layout), then the same zero-shuffle CASE
    * chain as hashSplit. Output: input columns + group id + `split`. */
  def groupedSplit(
      df: DataFrame,
      groups: DataFrame,
      splits: Seq[(String, Double)],
      idCol: String = "doc_id",
      groupCol: String = "group_id",
      seed: String = "sp0"): DataFrame = {
    val joined = df
      .join(groups.select(col(idCol), col(groupCol)), Seq(idCol), "left")
      .withColumn(groupCol, coalesce(col(groupCol), col(idCol)))
    hashSplit(joined, groupCol, splits, seed)
  }

  /** Token-budget MIXTURE PLAN across sources — "how many tokens of each
    * domain does the training run take?" Water-filling: allocate the
    * budget proportionally to each source's weight, capping every source
    * at its capacity (its tokens x maxEpochs — you can't up-sample a
    * domain forever without degenerate repetition) and redistributing the
    * excess over the uncapped sources. Closed form, no iteration: with
    * sources sorted by capacity/weight ascending, the water level is
    * t = (B - Σ_{capped} cap) / Σ_{uncapped} w at the unique prefix where
    * it's consistent; alloc_i = min(cap_i, t·w_i).
    *
    * Input: one row per source with LONG `tokens`, DOUBLE `weight` > 0,
    * computed upstream by exact aggregations. Scale shape: sources number
    * in the hundreds at most — the plan is window arithmetic over a tiny
    * frame (the corpus-sized work is the upstream stats aggregation).
    * Output per source: tokens, capacity, alloc (6dp), epochs =
    * alloc/tokens (6dp). If the budget exceeds total capacity every source
    * is fully capped. */
  def mixturePlan(
      stats: DataFrame,
      budget: Long,
      maxEpochs: Double = 4.0,
      sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byRatio = Window.orderBy(col("__r"), col(sourceCol))
    val base = stats
      .withColumn("capacity", round(col("tokens") * lit(maxEpochs), 6))
      .withColumn("__r", col("capacity") / col("weight"))
      .withColumn("__cumcap", sum("capacity").over(
        byRatio.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__cumw", sum("weight").over(
        byRatio.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__totw", sum("weight").over(
        byRatio.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // water level if every source up to AND INCLUDING this one is capped;
      // the last row has no remaining weight (ANSI division guard) — an
      // unbounded level there means "everything capped", which min(cap, .)
      // resolves
      .withColumn(
        "__t_after",
        when(col("__totw") - col("__cumw") > 0,
          (lit(budget.toDouble) - col("__cumcap")) / (col("__totw") - col("__cumw")))
          .otherwise(lit(Double.MaxValue)))
      // a source is capped iff the level computed just before it still
      // tops its ratio: level_before = (B - cumcap_prev)/(totw - cumw_prev)
      .withColumn(
        "__t_before",
        (lit(budget.toDouble) -
          coalesce(lag("__cumcap", 1).over(byRatio), lit(0.0))) /
          (col("__totw") - coalesce(lag("__cumw", 1).over(byRatio), lit(0.0))))
      .withColumn("__capped", col("__t_before") >= col("__r"))
    // the water level is __t_after at the LAST capped row (0 capped -> B/W)
    val levelW = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base
      .withColumn(
        "__level",
        coalesce(
          max(when(col("__capped"), col("__t_after"))).over(levelW),
          lit(budget.toDouble) / col("__totw")))
      .withColumn(
        "alloc",
        round(least(col("capacity"), greatest(col("__level"), lit(0.0)) * col("weight")), 6))
      .withColumn("epochs", round(col("alloc") / col("tokens"), 6))
      .select(col(sourceCol), col("tokens"), col("weight"), col("capacity"),
        col("alloc"), col("epochs"))
  }

  /** The exact double upper bounds hashSplit compares against, for oracle
    * mirrors: both engines must test u against bit-identical constants
    * (0.8 + 0.1 is 0.9000000000000001 — the fold's value, not "0.9"). */
  private[graft] def splitBounds(splits: Seq[(String, Double)]): Seq[Double] =
    splits.scanLeft(0.0)(_ + _._2).tail

  /** Upper bound on the quota-th smallest of n uniform [0,1) draws.
    *
    * The quota-th order statistic concentrates at quota/n with standard
    * deviation ~ sqrt(quota)/n, so quota + 6·sqrt(quota) + 16 draws below
    * the bound is a >6-sigma guarantee that at least `quota` rows survive
    * a `u < bound` pre-filter. quotaSample still VERIFIES the survivor
    * count and widens on the (astronomically rare) undershoot, so the
    * bound is a performance parameter, not a correctness assumption. */
  private[operators] def quotaThreshold(quota: Int, n: Long): Double =
    if (n <= quota) 1.0
    else math.min(1.0, (quota.toDouble + 6.0 * math.sqrt(quota.toDouble) + 16.0) / n.toDouble)

  /** Phase-1 pre-filter of [[quotaSample]]: keep only rows whose draw is
    * below the (per-stratum, widened) threshold — a map-side filter after
    * a broadcast join against one tiny (stratum, threshold) row per
    * stratum. Survivors per stratum ≈ quota + O(sqrt(quota)), so the
    * exact ranking window downstream touches ~quota·strata rows no matter
    * how Zipfian the stratum sizes are. */
  private[graft] def quotaPrefilter(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      quota: Int,
      seed: String,
      counts: Seq[(String, Long)],
      widen: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val thr = counts.map { case (s, n) =>
      (s, math.min(1.0, quotaThreshold(quota, n) * widen))
    }
    val thrDf = thr.toDF("__s", "__thr")
    df.join(broadcast(thrDf), col(stratumCol).cast("string") <=> col("__s"), "inner")
      .where(uniformDraw(col(keyCol), seed) < col("__thr"))
  }

  /** Exact per-stratum quotas ("top N docs per language"): rank rows inside
    * each stratum by the deterministic draw and keep the first `quota`.
    *
    * Naively this is one `row_number` window partitioned by stratum — but
    * that serializes each stratum onto a single task, and real corpora are
    * Zipfian (one language can be half the data), so the largest stratum
    * becomes a straggler AQE cannot split. Instead: two-phase. Phase 1
    * pre-filters map-side to the ~quota rows per stratum whose draw can
    * possibly rank within the quota (see [[quotaThreshold]]), verifying
    * the survivor count per stratum and widening the threshold if any
    * stratum undershot (u is uniform, so this is a >6-sigma event). Phase
    * 2 runs the exact window on survivors only — the skewed shuffle now
    * carries ~quota·strata rows, not the corpus. Output is identical to
    * the naive window. */
  def quotaSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      quota: Int,
      seed: String = "s0"): DataFrame = {
    // stratum sizes: one hash agg, rows = #strata (map-side combined)
    val counts: Seq[(String, Long)] = df
      .groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    var widen = 1.0
    var pre = quotaPrefilter(df, keyCol, stratumCol, quota, seed, counts, widen)
    var verified = counts.isEmpty
    while (!verified) {
      val surv = pre
        .groupBy(col("__s")).agg(count(lit(1)).as("__k"))
        .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      val ok = counts.forall { case (s, n) =>
        surv.getOrElse(Option(s), 0L) >= math.min(quota.toLong, n)
      }
      if (ok) verified = true
      else {
        widen *= 4.0
        pre = quotaPrefilter(df, keyCol, stratumCol, quota, seed, counts, widen)
      }
    }
    val w = Window
      .partitionBy(col(stratumCol))
      .orderBy(uniformDraw(col(keyCol), seed), col(keyCol))
    pre.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= quota)
      .drop("__rk", "__s", "__thr")
  }

  /** TOKEN-budget selection per stratum ("take ~N tokens per language /
    * domain") — the unit of LLM data curation is tokens, not documents, so
    * this is the budgeted sibling of [[quotaSample]]: rank rows inside each
    * stratum by the deterministic draw and keep a row iff the token mass of
    * rows ranked strictly BEFORE it is < `budget`. The selection therefore
    * always reaches the budget when the stratum can supply it, overshoots
    * by at most one document, and is a pure function of (key, seed) —
    * independent of physical layout, reproducible across engines.
    *
    * Scale shape mirrors [[quotaSample]]'s two-phase skew defense. The
    * naive form is one cumulative-sum window per stratum, serializing a
    * Zipfian head stratum onto a single task. Phase 1 pre-filters map-side
    * at draw threshold ≈ budget / stratumTokenMass (the draw is independent
    * of the token column, so the token mass below draw u concentrates at
    * u·total; see [[budgetThreshold]] for the slack), then VERIFIES per
    * stratum that the surviving prefix provably contains the cut: because
    * `u < thr` keeps an exact PREFIX of the (u, key) stratum order, the cut
    * lies inside it iff survivor token mass ≥ budget (or the whole stratum
    * survived when its mass can't reach the budget — checked on row count,
    * since zero-token rows carry no mass but are still in-budget rows).
    * Undershoot widens the threshold ×4 and retries — a >6-sigma event at
    * the default slack. Phase 2 runs the exact cumulative window on the
    * ~budget-mass survivor set only. Null/negative token values count as 0
    * mass (they never block the cut from advancing). */
  def tokenBudgetSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      tokenCol: String,
      budget: Long,
      seed: String = "s0"): DataFrame = {
    require(budget >= 0L, "tokenBudgetSample needs a non-negative budget")
    val spark = df.sparkSession
    import spark.implicits._
    val tok = greatest(coalesce(col(tokenCol).cast("long"), lit(0L)), lit(0L))
    // per-stratum (row count, token mass): one map-combined agg, rows = #strata
    val stats: Seq[(String, Long, Long)] = df
      .groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"), sum(tok).as("__m"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
    def prefilter(widen: Double): DataFrame = {
      val thrDf = stats
        .map { case (s, _, m) => (s, math.min(1.0, budgetThreshold(budget, m) * widen)) }
        .toDF("__s", "__thr")
      df.join(broadcast(thrDf), col(stratumCol).cast("string") <=> col("__s"), "inner")
        .where(uniformDraw(col(keyCol), seed) < col("__thr"))
    }
    var widen = 1.0
    var pre = prefilter(widen)
    var verified = stats.isEmpty
    while (!verified) {
      val surv = pre
        .groupBy(col("__s"))
        .agg(count(lit(1)).as("__k"), sum(tok).as("__sm"))
        .collect()
        .map(r => Option(r.getString(0)) ->
          ((r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2))))
        .toMap
      val ok = stats.forall { case (s, n, m) =>
        val (k, sm) = surv.getOrElse(Option(s), (0L, 0L))
        if (m >= budget) sm >= budget else k == n
      }
      if (ok) verified = true
      else {
        widen *= 4.0
        pre = prefilter(widen)
      }
    }
    val w = Window
      .partitionBy(col(stratumCol))
      .orderBy(uniformDraw(col(keyCol), seed), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    pre.withColumn("__before", coalesce(sum(tok).over(w), lit(0L)))
      .where(col("__before") < budget)
      .drop("__before", "__s", "__thr")
  }

  /** Phase-1 draw threshold for [[tokenBudgetSample]]: the token mass below
    * draw u has mean u·M and variance bounded by u·Σtok² ≤ u·M·maxTok; the
    * slack term mirrors [[quotaThreshold]]'s quota + 6·sqrt(quota) + 16
    * shape, scaled to mass by treating the budget as the "count" (exact
    * when every row is one token; conservative verification-plus-widening
    * catches heavy-document corpora where the mass is lumpier). */
  private[operators] def budgetThreshold(budget: Long, mass: Long): Double =
    if (mass <= budget) 1.0
    else math.min(1.0, (budget.toDouble + 6.0 * math.sqrt(budget.toDouble) + 16.0) / mass.toDouble)

  /** Temperature-balanced per-stratum rates — the multilingual mixing rule
    * (sample stratum s with probability ∝ (n_s/N)^tau; tau < 1 upweights
    * tail languages): with w_s = n_s^tau and Z = Σ w_s,
    * rate_s = min(1, targetTotal·w_s / Z / n_s).
    *
    * Engine-reproducibility: Z folds in stratum-NAME order (any engine can
    * replay the same in-order double sum) and the returned rates round to
    * 6dp — a draw grid of 2^-32 never straddles sub-1e-6 libm pow
    * differences, so the kept row SET is identical across engines. */
  def temperatureRates(
      counts: Seq[(String, Long)],
      tau: Double,
      targetTotal: Long): Seq[(String, Double)] = {
    val sorted = counts.sortBy(_._1)
    val ws = sorted.map { case (s, n) => (s, n, math.pow(n.toDouble, tau)) }
    val z = ws.foldLeft(0.0)(_ + _._3)
    ws.map { case (s, n, w) =>
      val r = math.min(1.0, targetTotal.toDouble * w / z / n.toDouble)
      s -> BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** One-call temperature sample: count strata (one tiny hash agg), derive
    * the balanced rates, apply the zero-shuffle stratified filter. */
  def temperatureSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      tau: Double,
      targetTotal: Long,
      seed: String = "s0"): DataFrame = {
    val counts = df
      .groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
      .filter(_._1 != null) // null strata are unsampleable (CASE never matches)
    stratifiedSample(df, keyCol, stratumCol,
      temperatureRates(counts, tau, targetTotal).toMap, seed)
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

  /** Exact top-k rows per group by a score column, without ever sorting a
    * whole group in one task — "keep the k best documents per source" is
    * the selection face of quality filtering, and groups in a crawl are
    * wildly skewed (one domain can be half the corpus).
    *
    * Salted two-level tournament: rows first shuffle by (group,
    * hash(id) % salts) — the hot group spreads over `salts` tasks, each
    * sorting ~n_g/salts rows for a local top-k — then the ≤ salts·k
    * survivors per group meet in an exact final top-k. Both levels are
    * row_number windows with a total (score DESC, id ASC) order, so the
    * result is deterministic and layout-invariant: any row in the true
    * global top-k is in its salt-bucket's top-k regardless of how ids
    * hash. Output = input columns + `rank` (1-based). At 100 TB, size
    * `salts` so n_max/salts rows fit one task's sort buffer. */
  def topKPerGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      k: Int,
      idCol: String,
      salts: Int = 64): DataFrame = {
    require(k >= 1, "k must be positive")
    require(salts >= 1, "salts must be positive")
    val w1 = Window
      .partitionBy(col(groupCol), col("__salt"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val local = df
      .withColumn("__salt", pmod(xxhash64(col(idCol).cast("string")), lit(salts)))
      .withColumn("__r", row_number().over(w1))
      .where(col("__r") <= k)
      .drop("__r", "__salt")
    val w2 = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, col(idCol).asc)
    local
      .withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
  }

  /** Assign documents to fixed-token-budget training shards: shard_id =
    * floor(cumulative_tokens_before / shardTokens) in `keyCol` order.
    *
    * A deterministic order-dependent running sum is the textbook case for
    * a global-order window — which funnels the whole corpus through one
    * task. This is the two-pass version that never does that:
    *
    *   1. range-partition + sort by key (a normal parallel sort shuffle —
    *      every partition holds a contiguous key range, each sorted);
    *   2. pass 1: per-partition token subtotals (one row per partition,
    *      map-side combined) → exact cumulative offsets on the driver,
    *      broadcast;
    *   3. pass 2: map-side running sum per partition, seeded with that
    *      partition's offset — shard_id assigned with zero further
    *      shuffle.
    *
    * The prefix sums are exact, so the output is identical to the
    * single-task window no matter where the range boundaries land. The
    * sorted input must be PINNED so both passes see the same partitioning;
    * `pin` picks how:
    *   - "persist" (default): persist(DISK_ONLY) — a lost partition
    *     RECOMPUTES through the deterministic range-sort instead of
    *     failing the job, the behavior a 1000-executor run needs (some
    *     executor loss is expected at that scale).
    *   - "local": localCheckpoint — marginally faster, but partitions
    *     live only in executor storage, so an executor loss FAILS the
    *     job. Opt in for local mode and short interactive runs. Both
    *     modes produce identical shard ids (the pin is a scheduling
    *     property, not a semantic one). */
  def packShards(
      df: DataFrame,
      keyCol: String,
      tokensCol: String,
      shardTokens: Long,
      numPartitions: Int = 0,
      pin: String = "persist"): DataFrame =
    runningOffset(df, keyCol, tokensCol, "__offset", numPartitions, pin)
      // `div`, not `/`: true long division (a double quotient silently
      // loses exactness past 2^53 cumulative tokens)
      .withColumn("shard_id", expr(s"__offset div ${shardTokens}L"))
      .drop("__offset")

  /** MATERIALIZE shard assignments as one parquet file per shard under
    * `dir/shard_id=K/` — the artifact step after [[packShards]] /
    * [[curriculumShards]] that training dataloaders actually consume.
    * The repartition on the shard id routes each shard's rows to one
    * task, so partitionBy emits exactly one file per shard; shards are
    * budget-bounded by construction, so no file exceeds ~shardTokens of
    * content. Read back with Hive partitioning (the shard id is the
    * partition column). */
  def writeShards(
      assigned: DataFrame, dir: String, shardCol: String = "shard_id"): Unit =
    assigned
      .repartition(col(shardCol))
      .write.partitionBy(shardCol).mode("overwrite").parquet(dir)

  /** MATERIALIZE a [[mixturePlan]]: select, per source, the prefix of
    * documents in deterministic md5(id) order whose cumulative token count
    * stays within the source's `alloc` — the step that turns the planner's
    * per-source budgets into an actual training set. Hash order makes the
    * draw uniform (the hash is content-blind) and engine-reproducible
    * (q_sample_mixture_select's oracle re-draws the identical prefixes).
    *
    * The per-source running sum is NOT a per-source window (one task per
    * source dies when one source is half the corpus). One composite
    * source-major sort key (source ‖ zero-padded hash ‖ id) feeds the
    * two-pass [[runningOffset]] — a normal parallel range-sort — and the
    * per-source cumulative is recovered exactly as global_offset −
    * source_base, where source_base = min(global_offset) over the source
    * (rows are source-contiguous in the sorted order; the bases frame is
    * one tiny broadcast). A doc is kept iff its INCLUSIVE cumulative ≤
    * alloc. Sources absent from the plan are dropped. */
  def applyMixturePlan(
      docs: DataFrame,
      plan: DataFrame,
      tokensCol: String = "tokens",
      idCol: String = "doc_id",
      sourceCol: String = "source",
      numPartitions: Int = 0): DataFrame = {
    val h = graft.functions.Funcs.md5Hash60(col(idCol))
    val keyed = docs.withColumn(
      "__mixkey",
      // the \\u0001 separator sorts below every printable char, so rows stay
      // source-CONTIGUOUS even when one source name prefixes another
      // ("src1" vs "src10") -- the contiguity the base-subtraction needs
      concat_ws("\u0001",
        col(sourceCol),
        // 19 decimal digits cover 2^60: lexicographic == numeric order
        lpad(h.cast("string"), 19, "0"),
        col(idCol).cast("string")))
    val off = runningOffset(keyed, "__mixkey", tokensCol, "__goff", numPartitions)
    val bases = off.groupBy(sourceCol).agg(min(col("__goff")).as("__base"))
    off
      .join(broadcast(bases), Seq(sourceCol))
      .join(broadcast(plan.select(col(sourceCol), col("alloc"))), Seq(sourceCol))
      .where(
        (col("__goff") - col("__base") +
          coalesce(col(tokensCol).cast("long"), lit(0L))).cast("double") <= col("alloc"))
      .drop("__mixkey", "__goff", "__base", "alloc")
  }

  /** Materialize an UP-SAMPLING mixture plan — the epochs > 1 face of
    * [[applyMixturePlan]], which can only ever select a prefix (one
    * epoch): when a plan allocates more than a source holds (data-
    * constrained scaling repeats curated sources for several epochs —
    * mixturePlan's maxEpochs models exactly this), each source emits
    * floor(alloc / srcTokens) FULL copies of every doc (epoch 0..full−1)
    * plus one PARTIAL epoch (epoch = full) holding the prefix of docs, in
    * the same deterministic md5 order applyMixturePlan selects by, whose
    * inclusive cumulative token mass fits the remaining
    * alloc − full·srcTokens. A plan with alloc ≤ srcTokens degenerates to
    * applyMixturePlan with epoch = 0 (law-tested). Output: input columns
    * + epoch (long).
    *
    * Scale: the selection arithmetic is the SAME one two-pass global
    * prefix sum over a source-contiguous key (no per-source window task,
    * no global sort); the epoch explode multiplies rows only AFTER it, by
    * at most ⌈maxEpochs⌉ — output size is O(alloc), i.e. the training set
    * being built. Plan and per-source bases broadcast. */
  def applyMixtureEpochs(
      docs: DataFrame,
      plan: DataFrame,
      tokensCol: String = "tokens",
      idCol: String = "doc_id",
      sourceCol: String = "source",
      numPartitions: Int = 0): DataFrame = {
    val h = graft.functions.Funcs.md5Hash60(col(idCol))
    val keyed = docs.withColumn(
      "__mixkey",
      concat_ws("\\u0001", // source-contiguous key, see applyMixturePlan
        col(sourceCol),
        lpad(h.cast("string"), 19, "0"),
        col(idCol).cast("string")))
    val off = runningOffset(keyed, "__mixkey", tokensCol, "__goff", numPartitions)
    val bases = off.groupBy(sourceCol).agg(min(col("__goff")).as("__base"))
    // full/rem derive from the plan's OWN token count (the mass the plan
    // allocated against), in doubles on both engines: floor(alloc/tokens)
    // and alloc − full·tokens are single IEEE ops the oracle replays
    val planned = plan
      .select(col(sourceCol), col("alloc"), col("tokens").cast("double").as("__stok"))
      .withColumn(
        "__full",
        when(col("__stok") > 0, floor(col("alloc") / col("__stok")))
          .otherwise(lit(0.0)).cast("long"))
      .withColumn("__rem", col("alloc") - col("__full") * col("__stok"))
    off
      .join(broadcast(bases), Seq(sourceCol))
      .join(broadcast(planned), Seq(sourceCol))
      .withColumn(
        "__cum",
        (col("__goff") - col("__base") +
          coalesce(col(tokensCol).cast("long"), lit(0L))).cast("double"))
      .withColumn("epoch", explode(sequence(lit(0L), col("__full"))))
      .where(
        col("epoch") < col("__full") ||
          (col("epoch") === col("__full") && col("__cum") <= col("__rem")))
      .drop("__mixkey", "__goff", "__base", "alloc", "__stok", "__full", "__rem", "__cum")
  }

  /** CURRICULUM shard packing: documents ordered easy→hard by score
    * quantile bin (equi-depth cuts over the whole corpus), hash-shuffled
    * WITHIN each bin, then packed into fixed-token shards in that order —
    * so a training run consuming shards sequentially sees the curriculum
    * while each shard stays internally well-mixed (the bin, not the raw
    * score, drives order: rank-ordering by raw score would sort trivial
    * docs together and wreck batch diversity). Same two-pass prefix-sum
    * scale shape as [[packShards]] — the composite (bin ‖ hash ‖ id) key
    * range-sorts in parallel, no global single-task window anywhere.
    * Output: input columns + bin + shard_id. */
  def curriculumShards(
      docs: DataFrame,
      scoreCol: String,
      tokensCol: String,
      shardTokens: Long,
      nBins: Int = 4,
      idCol: String = "doc_id",
      numPartitions: Int = 0): DataFrame = {
    require(shardTokens >= 1, "shardTokens must be positive")
    val cuts = docs.agg(Profile.quantileCutsAgg(scoreCol, nBins).as("cuts"))
    val keyed = docs
      .crossJoin(broadcast(cuts))
      .withColumn(
        "bin", Profile.binExpr(col("cuts"), col(scoreCol).cast("double"), nBins))
      .withColumn(
        "__curkey",
        concat_ws("",
          col("bin").cast("string"), // nBins <= 10 keeps one digit ordered; larger needs lpad
          lpad(graft.functions.Funcs.md5Hash60(col(idCol)).cast("string"), 19, "0"),
          col(idCol).cast("string")))
      .drop("cuts")
    require(nBins <= 10, "single-digit bin prefix — raise by lpad'ing the bin for more")
    runningOffset(keyed, "__curkey", tokensCol, "__offset", numPartitions)
      .withColumn("shard_id", expr(s"__offset div ${shardTokens}L"))
      .drop("__curkey", "__offset")
  }

  /** The two-pass exact prefix sum behind [[packShards]] / [[packSequences]]:
    * appends `outCol` = Σ tokens of all strictly-preceding rows in `keyCol`
    * order, computed without a global-order window (range-sort shuffle,
    * per-partition subtotals → broadcast offsets, map-side running sum —
    * see the [[packShards]] doc for the full rationale and `pin` modes). */
  def runningOffset(
      df: DataFrame,
      keyCol: String,
      tokensCol: String,
      outCol: String,
      numPartitions: Int = 0,
      pin: String = "persist"): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, col(keyCol))
      .sortWithinPartitions(col(keyCol))
    val ranged = pin match {
      case "local" => sorted.localCheckpoint()
      case "persist" =>
        sorted.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      case other => throw new IllegalArgumentException(
        s"pin must be 'local' or 'persist', got '$other'")
    }
    // pass 1: token subtotal per physical partition (tiny result)
    val subtotals = ranged
      .groupBy(spark_partition_id().as("__pid"))
      .agg(sum(coalesce(col(tokensCol).cast("long"), lit(0L))).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = ranged.rdd.getNumPartitions
    val offsets = new Array[Long](math.max(nParts, 1))
    var acc = 0L
    for (p <- 0 until nParts) {
      offsets(p) = acc
      acc += subtotals.getOrElse(p, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: map-side running sum seeded with the partition offset
    val tokIdx = ranged.schema.fieldIndex(tokensCol)
    val outSchema = ranged.schema.add(outCol, LongType, nullable = false)
    val outRdd = ranged.rdd.mapPartitionsWithIndex(
      { (pid, it) =>
        var cum = bc.value(pid)
        it.map { row =>
          val off = cum
          if (!row.isNullAt(tokIdx))
            cum += row.get(tokIdx).asInstanceOf[Number].longValue()
          Row.fromSeq(row.toSeq :+ off)
        }
      },
      preservesPartitioning = true)
    spark.createDataFrame(outRdd, outSchema)
  }

  /** Weighted sampling WITHOUT replacement — "pick k documents with odds
    * proportional to quality weight" — by the bottom-k-of-replicated-hashes
    * trick: a row of integer weight w draws w independent 60-bit hashes
    * (of id || trial || seed) and keeps the MINIMUM as its sort key; the
    * sample is the k smallest keys. P(key_a < key_b) = w_a/(w_a+w_b)
    * exactly (min of w iid uniforms ~ Beta(1,w)), which is precisely the
    * sequential weighted-sampling odds — the Efraimidis-Spirakis u^(1/w)
    * key discretized to integer arithmetic, so any engine with md5
    * reproduces the exact same sample (float pow/log never agree across
    * libms; integer mins always do).
    *
    * Scale shape: keys are pure map-side codegen (one md5 per unit of
    * weight — cap weights, default 64, to bound the fan-out) and the
    * selection is orderBy(key).limit(k) = TakeOrdered: per-partition
    * top-k, only k rows per partition reach the driver-side merge. No
    * global sort, no window. Output: input columns + `rank` (1-based).
    *
    * BIAS OF THE CAP: a weight above `maxWeight` is clamped, so the sample
    * follows the CLAMPED weight distribution exactly — nothing subtler
    * (PipelineOpsSpec law: maxWeight=c equals pre-clamping every weight to
    * c). Rows at w > maxWeight are under-represented by the factor
    * min(w, maxWeight)/w; ratios among rows at or below the cap are
    * undistorted. Callers with genuinely heavy-tailed weights should
    * pre-bucket (e.g. log-compress weights into [1, maxWeight]) — a
    * per-row `sequence()` of millions of hashes is the wrong shape at any
    * scale, which is why the cap exists. */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      seed: String = "s0",
      maxWeight: Int = 64): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = least(greatest(col(weightCol).cast("int"), lit(1)), lit(maxWeight))
    val key = array_min(transform(
      sequence(lit(0), w - 1),
      j => graft.functions.Funcs.md5Hash60(
        concat_ws("|", col(keyCol).cast("string"), j.cast("string"), lit(seed)))))
    val picked = df
      .withColumn("__key", key)
      .orderBy(col("__key"), col(keyCol))
      .limit(k)
    val rankW = Window.orderBy(col("__key"), col(keyCol))
    // the window runs over k rows (post-limit), not the corpus
    picked.withColumn("rank", row_number().over(rankW)).drop("__key")
  }

  /** GPT-style sequence packing — concatenate every document's tokens in
    * `keyCol` order and cut the stream every `seqLen` tokens. Unlike
    * [[packShards]] (whole docs to shards), a document STRADDLES sequence
    * boundaries: the output is the occupancy map, one row per
    * (sequence, document) overlap — `seq_id`, the key, `start_in_doc`
    * (first contributed token, 0-based) and `n_tokens` contributed. Every
    * sequence is exactly seqLen tokens except the last; downstream "gather
    * the token slices of sequence s" is then an equi-join on seq_id.
    *
    * Built on [[runningOffset]], so the global order costs one range-sort
    * shuffle and no single-task window; the boundary explode is a codegen
    * Generate over at most n/seqLen+1 rows per doc — the same linear
    * output any packer pays. Zero-token docs contribute no rows. */
  def packSequences(
      df: DataFrame,
      keyCol: String,
      tokensCol: String,
      seqLen: Long,
      numPartitions: Int = 0,
      pin: String = "persist"): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    runningOffset(
      df.select(col(keyCol), col(tokensCol).cast("long").as("__n")),
      keyCol, "__n", "__off", numPartitions, pin)
      .where(col("__n") > 0)
      .select(
        col(keyCol),
        col("__n"),
        col("__off"),
        explode(
          sequence(
            expr(s"__off div ${seqLen}L"),
            expr(s"(__off + __n - 1) div ${seqLen}L")))
          .as("seq_id"))
      .select(
        col("seq_id"),
        col(keyCol),
        (greatest(col("__off"), col("seq_id") * seqLen) - col("__off"))
          .cast("int").as("start_in_doc"),
        (least(col("__off") + col("__n"), (col("seq_id") + 1) * seqLen)
          - greatest(col("__off"), col("seq_id") * seqLen))
          .cast("int").as("n_tokens"))
  }

  /** Per-stratum shard packing: pack each (source, date, …) stratum
    * independently. One hash shuffle on the stratum keys; each stratum's
    * running sum stays on its own tasks, so parallelism = #strata — the
    * right shape when the corpus is already organized by source/date and
    * shards need not cross stratum boundaries. For a single global order
    * over a monolithic corpus, use [[packShards]] (two-pass, never
    * single-task).
    *
    * `shard_id` is a LONG local to the stratum — the same numeric contract
    * as [[packShards]] — and a shard is identified by
    * (stratumCols…, shard_id); the stratum columns are already on the
    * frame, so nothing is stringified into the id. */
  def packShardsBy(
      df: DataFrame,
      keyCol: String,
      tokensCol: String,
      shardTokens: Long,
      stratumCols: Seq[String]): DataFrame = {
    require(stratumCols.nonEmpty, "packShardsBy needs at least one stratum column")
    val w = Window
      .partitionBy(stratumCols.map(col): _*)
      .orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(
      "shard_id",
      floor(coalesce(sum(col(tokensCol)).over(w), lit(0L)) / lit(shardTokens)).cast("long"))
  }
}
