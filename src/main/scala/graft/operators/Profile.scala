package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Column-level data profiling — the corpus-QA pass a training pipeline
  * runs before ingesting a new source: per column, null fraction, distinct
  * count, and numeric/string summary stats.
  *
  * One aggregation pass over the table computes every column's stats
  * (a single job, no per-column scans); the per-column rows are unpivoted
  * driver-side from that one result row. Exact count_distinct here for
  * oracle parity — at 100 TB swap in approx_count_distinct, which turns the
  * expensive distinct shuffle into a mergeable HLL sketch with the same
  * plan shape. */
object Profile {

  /** MERGEABLE per-column numeric statistics — the maintain-without-rescan
    * face of [[profile]]: [[statsOf]] computes one mergeable row per
    * column over a batch (counts, mean, M2, min/max, KMV distinct
    * sketch); [[mergeStats]] combines two such frames with Chan's
    * parallel mean/M2 update and a KMV union, so a 100 TB table's stats
    * update per arriving batch at BATCH cost, never a rescan;
    * [[finalizeStats]] renders (stddev, distinct estimate). The moment
    * algebra is exact up to fp associativity (law-tested against a
    * direct whole-table pass); the distinct estimate is KMV-mergeable by
    * construction — the merged bottom-k set IS the union's bottom-k. */
  def statsOf(
      df: DataFrame, cols: Seq[String], k: Int = 256,
      idCol: Option[Column] = None): DataFrame = {
    require(cols.nonEmpty, "statsOf needs at least one column")
    // ONE aggregation job for ALL columns: every column's seven aggregates
    // fold into a single agg as array(struct(...)) entries and unpivot with
    // one explode — C columns used to cost C jobs / C file listings / C
    // task waves, pure fixed cost at a 50-column 100 TB table. The sketch
    // parameter k travels INSIDE the frame so merge/finalize can never
    // silently trim with a mismatched k.
    val perCol = cols.map { name =>
      val c = col(name).cast("double")
      struct(
        lit(name).as("column"),
        count(lit(1)).as("n_rows"),
        count(c).as("n_valid"),
        coalesce(avg(c), lit(0.0)).as("mean"),
        coalesce(var_pop(c) * count(c), lit(0.0)).as("m2"),
        min(c).as("min_val"),
        max(c).as("max_val"),
        graft.functions.KmvSketch.kmvHashes(col(name), k).as("kmv"),
        // mergeable QUANTILE state: the bottom-k-by-row-hash (hash, value)
        // sample — min-k of a set union is order-free, so two frames'
        // samples union+trim to the combined population's exact sample
        // and quantiles stay batch-maintainable like every other field.
        // Without an id column the sample is empty and quantiles finalize
        // as NULL (moments/kmv are unaffected).
        idCol
          .map(id => graft.functions.BottomKSample
            .bottomKPairsByHash(col(name), id, k))
          .getOrElse(array().cast("array<struct<h:bigint,v:double>>"))
          .as("qsample"),
        lit(k).as("k"))
    }
    df.agg(array(perCol: _*).as("__s"))
      .select(explode(col("__s")).as("__r"))
      .select(col("__r.*"))
  }

  /** The sketch size recorded in the frame; `fallback` only for frames
    * predating the carried-k column. A k the frame itself carries is the
    * only safe source — merging with an independently-guessed k silently
    * trims the KMV union and biases the estimator. */
  private def carriedK(df: DataFrame, fallback: Int): Column =
    if (df.columns.contains("k")) col("k") else lit(fallback)

  /** The carried sample; empty for frames predating the qsample column.
    * Merging a sampled frame with an unsampled one yields the sampled
    * side's sample alone — quantiles then describe only that side, so
    * thread an idCol through EVERY statsOf of a family, or none. */
  private def carriedSample(df: DataFrame): Column =
    if (df.columns.contains("qsample")) col("qsample")
    else array().cast("array<struct<h:bigint,v:double>>")

  /** Combine two [[statsOf]] frames (same columns). The sketch size is read
    * from the frames themselves; a k mismatch between the two sides fails
    * the job rather than trimming to the wrong size. `k` is only the
    * fallback for legacy frames without the carried column. */
  def mergeStats(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame = {
    val aa = a.withColumn("k", carriedK(a, k)).withColumn("qsample", carriedSample(a))
    val n = col("n_valid") + col("vb")
    val kOk = when(col("k") === col("kb"), col("k"))
      .otherwise(raise_error(concat(
        lit("mergeStats: sketch size mismatch between frames (k="), col("k"),
        lit(" vs k="), col("kb"), lit(") for column "), col("column"))))
    aa.join(
        b.withColumn("k", carriedK(b, k)).select(
          col("column"), col("n_rows").as("rb"), col("n_valid").as("vb"),
          col("mean").as("mb"), col("m2").as("m2b"),
          col("min_val").as("minb"), col("max_val").as("maxb"),
          col("kmv").as("kmvb"), carriedSample(b).as("qsampleb"), col("k").as("kb")),
        Seq("column"))
      .select(
        col("column"),
        (col("n_rows") + col("rb")).as("n_rows"),
        n.as("n_valid"),
        when(n > 0, (col("n_valid") * col("mean") + col("vb") * col("mb")) / n)
          .otherwise(lit(0.0)).as("mean"),
        // Chan's parallel M2 update: exact variance composition without
        // revisiting either side's rows
        when(n > 0,
          col("m2") + col("m2b") +
            pow(col("mean") - col("mb"), 2) * col("n_valid") * col("vb") / n)
          .otherwise(lit(0.0)).as("m2"),
        least(col("min_val"), col("minb")).as("min_val"),
        greatest(col("max_val"), col("maxb")).as("max_val"),
        slice(array_sort(array_union(col("kmv"), col("kmvb"))), lit(1), kOk).as("kmv"),
        // array_sort on struct<h,v> orders by h then v — the TreeSet's
        // ordering; array_union's struct dedup is the set semantics
        slice(array_sort(array_union(col("qsample"), col("qsampleb"))), lit(1), kOk)
          .as("qsample"),
        kOk.as("k"))
  }

  /** Render a [[statsOf]]/[[mergeStats]] frame as human statistics. The
    * estimator's k is the frame's own; the parameter is a legacy fallback. */
  def finalizeStats(stats: DataFrame, k: Int = 256): DataFrame = {
    val twoPow60 = 1152921504606846976.0
    val kc = carriedK(stats, k)
    val est =
      when(size(col("kmv")) < kc, size(col("kmv")).cast("double"))
        .otherwise(
          (kc - 1).cast("double") * lit(twoPow60) /
            element_at(col("kmv"), size(col("kmv"))).cast("double"))
    // discrete lower quantile of the carried sample (index
    // floor((n-1)·p), the sampleQuantiles convention) — NULL when the
    // frame carries no sample
    val vals = array_sort(transform(carriedSample(stats), p => p.getField("v")))
    def qAt(p: Double): Column =
      when(size(vals) === 0, lit(null).cast("double"))
        .otherwise(round(
          element_at(vals,
            (floor((size(vals) - 1) * lit(p)) + 1).cast("int")), 6))
    stats.select(
      col("column"),
      col("n_rows"),
      (col("n_rows") - col("n_valid")).as("n_null"),
      round(col("mean"), 6).as("mean"),
      round(when(col("n_valid") > 0, sqrt(col("m2") / col("n_valid")))
        .otherwise(lit(0.0)), 6).as("stddev"),
      col("min_val"),
      col("max_val"),
      round(est, 4).as("distinct_est"),
      qAt(0.1).as("q10"), qAt(0.5).as("q50"), qAt(0.9).as("q90"))
  }

  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.filter(f => cols.isEmpty || cols.contains(f.name))
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        count(c).as(s"${f.name}__nn"),
        count_distinct(c).as(s"${f.name}__dist")) ++ (f.dataType match {
        case _: NumericType =>
          Seq(
            round(min(c).cast("double"), 4).as(s"${f.name}__min"),
            round(max(c).cast("double"), 4).as(s"${f.name}__max"),
            round(avg(c.cast("double")), 4).as(s"${f.name}__avg"))
        case StringType =>
          Seq(
            min(length(c)).cast("double").as(s"${f.name}__min"),
            max(length(c)).cast("double").as(s"${f.name}__max"),
            round(avg(length(c)), 4).as(s"${f.name}__avg"))
        case _ =>
          Seq(
            lit(null).cast("double").as(s"${f.name}__min"),
            lit(null).cast("double").as(s"${f.name}__max"),
            lit(null).cast("double").as(s"${f.name}__avg"))
      })
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = fields.map { f =>
      Row(
        f.name,
        f.dataType.simpleString,
        r.getAs[Long](s"${f.name}__n"),
        r.getAs[Long](s"${f.name}__n") - r.getAs[Long](s"${f.name}__nn"),
        r.getAs[Long](s"${f.name}__dist"),
        Option(r.getAs[Any](s"${f.name}__min")).map(_.toString.toDouble).orNull,
        Option(r.getAs[Any](s"${f.name}__max")).map(_.toString.toDouble).orNull,
        Option(r.getAs[Any](s"${f.name}__avg")).map(_.toString.toDouble).orNull)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("column", StringType),
        StructField("dtype", StringType),
        StructField("n_rows", LongType),
        StructField("n_null", LongType),
        StructField("n_distinct", LongType),
        StructField("min_val", DoubleType),
        StructField("max_val", DoubleType),
        StructField("avg_val", DoubleType))))
  }

  /** Declarative data-quality expectations (the pre-ingest validation gate a
    * pipeline runs on every new source drop). */
  sealed trait Rule { def name: String; def target: String }
  /** Column must be non-null. */
  case class NotNull(column: String) extends Rule {
    val name = "not_null"; val target = column
  }
  /** Non-null values must lie in [lo, hi]. */
  case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = "range"; val target = column
  }
  /** Non-null values must fully match the regex. */
  case class Matches(column: String, pattern: String) extends Rule {
    val name = "regex"; val target = column
  }
  /** The column tuple must be unique across the table. */
  case class Unique(columns: Seq[String]) extends Rule {
    val name = "unique"; val target = columns.mkString(",")
  }
  /** Non-null values must exist in parent(parentKey) — referential
    * integrity. */
  case class RefIntegrity(column: String, parent: DataFrame, parentKey: String)
      extends Rule {
    val name = "fk"; val target = column
  }

  /** Run every rule against `df` and return one row per rule:
    * (rule, target, n_rows, n_violations, violation_rate, passed).
    *
    * Execution shape: ALL row-level rules (not_null/range/regex) and every
    * Unique rule fold into ONE conditional-aggregation pass over the table —
    * adding a rule adds a column to the aggregate, never a scan. Each
    * RefIntegrity rule is one more aggregate against a broadcast of the
    * parent's distinct keys (dimension-sized by assumption — the FK check
    * every warehouse runs). Violation counts are exact longs; the rate is
    * one division rounded 6dp. The result is rule-count sized, assembled
    * driver-side like profile()'s unpivot. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    require(rules.nonEmpty, "validate needs at least one rule")
    val rowRules = rules.zipWithIndex
    val aggs = rowRules.flatMap {
      case (NotNull(c), i) =>
        Some(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__v$i"))
      case (InRange(c, lo, hi), i) =>
        Some(sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
          .otherwise(0L)).as(s"__v$i"))
      case (Matches(c, p), i) =>
        Some(sum(when(col(c).isNotNull && !col(c).rlike("^(?:" + p + ")$"), 1L)
          .otherwise(0L)).as(s"__v$i"))
      case (Unique(cs), i) =>
        Some((count(lit(1)) - count_distinct(struct(cs.map(col): _*))).as(s"__v$i"))
      case (_: RefIntegrity, _) => None
    }
    val base = df.agg(count(lit(1)).as("__n"), aggs: _*).head()
    val nRows = base.getAs[Long]("__n")
    val fkCounts: Map[Int, Long] = rowRules.collect {
      case (RefIntegrity(c, parent, pk), i) =>
        val orphans = df
          .select(col(c))
          .where(col(c).isNotNull)
          .join(
            broadcast(parent.select(col(pk).as(c)).distinct()),
            Seq(c),
            "left_anti")
          .count()
        i -> orphans
    }.toMap
    val rows = rowRules.map { case (r, i) =>
      val v = r match {
        case _: RefIntegrity => fkCounts(i)
        case _               => base.getAs[Long](s"__v$i")
      }
      val rate =
        if (nRows == 0) 0.0
        else BigDecimal(v.toDouble / nRows)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Row(r.name, r.target, nRows, v, rate, v == 0L)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rule", StringType),
        StructField("target", StringType),
        StructField("n_rows", LongType),
        StructField("n_violations", LongType),
        StructField("violation_rate", DoubleType),
        StructField("passed", BooleanType))))
  }

  /** Equi-depth (quantile) binning: rows are labeled 0..nBins-1 by which
    * inter-quantile interval their value falls in — the distributed form of
    * ntile() without ntile's single global sort task (curriculum buckets,
    * length-balanced mixing, histogram prep all want this).
    *
    * Two-phase: ONE percentile aggregation computes the nBins-1 cut points
    * (6dp-rounded so engines agree), then assignment is a broadcast
    * crossJoin + codegen CASE chain — pure map-side work, zero shuffle of
    * the corpus. Ties at a cut point go to the lower bin (first matching
    * CASE arm) in every engine. Unlike ntile, bin populations follow the
    * value distribution (heavy ties land together) — that value-determinism
    * is what makes the label reproducible across engines and layouts. */
  // ===== shared equi-depth binning primitives ===========================
  // ONE definition of the cut points and the tie-to-lower CASE chain —
  // equiDepthBins, distributionDrift, Sampling.curriculumShards, and
  // StreamOps.windowedBinCounts all bin through these, so a change to the
  // rounding/tie rule can never silently diverge between operators (or
  // between an operator and its oracle).

  /** nBins−1 equi-depth cut points of `colName` as one aggregate ARRAY
    * column, 6dp-rounded so engines agree. */
  def quantileCutsAgg(colName: String, nBins: Int): Column = {
    require(nBins >= 2, "need at least two bins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    expr(s"transform(percentile(`$colName`, array(${ps.mkString(", ")})), x -> round(x, 6))")
  }

  /** Bin label 0..nBins−1 from a cuts ARRAY column; ties at a cut go to
    * the lower bin (first matching CASE arm) in every engine. */
  def binExpr(cutsCol: Column, v: Column, nBins: Int): Column =
    (0 until nBins - 1).foldRight(lit(nBins - 1): Column) { case (i, acc) =>
      when(v <= element_at(cutsCol, i + 1), lit(i)).otherwise(acc)
    }

  /** The same chain over LITERAL ascending cut values (streaming plans
    * can't crossJoin an aggregate). */
  def binExprLiteral(cuts: Seq[Double], v: Column): Column = {
    require(cuts.nonEmpty, "need at least one bin edge")
    require(cuts == cuts.sorted, s"cut points must ascend, got $cuts")
    cuts.zipWithIndex.foldRight(lit(cuts.length): Column) { case ((c, i), acc) =>
      when(v <= c, lit(i)).otherwise(acc)
    }
  }

  def equiDepthBins(
      df: DataFrame,
      colName: String,
      nBins: Int,
      idCol: String): DataFrame = {
    val cuts = df.agg(quantileCutsAgg(colName, nBins).as("cuts"))
    df.select(col(idCol), col(colName))
      .crossJoin(broadcast(cuts))
      .select(
        col(idCol), col(colName),
        binExpr(col("cuts"), col(colName).cast("double"), nBins).as("bin"))
  }

  /** Distribution DRIFT between corpus slices — the Population Stability
    * Index (PSI) of every source's value distribution against a reference
    * source, over the reference's own equi-depth bins. The curation
    * signal for "did this crawl's length/quality distribution shift from
    * the dump we tuned the filters on": PSI < 0.1 is stable, > 0.25 is a
    * real shift (the standard credit-scoring thresholds).
    *
    * PSI = Σ_bins (p_src − p_ref)·ln(p_src/p_ref), proportions clamped to
    * `eps` so empty bins stay finite (the standard continuity fix; a
    * clamped bin contributes a large-but-finite term, which is the signal
    * wanted). Scale shape: ONE percentile agg over the reference slice for
    * the cuts (broadcast), ONE corpus-wide (source, bin) count — map-side
    * combinable, ≤ sources×nBins result rows — and all remaining algebra
    * runs on that tiny frame with broadcast joins. The reference source
    * reports PSI 0 against itself (sanity row). Output per (source, bin):
    * 6dp p_ref, p_src, psi_term, and the source's total psi. */
  def distributionDrift(
      df: DataFrame,
      valueCol: String,
      sourceCol: String,
      refSource: String,
      nBins: Int = 4,
      eps: Double = 1e-6): DataFrame = {
    // the cuts are 3 doubles — materialize them EAGERLY so a refSource
    // matching no rows (a typo'd name) fails loudly here instead of
    // silently reporting "no drift" through NULL cuts + an empty p_ref
    // join; the literal cuts also spare the corpus-side crossJoin
    val cutsRow = df.where(col(sourceCol) === refSource)
      .agg(quantileCutsAgg(valueCol, nBins)).head()
    require(
      !cutsRow.isNullAt(0) && !cutsRow.getSeq[Any](0).contains(null),
      s"reference source '$refSource' has no non-null $valueCol rows")
    val cuts = cutsRow.getSeq[Double](0)
    val counts = df
      .select(
        col(sourceCol).as("source"),
        binExprLiteral(cuts, col(valueCol).cast("double")).as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("n"))
    // every (source, bin) cell must exist: a bin the source never hits is
    // exactly the drift evidence PSI must count, not silently skip
    val scaffold = counts.groupBy("source").agg(sum("n").as("tot"))
      .select(col("source"), col("tot"),
        explode(sequence(lit(0), lit(nBins - 1))).as("bin"))
    val p = scaffold.join(broadcast(counts), Seq("source", "bin"), "left")
      .select(col("source"), col("bin"),
        greatest(
          coalesce(col("n"), lit(0L)).cast("double") / col("tot").cast("double"),
          lit(eps)).as("p"))
    val pRef = p.where(col("source") === refSource).select(col("bin"), col("p").as("p_ref"))
    val terms = p.join(broadcast(pRef), "bin")
      .withColumn("term", (col("p") - col("p_ref")) * log(col("p") / col("p_ref")))
    val psi = terms.groupBy("source").agg(round(sum("term"), 6).as("psi"))
    terms.join(broadcast(psi), "source")
      .select(col("source"), col("bin"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p"), 6).as("p_src"),
        round(col("term"), 6).as("psi_term"),
        col("psi"))
  }

  /** PER-GROUP quantile estimates through [[graft.functions
    * .BottomKSample]] — the grouped face of [[sampleQuantiles]]: every
    * group's sample is its k smallest distinct (id-hash, value) pairs,
    * held in O(k) mergeable aggregate state through the partial-agg
    * shuffle, so no group is ever sorted or buffered whole. Same discrete
    * lower-quantile index as the global sketch; same engine-replay
    * contract (q_profile_group_quantiles re-draws each group's sample).
    * Output: (group, p, q) — NULL q for groups with no non-null values. */
  def groupQuantiles(
      df: DataFrame,
      valueCol: String,
      idCol: Column,
      groupCol: String,
      k: Int = 256,
      ps: Seq[Double] = Seq(0.1, 0.5, 0.9)): DataFrame =
    // no isNotNull prefilter: the aggregate itself skips NULL values, and
    // dropping the rows would drop ALL-NULL groups entirely — the
    // contract gives those groups NULL q, not absence
    df.groupBy(col(groupCol))
      .agg(graft.functions.BottomKSample
        .bottomKByHash(col(valueCol), idCol, k).as("vs"))
      .select(col(groupCol), explode(typedlit(ps)).as("p"), col("vs"))
      .select(
        col(groupCol), col("p"),
        when(size(col("vs")) === 0, lit(null).cast("double"))
          .otherwise(round(
            element_at(
              col("vs"),
              floor((size(col("vs")) - 1).cast("double") * col("p")).cast("int") + 1),
            6)).as("q"))

  /** Mutual information between two categorical columns (nats, 6dp) —
    * the dependence audit: does `source` leak `lang`, does a quasi-
    * identifier determine a sensitive column, is a feature redundant.
    * I(A;B) = Σ p(a,b)·ln(p(a,b)/(p(a)p(b))), with each term quantized to
    * integer nano-nats before summing (the [[valueEntropy]] discipline:
    * integer sums are exact under any summation order, so distributed
    * partials and a sequential replay agree bit-for-bit). Marginal
    * entropies ride along for normalization context. One (a, b) count
    * shuffle; margins are domain-sized broadcasts. */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val joint = df
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("c"))
    val ma = joint.groupBy("a").agg(sum("c").as("ca"))
    val mb = joint.groupBy("b").agg(sum("c").as("cb"))
    val n = joint.agg(sum("c").cast("double").as("n"))
    def quant(x: Column): Column = round(x * lit(1e9)).cast("long")
    val terms = joint
      .join(broadcast(ma), "a").join(broadcast(mb), "b")
      .crossJoin(broadcast(n))
      .select(
        quant((col("c").cast("double") / col("n")) *
          log((col("c").cast("double") * col("n")) /
            (col("ca").cast("double") * col("cb").cast("double")))).as("qmi"),
        col("ca"), col("cb"), col("a"), col("b"), col("n"))
    val hA = terms.select(col("a"), col("ca"), col("n")).distinct()
      .select(quant((col("ca").cast("double") / col("n")) *
        log(col("ca").cast("double") / col("n"))).as("qa"))
      .agg(sum("qa").as("sa"))
    val hB = terms.select(col("b"), col("cb"), col("n")).distinct()
      .select(quant((col("cb").cast("double") / col("n")) *
        log(col("cb").cast("double") / col("n"))).as("qb"))
      .agg(sum("qb").as("sb"))
    terms.agg(sum("qmi").as("smi")).crossJoin(hA).crossJoin(hB)
      .select(
        round(col("smi").cast("double") / 1e9, 6).as("mi"),
        round(-col("sa").cast("double") / 1e9, 6).as("h_a"),
        round(-col("sb").cast("double") / 1e9, 6).as("h_b"))
  }

  /** Robust outlier flagging by MEDIAN ABSOLUTE DEVIATION: robust z =
    * 0.6745·|x − med| / MAD (the consistency constant makes MAD estimate
    * σ under normality; Iglewicz & Hoaglin's 3.5 cutoff is the usual
    * threshold). Mean/stddev z-scores let one corrupt magnitude inflate σ
    * and mask every other outlier — median and MAD have 50% breakdown.
    * Both statistics come from the [[sampleQuantiles]] sketch (two
    * TakeOrdered passes, 1-row broadcasts); the flagging pass is map-side
    * codegen. Adds med, mad, robust_z (6dp), outlier.
    *
    * MAD = 0 (≥50% of values identical — e.g. a mostly-constant column
    * with a few extreme corruptions, exactly where outliers are most
    * obvious) would make the MAD z-score undefined for every row. Per
    * Iglewicz & Hoaglin's recommendation the scale then falls back to the
    * MEAN absolute deviation from the median: robust_z = |x − med| /
    * (1.253314·MeanAD) (that constant makes MeanAD estimate σ under
    * normality). Only when BOTH scales are zero — a perfectly constant
    * column, which by definition has no outliers — is robust_z NULL and
    * nothing flagged. */
  def madOutliers(
      df: DataFrame,
      valueCol: String,
      idCol: Column,
      k: Int = 1024,
      zThreshold: Double = 3.5): DataFrame = {
    val med = sampleQuantiles(df, valueCol, idCol, k, Seq(0.5))
      .agg(min(col("q")).as("med"))
    val dev = df.crossJoin(broadcast(med))
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("med")))
    // one 1-row broadcast carrying both scales: the sketch median of the
    // deviations (MAD) and their exact mean (the MAD=0 fallback)
    val mad = sampleQuantiles(dev, "__dev", idCol, k, Seq(0.5))
      .agg(min(col("q")).as("mad"))
      .crossJoin(dev.agg(avg(col("__dev")).as("__mean_ad")))
    dev.crossJoin(broadcast(mad))
      .withColumn(
        "robust_z",
        when(col("mad") > 0, round(lit(0.6745) * col("__dev") / col("mad"), 6))
          .otherwise(when(col("__mean_ad") > 0,
            round(col("__dev") / (lit(1.253314) * col("__mean_ad")), 6))))
      .withColumn("outlier", coalesce(col("robust_z") > zThreshold, lit(false)))
      .drop("__dev", "__mean_ad")
  }

  /** Winsorize: clamp `valueCol` to its sketch-estimated [pLo, pHi]
    * quantiles — the outlier-robust normalization before means/regressions
    * that a single corrupt magnitude would otherwise own. Thresholds come
    * from [[sampleQuantiles]] (mergeable bottom-k-by-hash sample, NO
    * global sort), land as a 1-row broadcast, and the clamp itself is
    * map-side codegen: two passes total, corpus never sorted or shuffled.
    * Adds `<valueCol>_w` (clamped, double). */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      idCol: Column,
      pLo: Double = 0.01,
      pHi: Double = 0.99,
      k: Int = 1024): DataFrame = {
    require(pLo < pHi, "pLo must be below pHi")
    val th = sampleQuantiles(df, valueCol, idCol, k, Seq(pLo, pHi))
      .agg(
        min(when(col("p") === pLo, col("q"))).as("__lo"),
        min(when(col("p") === pHi, col("q"))).as("__hi"))
    df.crossJoin(broadcast(th))
      .withColumn(
        s"${valueCol}_w",
        // NULL stays NULL: greatest/least SKIP null operands, so without
        // the guard a NULL value would be "clamped" to the low threshold
        // — a fabricated data point
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Shannon entropy of each source's value distribution (nats, 6dp) —
    * the corpus-diversity signal: a crawl slice whose token entropy
    * collapses is template spam; one whose entropy spikes is noise.
    * H = −Σ p·ln p with each term QUANTIZED to an integer nano-nat
    * before the sum (the nbTrain discipline): summing integers makes the
    * result exact under ANY summation order, so distributed partial
    * aggregation and a sequential replay agree bit-for-bit — a raw float
    * Σ over a large vocabulary would be order-sensitive at the rounding
    * margin. One (source, value) count shuffle; totals broadcast. */
  def valueEntropy(df: DataFrame, valueCol: String, sourceCol: String): DataFrame = {
    val counts = df
      .groupBy(col(sourceCol).as("source"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("source").agg(sum("c").as("tot"))
    val p = col("c").cast("double") / col("tot").cast("double")
    counts.join(broadcast(totals), "source")
      .select(col("source"), round(p * log(p) * 1e9).cast("long").as("q"))
      .groupBy("source")
      .agg(round(-sum(col("q")).cast("double") / 1e9, 6).as("entropy"))
  }

  /** k-anonymity audit over quasi-identifier columns — the data-release
    * check that every QI combination is shared by at least k rows (a
    * group below k re-identifies its members by those attributes alone;
    * Sweeney 2002). One map-side-combinable aggregation on the QI tuple;
    * output is group-domain-sized. NULL QI values form their own groups
    * (a NULL pattern is itself identifying). */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, "need QI columns and k >= 2")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", col("n") >= k)
  }

  /** Cross-source DISTINCT-overlap matrix from KMV sketches — set algebra
    * on O(k) state instead of a corpus join. For every source pair (a, b)
    * it estimates |A|, |B|, |A ∪ B| and |A ∩ B| of the sources' distinct
    * `valueCol` sets, plus the Jaccard similarity, from each source's
    * k-minimum-values hash sketch alone (Bar-Yossef et al. 2002; the
    * theta-sketch playbook):
    *
    *   union sketch   = bottom-k of the two sketches' hash union
    *                    (bottom-k of a union IS the union's KMV sketch);
    *   |A ∪ B| est    = (k-1)·2^60 / max(union sketch), exact when < k;
    *   ρ              = union-sketch hashes present in BOTH sketches
    *                    (a uniform sample of the union, so ρ/k estimates
    *                    the intersection FRACTION);
    *   |A ∩ B| est    = (ρ/k)·|A ∪ B| est — exact when the union fits.
    *
    * Scale shape: ONE corpus aggregation builds every source's sketch with
    * O(k) mergeable state through the partial-agg shuffle (the corpus is
    * never joined against itself — compare [[graft.operators.Dedup
    * .crossSourceOverlap]], whose exact answer costs an n-gram equi-join);
    * the S² pair frame is sketch-sized algebra. With k=256 the relative
    * error of each cardinality is ~1/√(k-2) ≈ 6%. All arithmetic derives
    * from exactly-representable integers through fixed-order IEEE ops, so
    * an external engine replays the estimates bit-for-bit
    * (q_profile_kmv_overlap). */
  def sketchOverlap(
      df: DataFrame,
      valueCol: String,
      sourceCol: String,
      k: Int = 256): DataFrame =
    sketchOverlapFromState(sketchState(df, valueCol, sourceCol, k), k)

  /** Per-source KMV sketch of ONE batch — the MERGEABLE partial of
    * [[sketchOverlap]] (same maintenance contract as statsOf /
    * vocabState / driftCellCounts): ≤ sources × k longs of state,
    * set-additive under [[sketchFoldState]] because the bottom-k of a
    * union IS the bottom-k of the per-batch bottom-ks — so the overlap
    * monitor refreshes per append at batch cost and the corpus is never
    * rescanned. */
  def sketchState(
      batch: DataFrame,
      valueCol: String,
      sourceCol: String,
      k: Int = 256): DataFrame =
    batch
      .groupBy(col(sourceCol).as("source"))
      .agg(graft.functions.KmvSketch.kmvHashes(col(valueCol), k).as("sk"))

  /** Fold accumulated [[sketchState]] partials: per source, bottom-k of
    * the distinct hash union (duplicate values hash identically across
    * batches, so array_distinct reproduces the sketch's value-set
    * semantics exactly) — equal to the whole-corpus [[sketchState]]
    * however the stream was cut, law-tested. */
  def sketchFoldState(parts: DataFrame, k: Int = 256): DataFrame =
    parts
      .groupBy("source")
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))), 1, k).as("sk"))

  /** The pair-estimate algebra of [[sketchOverlap]] over PREBUILT
    * per-source sketches ((source, sk) rows from [[sketchState]] /
    * [[sketchFoldState]] or a persisted monitor state) — sketch-sized
    * arithmetic, no corpus access. */
  def sketchOverlapFromState(sk: DataFrame, k: Int): DataFrame = {
    val twoPow60 = 1152921504606846976.0
    val pairs = sk.select(col("source").as("source_a"), col("sk").as("ska"))
      .join(
        sk.select(col("source").as("source_b"), col("sk").as("skb")),
        col("source_a") < col("source_b"))
    def estCard(s: Column): Column =
      when(size(s) < k, size(s).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(twoPow60) / element_at(s, size(s)).cast("double"))
    val withU = pairs
      .withColumn("u", slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .withColumn("rho", size(array_intersect(col("u"), array_intersect(col("ska"), col("skb")))))
      .withColumn("est_a0", estCard(col("ska")))
      .withColumn("est_b0", estCard(col("skb")))
      .withColumn("est_u0", estCard(col("u")))
      // union fits in the sketch -> both sides were exhaustive -> exact
      .withColumn(
        "est_i0",
        when(size(col("u")) < k,
          size(array_intersect(col("ska"), col("skb"))).cast("double"))
          .otherwise(col("rho").cast("double") / lit(k.toDouble) * col("est_u0")))
    withU.select(
      col("source_a"), col("source_b"),
      round(col("est_a0"), 4).as("est_a"),
      round(col("est_b0"), 4).as("est_b"),
      round(col("est_u0"), 4).as("est_union"),
      round(col("est_i0"), 4).as("est_inter"),
      when(col("est_a0") + col("est_b0") - col("est_i0") > 0.0,
        round(col("est_i0") / (col("est_a0") + col("est_b0") - col("est_i0")), 6))
        .otherwise(lit(0.0)).as("jaccard_est"))
  }

  /** Mergeable quantile SKETCH: quantiles of the k-minimum-by-hash row
    * sample — the scale path [[quantiles]]' scaladoc points at, made
    * engine-portable. Exact percentile sorts every value inside the
    * aggregate; at 100 TB the sort (and the per-group value buffer) is the
    * bottleneck. Here the sample is the k rows with the smallest 60-bit
    * md5 of their row id — a KMV-style bottom-k sketch, so it is (a) a
    * uniform simple random sample of rows (the hash is value-blind), (b)
    * MERGEABLE: bottom-k of a union is bottom-k of the per-partition
    * bottom-ks, which is exactly what TakeOrdered computes — each
    * partition ships at most k rows, no global sort, and two corpus
    * sketches union+trim to the combined sketch, and (c) DETERMINISTIC:
    * any engine with md5 draws the identical sample, so the estimate is
    * reproducible bit-for-bit (q_profile_qsketch's oracle re-draws it).
    *
    * The estimate is the discrete lower quantile of the sample (index
    * floor((n-1)·p), no interpolation — integer index arithmetic agrees
    * across engines). Standard sampling bounds apply: with k=1024 the
    * p-quantile estimate's rank error is ~1.5%/sqrt(k/ p(1-p)) of N.
    * Ties in the hash order break by value so non-unique ids stay
    * deterministic. */
  def sampleQuantiles(
      df: DataFrame,
      valueCol: String,
      idCol: Column,
      k: Int = 1024,
      ps: Seq[Double] = Seq(0.1, 0.5, 0.9, 0.99)): DataFrame = {
    require(k >= 2, "need a sample of at least 2")
    val sample = df
      // NULL values must not occupy sample slots: collect_list would drop
      // them AFTER the TakeOrdered, silently shrinking the effective
      // sample and diverging from a replayer that keeps them in n
      .where(col(valueCol).isNotNull)
      .select(
        col(valueCol).cast("double").as("v"),
        graft.functions.Funcs.md5Hash60(idCol).as("h"))
      .orderBy(col("h"), col("v")) // limit over a sort = TakeOrdered: per-partition bottom-k, merged on the driver
      .limit(k)
    sample
      .agg(sort_array(collect_list(col("v"))).as("vs"))
      .select(explode(typedlit(ps)).as("p"), col("vs"))
      .select(
        col("p"),
        // empty input -> NULL estimate (element_at(_, 0) is an ANSI error)
        when(size(col("vs")) === 0, lit(null).cast("double"))
          .otherwise(round(
            element_at(
              col("vs"),
              floor((size(col("vs")) - 1).cast("double") * col("p")).cast("int") + 1),
            6)).as("q"))
  }

  /** Exact per-column quantiles, one (column, p, q) row per requested
    * percentile — ONE aggregation pass over all columns (each percentile
    * list comes back as an array, unpivoted lazily with posexplode).
    *
    * `percentile` interpolates lo + (hi-lo)·frac, the same quantile_cont
    * definition every SQL engine uses, so values hash-match an oracle
    * (rounded 6dp). Exact percentile sorts each column's values inside the
    * agg — fine for profiling runs and samples; at 100 TB the scale path
    * is approx_percentile (mergeable KLL-style sketch, same plan shape,
    * engine-specific values). */
  def quantiles(
      df: DataFrame,
      colNames: Seq[String],
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val psSql = ps.mkString(", ")
    val aggs = colNames.map(c => expr(s"percentile(`$c`, array($psSql))").as(c))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(colNames.map(c =>
        struct(lit(c).as("column"), col(c).as("qs"))): _*)).as("s"))
      .select(col("s.column").as("column"), posexplode(col("s.qs")).as(Seq("i", "q")))
      .select(
        col("column"),
        element_at(typedlit(ps), col("i").cast("int") + 1).as("p"),
        round(col("q"), 6).as("q"))
  }
}
