package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — windowed aggregation,
  * sessionization, per-window ranking, JSON property extraction. These are
  * capabilities the reference lacks (SURVEY §2.7: "Not supported: windows")
  * that Spark provides natively; the same plans run under Structured
  * Streaming by swapping read for readStream (see graft.streaming).
  *
  * Scale notes: tumbling-window aggregation shuffles once on (window, key);
  * sessionization shuffles once on user_id and then runs lag/cumsum inside
  * each partition — both are single-shuffle plans that survive 1000×.
  */
object Events {

  /** Tumbling-window counts + value sums per event_type.
    * window().start == any engine's time_bucket for the same width. */
  def windowedAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window counts per event_type: each event lands in
    * width/slide overlapping windows. Spark expands the overlap map-side
    * inside the window() expression — one shuffle on (window, key), same
    * as the tumbling case, not one per slide position. */
  def slidingAgg(
      events: DataFrame,
      width: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Gap-based sessionization: a new session starts when a user's gap from
    * the previous event exceeds `gapMinutes`. Returns per-user session
    * counts and max session length (events per session). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L,
          1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(byUser))
    withGap
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("session_events"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        max("session_events").as("max_session_events"))
  }

  /** Top-N event types per hour-of-day by count (deterministic tie-break on
    * event_type). Exercises ranking window functions. */
  def topTypesPerHour(events: DataFrame, n: Int = 3): DataFrame = {
    val counts = events
      .groupBy(hour(col("ts")).as("hour_of_day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("hour_of_day").orderBy(col("n").desc, col("event_type").asc)
    counts
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= n)
      .select(col("hour_of_day"), col("rank"), col("event_type"), col("n"))
  }

  /** JSON property extraction at query time (get_json_object — codegen'd). */
  /** CUSUM change-point detection on daily counts (Page 1954): per type,
    * S_t = max(0, S_{t−1} + (x_t − μ − slack)) with μ the integer-rounded
    * mean of the first `baselineDays` days; days where S_t > `threshold`
    * are flagged. CUSUM accumulates SMALL persistent shifts that per-day
    * z-scores ([[dailyAnomalies]]) never see — the volume-drift alarm for
    * a feed that quietly ramps.
    *
    * The recurrence is inherently sequential, but only over the per-type
    * DAILY series — calendar-bounded (years ≈ thousands of rows), never
    * data-bounded, so each type's fold is one in-memory array pass after
    * the one corpus-sized daily aggregation. All arithmetic is integer:
    * any engine replays the fold exactly (the oracle walks the same
    * recurrence with a recursive CTE). */
  def cusumChangePoints(
      events: DataFrame,
      slack: Long = 10L,
      threshold: Long = 30L,
      baselineDays: Int = 7,
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(typeCol).as("event_type"), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    // DENSIFY before folding: a day with zero events must enter the
    // recurrence as x_t = 0 (each silent day drains S by mu + slack) — a
    // gapped series would carry stale elevated S across the gap and flag
    // normal-volume days after it. Same generated scaffold as [[gapFill]].
    val bounds = events.agg(
      min(date_trunc("day", col(tsCol))).as("lo"),
      max(date_trunc("day", col(tsCol))).as("hi"))
    val scaffold = events.select(col(typeCol).as("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val dense = scaffold.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
    val withRn = dense.withColumn(
      "rn", row_number().over(Window.partitionBy("event_type").orderBy("day")))
    val mu = withRn.where(col("rn") <= baselineDays)
      .groupBy("event_type").agg(round(avg("n")).cast("long").as("mu"))
    val packed = withRn.join(broadcast(mu), "event_type")
      .groupBy("event_type", "mu")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("ds"))
    val hist = aggregate(
      col("ds"),
      struct(lit(0L).as("s"), array().cast("array<bigint>").as("hist")),
      (acc, d) => {
        val ns = greatest(
          lit(0L), acc.getField("s") + d.getField("n") - col("mu") - lit(slack))
        struct(ns.as("s"), concat(acc.getField("hist"), array(ns)).as("hist"))
      }).getField("hist")
    packed
      .withColumn("cs", hist)
      .select(
        col("event_type"), col("mu"),
        posexplode(arrays_zip(col("ds"), col("cs"))).as(Seq("i", "z")))
      .select(
        col("event_type"),
        col("z.ds.day").as("day"),
        col("z.ds.n").as("n"),
        col("mu"),
        col("z.cs").as("cusum"),
        (col("z.cs") > threshold).as("changed"))
  }

  /** Gap-filled hourly series per event type: every hour between the
    * corpus bounds exists for every type — observed hours carry their
    * count and 6dp mean value, silent hours carry n=0 and the LAST
    * observed mean carried forward (LOCF — the standard sensor/metric
    * resample before downstream models that assume a dense grid).
    *
    * Scale shape: one (type, hour) aggregation over the corpus; the
    * scaffold is a generated sequence (types × hours — report-sized, no
    * driver loop); LOCF is a running window per type whose partition is
    * calendar-bounded (hours in the time range), never data-bounded. */
  def gapFill(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hour = date_trunc("hour", col(tsCol))
    val hourly = events
      .groupBy(col(typeCol).as("event_type"), hour.as("hour"))
      .agg(count(lit(1)).as("n0"), round(avg(col(valueCol)), 6).as("v"))
    val bounds = events.agg(
      min(date_trunc("hour", col(tsCol))).as("lo"),
      max(date_trunc("hour", col(tsCol))).as("hi"))
    val scaffold = events.select(col(typeCol).as("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    scaffold.join(hourly, Seq("event_type", "hour"), "left")
      .select(
        col("event_type"), col("hour"),
        coalesce(col("n0"), lit(0L)).as("n"),
        last(col("v"), ignoreNulls = true)
          .over(Window.partitionBy(col("event_type")).orderBy(col("hour"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("locf_value"))
  }

  /** OLAP rollup: (event_type, day) detail, per-type subtotals, and the
    * grand total from ONE aggregation pass — Catalyst expands the rollup
    * to grouping sets and every level partial-aggregates map-side, so the
    * pre-aggregated report cube that would otherwise be three scans is one
    * shuffle whose input is already collapsed per partition. `gid` is the
    * grouping bitmask (0 = detail, 1 = day rolled up, 3 = grand total) —
    * it distinguishes a NULL data value from a rolled-up level, which no
    * column-NULL inspection can. Sum is rounded 2dp inside the query (the
    * q_agg float-sum discipline). */
  def rollupDaily(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    events
      .select(
        col(typeCol).as("event_type"),
        date_format(col(tsCol), "yyyy-MM-dd").as("day"),
        col(valueCol).as("v"))
      .rollup(col("event_type"), col("day"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        round(sum(col("v")), 2).as("sum_value"))

  def jsonPropStats(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg("k"), 6).as("avg_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))

  /** As-of join: for every left row, attach the most recent right row with
    * right.time <= left.time within the same `on` partition (left outer:
    * nulls when no prior right row exists).
    *
    * Composed, not custom (SURVEY §7.4 preference: built-ins first): tag
    * both sides, union, and carry the right payload forward with
    * last(ignoreNulls) over a (time, side) ordered window — right rows sort
    * before left rows at equal time, giving `<=` semantics. ONE shuffle on
    * the partition keys, no range explosion, no custom SparkPlan; the
    * sort-merge as-of any native engine does is exactly what this window
    * executes per partition. */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      outPrefix: String = "asof_"): DataFrame = {
    val keyCols = on :+ timeCol
    val leftPayload = left.columns.filterNot(keyCols.contains)
    val lAligned = left
      .select(
        keyCols.map(col) ++ Seq(lit(1).as("__is_left")) ++
          leftPayload.map(col) ++
          rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rAligned = right
      .select(
        keyCols.map(col) ++ Seq(lit(0).as("__is_left")) ++
          leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(col(timeCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(lAligned.unionByName(rAligned)) { (df, c) =>
      df.withColumn(s"$outPrefix$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .where(col("__is_left") === 1)
      .select(left.columns.map(col) ++ rightCols.map(c => col(s"$outPrefix$c")): _*)
  }

  /** Ordered conversion funnel: one row per step with the number of users
    * whose earliest completion of step i+1 is STRICTLY after their
    * earliest completion of step i (the classic signup→view→purchase
    * shape).
    *
    * ONE events scan, one shuffle: funnel-relevant events fold per user
    * into the frontier-chain timestamps in a single pass —
    * sort_array(collect_list(ts, step)) then an `aggregate` lambda that,
    * walking events in time order, fills slot i with the first step-i
    * event strictly after (and within `maxGap` of) slot i-1. Walking in
    * ascending time makes "first qualifying" = "min qualifying", which is
    * exactly the per-step min-after-frontier chain — but computed in O(d)
    * per event instead of d separate event scans (the previous shape
    * re-derived frontiers 1..i per step: O(d²) scans). Per-user state is
    * that user's funnel events only — bounded by the funnel's own
    * semantics, never the corpus. */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      /** conversion window: step i+1 must land within this interval after
        * step i (e.g. "6 hours"); null = unbounded */
      maxGap: String = null,
      idCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val d = steps.size
    val tsType = events.schema(tsCol).dataType.sql
    // step names may REPEAT (login -> purchase -> login), so events carry a
    // distinct-type id and each slot declares which type id it accepts —
    // mapping an event to a single slot index would starve all but one of
    // the duplicates. Type mapping uses the Column API (names never reach
    // SQL text); only the numeric slot/type ids are spliced into the fold.
    val distinctTypes = steps.distinct
    val typeId = distinctTypes.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(typeCol) === lit(s), lit(i)).otherwise(acc)
    }
    val slotTid = steps.map(distinctTypes.indexOf)
    val perUser = events
      .where(col(typeCol).isin(steps: _*))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("t"), typeId.as("s")))).as("__evs"))
    val gapCond =
      if (maxGap == null) "" else s" AND e.t <= acc[i-1] + INTERVAL '$maxGap'"
    // `i = 0 OR …` short-circuits, so acc[i-1] is never indexed at i = 0
    val fold = expr(
      s"""aggregate(__evs, array_repeat(CAST(NULL AS $tsType), $d),
         |  (acc, e) -> transform(acc, (v, i) ->
         |    CASE WHEN array(${slotTid.mkString(", ")})[i] = e.s AND v IS NULL
         |           AND (i = 0 OR (acc[i-1] IS NOT NULL AND e.t > acc[i-1]$gapCond))
         |         THEN e.t ELSE v END))""".stripMargin)
    val reached = perUser.select(fold.as("__acc"))
    val counts = {
      val aggs = (0 until d).map(i =>
        sum(when(col("__acc").getItem(i).isNotNull, 1L).otherwise(0L)).as(s"__n$i"))
      reached.agg(aggs.head, aggs.tail: _*)
    }
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(
        lit(i + 1).as("step"),
        lit(s).as("event_type"),
        coalesce(col(s"__n$i"), lit(0L)).as("n_users"))
    }: _*)).as("r")).select(col("r.step"), col("r.event_type"), col("r.n_users"))
  }

  /** Daily-volume anomaly detection: each (event_type, day) count is scored
    * against that type's own history as a z-score, |z| ≥ threshold flags the
    * day. The variance is computed from EXACT integer sums (Σn, Σn² as
    * longs, σ = √(Σn²/d − μ²)) rather than a streaming stddev aggregate, so
    * the score is bit-identical regardless of partitioning or engine — the
    * determinism contract every float in this repo follows.
    *
    * Scale shape: the only corpus-sized work is the daily count (one
    * shuffle); the per-type stats frame is days×types tiny and broadcasts
    * back. Flat history (σ = 0) scores 0, not NaN. */
  def dailyAnomalies(events: DataFrame, zThreshold: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(
        col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily
      .groupBy("event_type")
      .agg(
        sum("n").as("s1"),
        sum(col("n") * col("n")).as("s2"),
        count(lit(1)).as("d"))
      .withColumn("mu", col("s1").cast("double") / col("d"))
      .withColumn(
        "sigma",
        sqrt(greatest(
          col("s2").cast("double") / col("d") - col("mu") * col("mu"),
          lit(0.0))))
      .select("event_type", "mu", "sigma")
    daily
      .join(broadcast(stats), Seq("event_type"))
      .withColumn(
        "z",
        when(col("sigma") > 0, round((col("n") - col("mu")) / col("sigma"), 6))
          .otherwise(lit(0.0)))
      .select(
        col("event_type"),
        col("day"),
        col("n"),
        col("z"),
        (abs(col("z")) >= zThreshold).as("is_anomaly"))
  }

  /** First-order Markov transition matrix over each user's event sequence:
    * count and probability of every (prev_type → next_type) step, ordered by
    * (ts, event_id) within user. The behavioral-model summary (and a cheap
    * bot-detector: improbable transition chains).
    *
    * Scale shape: one shuffle on user_id for the lag window, then the
    * transition frame is types² tiny — the per-prev totals broadcast back
    * for the probability. Counts are longs; the probability is one exact
    * division rounded 6dp. */
  def typeTransitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .where(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type").as("next_type"))
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy("prev_type").agg(sum("n").as("total"))
    steps
      .join(broadcast(totals), Seq("prev_type"))
      .select(
        col("prev_type"),
        col("next_type"),
        col("n"),
        round(col("n").cast("double") / col("total"), 6).as("p"))
  }

  /** Change-detection with lag: count of events whose value strictly rose
    * versus the user's previous event (deterministic (ts, event_id) order). */
  def risingValueCounts(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_value", lag(col("value"), 1).over(byUser))
      .where(col("prev_value").isNotNull && col("value") > col("prev_value"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_rising"))
  }

  /** Weekly cohort retention: users are cohorted by the week of their FIRST
    * event, and each (cohort, week-offset) cell counts how many of that
    * cohort were active offset weeks later — the standard product-analytics
    * retention matrix, plus the rate against cohort size. Week keys are
    * epoch seconds of the truncated week start (the engine-portable integer
    * convention every time bin in this repo uses).
    *
    * Scale shape: three aggregations all keyed on user_id (first-event
    * cohort, distinct active weeks, cohort join) — one hash-partitioning
    * reused across stages, then the matrix itself is weeks×offsets tiny and
    * the cohort-size join broadcasts. No windows, no collect. */
  def retention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val week = (c: org.apache.spark.sql.Column) => unix_timestamp(date_trunc("week", c))
    val cohort = events
      .groupBy(col(userCol))
      .agg(week(min(col(tsCol))).as("cohort_week"))
    val active = events
      .select(col(userCol), week(col(tsCol)).as("act_week"))
      .distinct()
    val sz = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    active
      .join(cohort, userCol)
      // offset by CALENDAR week distance (datediff of the truncated dates
      // / 7), not epoch-seconds / 604800: in a DST session timezone two
      // week starts can be 604800±3600 s apart, and Spark's cast truncates
      // where other engines round — date arithmetic has no such edge
      .select(
        col("cohort_week"),
        (datediff(
          to_date(timestamp_seconds(col("act_week"))),
          to_date(timestamp_seconds(col("cohort_week")))) / 7)
          .cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users")) // one row per user post-distinct
      .join(broadcast(sz), Seq("cohort_week"))
      .select(
        col("cohort_week"),
        col("week_offset"),
        col("n_users"),
        col("cohort_size"),
        round(col("n_users") / col("cohort_size").cast("double"), 6).as("retention"))
  }

  /** Time-decayed trending scores per event type — "what's hot NOW",
    * where a day's count contributes n / 2^⌊age_days / halfLifeDays⌋ and
    * age counts back from the newest day in the data.
    *
    * The decay base is deliberately 2, never e: every addend is n·2⁻ᵏ, a
    * dyadic rational a double represents EXACTLY — no libm exp()/pow()
    * last-ulp platform variance enters the addends. The SUM itself is only
    * exact while log2(max n) + the deepest decay bucket stays inside the
    * 53-bit mantissa, so the score still rounds to 6dp like every other
    * float output (a corpus spanning many half-lives with large daily
    * counts would otherwise leak partial-sum-order ulps into a
    * hash-compared column). Corpus-sized work is one (type, day) count
    * aggregate; the weighting and final sum run over the tiny types×days
    * frame with the 1-row max-day broadcast. */
  def decayedTypeCounts(events: DataFrame, halfLifeDays: Int = 7): DataFrame = {
    require(halfLifeDays >= 1, "halfLifeDays must be positive")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val latest = broadcast(daily.agg(max(col("day")).as("max_day")))
    daily
      .crossJoin(latest)
      .select(
        col("event_type"),
        col("n"),
        (col("n").cast("double") /
          pow(lit(2.0), floor(datediff(col("max_day"), col("day")) / lit(halfLifeDays))))
          .as("c"))
      .groupBy("event_type")
      .agg(sum(col("n")).as("n_total"), round(sum(col("c")), 6).as("trend_score"))
  }
}
