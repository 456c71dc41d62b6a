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
}
