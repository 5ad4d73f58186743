package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics (SURVEY.md paragraph 2 F). These are the batch twins
 * of the Structured Streaming queries in graft.streaming.EventStreams —
 * identical logical plans, verifiable against a SQL oracle; the
 * streaming versions add watermark + incremental state.
 */
object Events {

  /** Tumbling 1-hour windows per event type. */
  def windowAgg(events: DataFrame): DataFrame = {
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double"), 4).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("n_users"))
      .orderBy(col("window_start").asc, col("event_type").asc)
  }

  /**
   * Daily volume anomalies per event type: days whose event count
   * exceeds `factor` x the type's mean daily count — the pipeline-
   * health gate that flags ingestion spikes/backfills before they
   * skew a training mix. Two aggregations on compact (type, day)
   * keys; the per-type stats table broadcasts. Cross-engine
   * deterministic by construction: counts are integral, the mean is
   * one exact integer sum divided once, and the compare runs on that
   * single double — no order-dependent float accumulation (stddev
   * would not replay bit-identically across engines).
   */
  def anomalies(events: DataFrame, factor: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("total"), count(lit(1)).as("n_days"))
    daily.join(broadcast(stats), "event_type")
      .withColumn("mean_daily", col("total").cast("double") / col("n_days"))
      .filter(col("n_events") > col("mean_daily") * factor)
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("n_events"), round(col("mean_daily"), 4).as("mean_daily"))
      .orderBy(col("event_type").asc, col("day").asc)
  }

  /**
   * Cohort retention: users grouped by their first-activity day
   * (cohort); for each (cohort, day-offset) cell, how many of the
   * cohort's users were active that day. Two aggregations on compact
   * keys — (user, day) distinct activity, then the cohort matrix; the
   * cohort day joins back via a broadcast-size per-user table at any
   * realistic user count, or a co-partitioned shuffle join beyond.
   */
  def retention(events: DataFrame, maxOffsetDays: Int = 14): DataFrame = {
    val activity = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = activity.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    activity.join(cohorts, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= maxOffsetDays)
      // ISO string for the cohort key: cross-engine comparators render
      // DATE differently (date vs midnight timestamp)
      .groupBy(col("cohort_day").cast("string").as("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day").asc, col("day_offset").asc)
  }

  /**
   * Ordered conversion funnel: per user, the first time each stage is
   * reached STRICTLY after the previous stage (a purchase before the
   * first view does not count). One pass: running per-stage minima as
   * window columns over the (ts, event_id)-ordered user timeline, then
   * a single per-user aggregate — one shuffle on user_id regardless of
   * stage count, no self-joins (the naive per-stage join chain would
   * shuffle the events table once per stage).
   */
  def funnel(events: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // candidate c(i) = this event reaches stage i (right type, strictly
    // after r(i-1), the earliest time stage i-1 was reached so far);
    // r(i) = running min of c(i). Built column by column since each
    // candidate references the previous running minimum.
    val candCols = stages.zipWithIndex.foldLeft(events) {
      case (df, (stage, i)) =>
        val cand =
          if (i == 0) when(col("event_type") === stage, col("ts"))
          else when(col("event_type") === stage && col(s"r${i - 1}") < col("ts"), col("ts"))
        df.withColumn(s"c$i", cand)
          .withColumn(s"r$i", min(col(s"c$i")).over(w))
    }
    val stageTimes = stages.indices.map(i => min(col(s"c$i")).as(s"t_${stages(i)}"))
    val reached = stages.indices.map(i =>
      when(min(col(s"c$i")).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    candCols.groupBy(col("user_id"))
      .agg(stageTimes.head, stageTimes.tail :+ reached.cast("int").as("stage"): _*)
      .orderBy(col("user_id").asc)
  }

  /**
   * Gap-based sessionization: a new session starts after `gapMinutes`
   * of inactivity. Window-function formulation (lag + running sum) —
   * one shuffle on user_id; the streaming twin uses
   * flatMapGroupsWithState.
   */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val newSession = when(
      unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
        > gapMinutes * 60L * 1000000L, 1).otherwise(0)
    events
      .withColumn("is_new", newSession)
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double"), 4).as("sum_value"))
      .orderBy(col("user_id").asc, col("session_seq").asc)
  }
}
