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
