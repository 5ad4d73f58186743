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
   * As-of join: each `leftType` event is matched to the MOST RECENT
   * `rightType` event of the same user at or before its timestamp —
   * the attribution/backfill join ("which view led to this
   * purchase"), the canonical operator Spark has no native join type
   * for. A naive range join explodes to |L|x|R| per user before
   * picking the max; this plans as ONE window pass instead: union
   * both sides, sort per user by (ts, side, event_id) — right rows
   * ahead of left on ties, so "at or before" is inclusive — and carry
   * the last non-null right payload forward. One shuffle on user_id,
   * linear in |L|+|R|, no candidate blowup at any scale; ties among
   * right rows at one timestamp resolve deterministically to the
   * highest event_id (the last in sort order, in both engines).
   */
  def asofJoin(events: DataFrame, leftType: String = "purchase",
               rightType: String = "view"): DataFrame = {
    val u = events.filter(col("event_type").isin(leftType, rightType))
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === leftType).cast("int").as("is_l"),
        when(col("event_type") === rightType,
          struct(col("ts").as("rts"), col("event_id").as("rid"))).as("r"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_l").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("m", last(col("r"), ignoreNulls = true).over(w))
      .filter(col("is_l") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("m.rid").as("matched_id"), col("m.rts").as("matched_ts"),
        (unix_micros(col("ts")) - unix_micros(col("m.rts"))).as("lag_us"))
      .orderBy(col("event_id").asc)
  }

  /**
   * Bounded range join: every (`leftType`, `rightType`) event pair of
   * the same user with the right event inside the `lagSeconds` window
   * at-or-before the left one — the pairwise form of [[asofJoin]]
   * (attribution wants ALL touchpoints in the lookback, not just the
   * latest). Plans as an equi-join on user_id with the time band as a
   * residual predicate: one co-partitioned shuffle, pair fan-out
   * bounded by per-user activity inside the window — never |L|x|R|.
   * Integer microsecond arithmetic end to end.
   */
  def rangeJoin(events: DataFrame, leftType: String = "purchase",
                rightType: String = "view", lagSeconds: Long = 3600L): DataFrame = {
    require(lagSeconds >= 0, "lagSeconds must be non-negative")
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col("user_id"),
        unix_micros(col("ts")).as("l_us"), col("ts").as("l_ts"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        unix_micros(col("ts")).as("r_us"))
    l.join(r, col("user_id") === col("r_user") &&
        col("r_us") <= col("l_us") &&
        col("r_us") >= col("l_us") - lagSeconds * 1000000L)
      .select(col("l_id"), col("r_id"), col("user_id"), col("l_ts"),
        (col("l_us") - col("r_us")).as("lag_us"))
      .orderBy(col("l_id").asc, col("r_id").asc)
  }

  /**
   * Rolling daily aggregates: per event type and day, the trailing
   * `windowDays`-day event count and value sum — the moving-average
   * view behind every ops dashboard. Aggregates to compact (type,
   * day) keys FIRST (map-side partial, ~|types|x|days| rows), then
   * one RANGE window over the integer day ordinal per type — the
   * window pass touches the tiny daily table, never the raw events,
   * so the rolling layer costs nothing more at 100 TB than at 1 GB.
   * Exactness: counts are integral; value sums roll up in
   * decimal(28,6) and cast to double once at the end.
   */
  def rolling(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).as("day_value"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(datediff(col("day"), lit("1970-01-01").cast("date")))
      .rangeBetween(-(windowDays - 1L), 0L)
    daily
      .withColumn("roll_events", sum(col("n_events")).over(w))
      .withColumn("roll_days", count(lit(1)).over(w))
      .withColumn("roll_value",
        round(sum(col("day_value")).over(w).cast("double"), 4))
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("n_events"), col("roll_events"), col("roll_days"), col("roll_value"))
      .orderBy(col("event_type").asc, col("day").asc)
  }

  /**
   * Per-type value distribution: count, min/max, exact decimal mean,
   * and exact interpolated p50/p90/p99 — the latency-style percentile
   * report, over event values. The percentile aggregate shuffles
   * per-type sorted buffers; group count = |event types|, so the sort
   * memory is per-type daily volume, not corpus-wide. At true 100 TB
   * per-type volume set `spark.graft.percentiles=approx` to swap in
   * the bounded-memory t-digest (default stays exact for oracle
   * parity — see GraftFunctions.percentileAgg). Mean is one exact
   * decimal sum divided once; percentiles interpolate over sorted
   * doubles identically in both engines, rounded to 1e-6.
   */
  def valuePercentiles(events: DataFrame): DataFrame = {
    val quant6 = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1.0e6) + lit(0.5e0)) / lit(1.0e6)
    // spark.graft.percentiles=exact|approx (GraftFunctions.percentileAgg)
    val pctl = (c: String, p: Double) =>
      graft.GraftFunctions.percentileAgg(events.sparkSession, c, p)
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(min(col("value")), 6).as("min_value"),
        round(max(col("value")), 6).as("max_value"),
        quant6(sum(col("value").cast("decimal(28,6)")).cast("double") /
          count(lit(1))).as("mean_value"),
        quant6(pctl("value", 0.5)).as("p50_value"),
        quant6(pctl("value", 0.9)).as("p90_value"),
        quant6(pctl("value", 0.99)).as("p99_value"))
      .orderBy(col("event_type").asc)
  }

  /**
   * Cohort retention: users grouped by their first-activity day
   * (cohort); for each (cohort, day-offset) cell, how many of the
   * cohort's users were active that day. ONE corpus-scale shuffle:
   * per-user distinct active days collect map-side into a bounded set
   * (its size is the report's DAY SPAN, never the event count), the
   * cohort is the set's minimum, and the offset cells explode from
   * the tiny set — replacing the distinct + cohort-aggregate + join
   * chain (three corpus-scale shuffles) the textbook formulation
   * pays. At 100 TB the difference is the event table crossing the
   * wire once instead of three times.
   */
  def retention(events: DataFrame, maxOffsetDays: Int = 14): DataFrame = {
    val perUser = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("day")).as("days"))
    perUser
      .select(array_min(col("days")).as("cohort_day"),
        explode(col("days")).as("day"))
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
