package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming twins of graft.operators.Events
 * (SURVEY.md paragraph 2 F). The batch versions are the oracle-verified
 * source of truth; these add incremental state handling: watermarked
 * tumbling windows and flatMapGroupsWithState sessionization — the
 * streaming analog of the reference's background index maintenance
 * (/root/reference/services/background_tasks.py:15-60, which
 * incrementally folds new chunks into per-library indexes).
 */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(sessionSeq: Long, lastTs: Long, start: Long,
                          nEvents: Long, sumValue: Double)

  case class SessionOut(user_id: Long, session_seq: Long,
                        session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp,
                        n_events: Long, sum_value: Double)

  /**
   * Watermarked tumbling-window aggregation over a streaming source.
   * At scale: state is per (window, event_type); the watermark bounds
   * state size, partial aggregation happens map-side per micro-batch.
   */
  def windowAggStream(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double"), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  case class DocKeyed(doc_id: Long, content_hash: String)
  case class DedupLabel(doc_id: Long, content_hash: String,
                        cluster_rep: Long, is_duplicate: Boolean)

  /**
   * Streaming exact dedup with labeling (the incremental twin of
   * Dedup.exact): one state cell per content hash holding the cluster
   * representative; every arriving document is emitted with its
   * representative and a duplicate flag, so downstream filters keep
   * `!is_duplicate` rows without a second pass.
   *
   * Semantics: FIRST ARRIVAL wins (the streaming contract — an
   * already-emitted winner is never retracted); within a micro-batch,
   * the lowest doc_id wins for determinism, which makes a single-batch
   * run agree exactly with the batch twin's min(doc_id) representative.
   * At scale: state is one (hash -> long) entry per distinct content —
   * the same footprint as the reference's in-memory content index, but
   * sharded across executors by the groupByKey hash.
   */
  def dedupLabelStream(docs: Dataset[DocKeyed])
                      (implicit spark: SparkSession): Dataset[DedupLabel] = {
    import spark.implicits._
    docs
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Long, DedupLabel](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (hash: String, rows: Iterator[DocKeyed], state: GroupState[Long]) =>
          val ids = rows.map(_.doc_id).toSeq.sorted
          val rep = state.getOption.getOrElse(ids.min)
          state.update(rep)
          ids.iterator.map(id => DedupLabel(id, hash, rep, id != rep))
      }
  }

  /**
   * Gap-based sessionization with explicit state: one SessionState per
   * user; a session closes (emits) when the gap exceeds `gapMinutes`.
   * Emits closed sessions (Append mode). The final open session per
   * user stays in state — identical semantics to the batch twin minus
   * the still-open tail.
   */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30)
                      (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def tsUs(t: java.sql.Timestamp): Long = t.getTime * 1000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          for (e <- sorted) {
            val t = tsUs(e.ts)
            if (st.nEvents == 0L) {
              st = SessionState(st.sessionSeq, t, t, 1L, e.value)
            } else if (t - st.lastTs > gapUs) {
              out += SessionOut(userId, st.sessionSeq,
                new java.sql.Timestamp(st.start / 1000L),
                new java.sql.Timestamp(st.lastTs / 1000L), st.nEvents, st.sumValue)
              st = SessionState(st.sessionSeq + 1L, t, t, 1L, e.value)
            } else {
              st = st.copy(lastTs = t, nEvents = st.nEvents + 1L,
                sumValue = st.sumValue + e.value)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
