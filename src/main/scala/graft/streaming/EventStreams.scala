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
// Serializable: the stateful closures reference the shared usOf/tsOfUs
// helpers, so tasks capture the module itself.
object EventStreams extends Serializable {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Exact epoch-microseconds of a timestamp — via the Instant, not
    * getTime (millis), so state arithmetic keeps the parquet MICROS
    * precision. */
  private def usOf(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** The exact inverse of [[usOf]]: a timestamp rebuilt from epoch
    * micros without truncating to millis, so emitted rows carry the
    * same MICROS values the batch twins emit. */
  private def tsOfUs(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

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

  case class CleanDoc(doc_id: Long, content_hash: String,
                      pre_reason: String, quality_score: Double)
  case class CleanLabel(doc_id: Long, reason: String, keep: Boolean,
                        quality_score: Double)

  /**
   * Streaming corpus cleaning (the incremental twin of
   * Pipeline.cleanCorpus): the stateless gates — too_short /
   * non_english / low_quality, first failing rule wins — run map-side
   * through the shared cleanGates columns; only the duplicate rule
   * needs state, one cell per content hash holding the cluster
   * representative (first arrival wins; within a micro-batch the
   * lowest doc_id, so a single-batch run agrees exactly with the
   * batch twin's min-doc_id representative). Every arriving document
   * is labeled exactly once, in arrival order — the always-on form of
   * the pre-training gate.
   */
  def cleanCorpusStream(docs: DataFrame, minTokens: Int = 10,
                        minQuality: Double = 0.3, langThreshold: Double = 0.05)
                       (implicit spark: SparkSession): Dataset[CleanLabel] = {
    import spark.implicits._
    graft.operators.Pipeline
      .cleanGates(docs, minTokens, minQuality, langThreshold)
      .as[CleanDoc]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Long, CleanLabel](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[CleanDoc], state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(_.doc_id)
          val rep = state.getOption.getOrElse(sorted.head.doc_id)
          state.update(rep)
          sorted.iterator.map { d =>
            val reason = if (d.doc_id != rep) "duplicate" else d.pre_reason
            CleanLabel(d.doc_id, reason, reason == "ok", d.quality_score)
          }
      }
  }

  case class BandedDoc(doc_id: Long, sig: Seq[Long], band: Int, bucket: Long)
  case class BucketSigs(ids: Seq[Long], sigs: Seq[Seq[Long]])
  case class NearDupPair(doc_a: Long, doc_b: Long, jaccard_est: Double)

  /**
   * Streaming MinHash near-dup pairs (the incremental twin of
   * Dedup.minhashLsh): signatures and band buckets are computed
   * map-side by the same codegen'd kernels as the batch twin; state is
   * one capped member list per (band, bucket) — each arriving document
   * is compared against the bucket's stored signatures, emitting pairs
   * with estimated Jaccard >= threshold.
   *
   * Semantics: a pair is emitted when its LATER document arrives
   * (first `maxBucketSize` arrivals per bucket are retained as
   * comparison targets — the streaming form of the batch cap, which
   * stops one boilerplate cluster from exploding state). Within a
   * micro-batch, arrivals process in doc_id order, so a single-batch
   * run emits exactly the batch twin's pairs (when no bucket
   * overflows). A pair sharing several band buckets is emitted once
   * PER matching band (at-least-once contract — the estimate is
   * derived from the full signatures, so duplicates are identical
   * rows; consumers dedup on (doc_a, doc_b), exactly as the batch
   * twin's dropDuplicates does).
   *
   * At scale: state is at most maxBucketSize signatures per non-empty
   * bucket, sharded across executors by the groupByKey hash; the
   * shuffle carries (band, bucket, sig) per document — numBands rows
   * of numHashes longs, no text.
   */
  def minhashPairStream(docs: DataFrame, numHashes: Int = 64, numBands: Int = 16,
                        threshold: Double = 0.5, seed: Long = 42L,
                        maxBucketSize: Int = 64)
                       (implicit spark: SparkSession): Dataset[NearDupPair] = {
    import spark.implicits._
    import graft.GraftFunctions.minhashSig
    val rowsPerBand = numHashes / numBands
    // Same short-doc exclusion as the batch twin (QUERY SPEC there):
    // sentinel signatures are never indexed.
    val banded = docs
      .select(col("doc_id"), minhashSig(col("text"), 3, numHashes, seed).as("sig"))
      .filter(element_at(col("sig"), 1) =!= lit(Long.MaxValue))
      .select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band", "bucket")))
      .as[BandedDoc]
    banded
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketSigs, NearDupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketSigs]) =>
          val arrivals = rows.toSeq.sortBy(_.doc_id)
          var members = state.getOption.getOrElse(BucketSigs(Nil, Nil))
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
          for (d <- arrivals) {
            members.ids.zip(members.sigs).foreach { case (oid, osig) =>
              if (oid != d.doc_id) {
                val agree = osig.iterator.zip(d.sig.iterator).count { case (x, y) => x == y }
                val est = BigDecimal(agree.toDouble / numHashes)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (est >= threshold)
                  out += NearDupPair(math.min(oid, d.doc_id), math.max(oid, d.doc_id), est)
              }
            }
            if (members.ids.size < maxBucketSize)
              members = BucketSigs(members.ids :+ d.doc_id, members.sigs :+ d.sig)
          }
          state.update(members)
          out.iterator
      }
  }

  case class FunnelProgress(user_id: Long, stage: Int, times: Seq[Long])

  /**
   * Streaming conversion funnel (the incremental twin of
   * Events.funnel): one state cell per user holding the first-reach
   * time of each stage (microseconds; -1 = unreached). An event
   * advances stage i when its stage-(i-1) time is set and strictly
   * earlier. A progress row is emitted whenever a batch changes a
   * user's state — the per-user progress log; consumers read the
   * latest row per user.
   *
   * Ordering contract: events are folded in (ts, event_id) order
   * WITHIN a micro-batch; across batches, arrival order is processing
   * order (the sessionizeStream contract). When waves arrive in event-
   * time order the final state equals the batch twin exactly.
   */
  def funnelStream(events: Dataset[Event],
                   stages: Seq[String] = Seq("view", "click", "purchase"))
                  (implicit spark: SparkSession): Dataset[FunnelProgress] = {
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[Long], FunnelProgress](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Seq[Long]]) =>
          val times = state.getOption.getOrElse(Seq.fill(stages.size)(-1L)).toArray
          val before = times.toSeq
          def us(e: Event): Long = usOf(e.ts)
          val sorted = rows.toSeq
            .filter(e => stageIdx.contains(e.event_type))
            .sortBy(e => (us(e), e.event_id))
          for (e <- sorted) {
            val i = stageIdx(e.event_type)
            val t = us(e)
            val prevOk = i == 0 || (times(i - 1) >= 0L && times(i - 1) < t)
            if (prevOk && (times(i) < 0L || t < times(i))) times(i) = t
          }
          val after = times.toSeq
          state.update(after)
          if (after != before)
            Iterator.single(FunnelProgress(userId, after.count(_ >= 0L), after))
          else Iterator.empty
      }
  }

  case class AsofState(rts: Long, rid: Long)
  case class AsofOut(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                     matched_id: Option[Long],
                     matched_ts: Option[java.sql.Timestamp],
                     lag_us: Option[Long])

  /**
   * Streaming as-of enrichment: each arriving `leftType` event is
   * matched to the MOST RECENT `rightType` event of the same user at
   * or before its timestamp — the streaming twin of
   * [[graft.operators.Events.asofJoin]] (attribution at ingest time,
   * enriching purchases with their latest preceding view as they
   * arrive). State per user is ONE (ts, id) pair — constant-size, no
   * watermark needed; the right side folds into state, never a
   * buffered join.
   *
   * Fold order matches the batch window exactly: within a micro-batch
   * (ts, side, event_id) with right rows ahead of left on ties —
   * "at or before" is inclusive, and right-side ties resolve to the
   * highest event_id. When waves arrive in event-time order the
   * emitted rows equal the batch twin's non-null-padded output
   * (the funnel/sessionize streaming contract).
   */
  def asofStream(events: Dataset[Event], leftType: String = "purchase",
                 rightType: String = "view")
                (implicit spark: SparkSession): Dataset[AsofOut] = {
    import spark.implicits._
    def us(e: Event): Long = usOf(e.ts)
    events
      .filter(e => e.event_type == leftType || e.event_type == rightType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[AsofState]) =>
          val sorted = rows.toSeq.sortBy(e =>
            (us(e), if (e.event_type == rightType) 0 else 1, e.event_id))
          var st = state.getOption.getOrElse(AsofState(Long.MinValue, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
          for (e <- sorted) {
            if (e.event_type == rightType) {
              // keep the max (ts, id) right event — late stragglers
              // below the current match never regress it
              if (us(e) > st.rts || (us(e) == st.rts && e.event_id > st.rid))
                st = AsofState(us(e), e.event_id)
            } else {
              if (st.rid == Long.MinValue)
                out += AsofOut(e.event_id, userId, e.ts, None, None, None)
              else
                out += AsofOut(e.event_id, userId, e.ts, Some(st.rid),
                  Some(tsOfUs(st.rts)), Some(us(e) - st.rts))
            }
          }
          state.update(st)
          out.iterator
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

    def tsUs(t: java.sql.Timestamp): Long = usOf(t)

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
                tsOfUs(st.start), tsOfUs(st.lastTs), st.nEvents, st.sumValue)
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
