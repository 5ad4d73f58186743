package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events
import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = SparkTestSession.sfDir

  // The stream source is REWRITTEN from the batch-normalized frame
  // (Tables.load absorbs whatever physical ts type the driver's
  // testdata generation used this round — nanos-long or TIMESTAMP_NTZ),
  // so the stream schema derives from the frame instead of hardcoding
  // the parquet physical type: the known testdata schema-drift hazard
  // cannot silently skew these specs again.
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream")
    Tables.load(spark, sfDir, "events")
      .write.mode("overwrite").parquet(dir.toString)
    dir.toString
  }

  private lazy val rawSchema: StructType =
    Tables.load(spark, sfDir, "events").schema

  private def streamingEvents =
    spark.readStream.schema(rawSchema).parquet(streamDir)

  test("streaming window agg matches batch twin") {
    val q = EventStreams.windowAggStream(streamingEvents)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("win_out")
      .select("window_start", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = Events.windowAgg(Tables.load(spark, sfDir, "events"))
      .select("window_start", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming dedup labels every doc once and agrees with the batch twin") {
    import spark.implicits._
    implicit val s = spark
    val docsDir = Files.createTempDirectory("graft-dedup-stream").toString
    val docs = Tables.load(spark, sfDir, "documents")
    docs.write.mode("overwrite").parquet(docsDir)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val keyed = spark.readStream.schema(schema).parquet(docsDir)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .as[EventStreams.DocKeyed]
    val q = EventStreams.dedupLabelStream(keyed)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("dedup_out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep"),
        r.getAs[Boolean]("is_duplicate")))
    assert(streamed.length == docs.count(), "every doc labeled exactly once")
    // single-batch run: representatives = the batch twin's min(doc_id)
    val batchReps = operators.Dedup.exact(docs).collect()
      .map(r => r.getAs[String]("content_hash") -> r.getAs[Long]("min_doc_id")).toMap
    val streamedByHash = spark.table("dedup_out").collect()
      .map(r => r.getAs[String]("content_hash") -> r.getAs[Long]("cluster_rep")).toMap
    assert(streamedByHash == batchReps)
    assert(streamed.forall { case (id, rep, dup) => dup == (id != rep) })
  }

  test("streaming corpus cleaning labels converge to the batch twin across batches") {
    import spark.implicits._
    implicit val s = spark
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = Files.createTempDirectory("graft-clean-stream").toString
    // Waves split by ascending doc_id, so first arrival == min doc_id
    // and the streaming representative matches the batch window's.
    docs.filter(col("doc_id") < 250).coalesce(1).write.mode("append").parquet(dir)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStreams.cleanCorpusStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("clean_out").start()
    q.processAllAvailable()
    docs.filter(col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("clean_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getDouble(3))).toSet
    val batch = operators.Pipeline.cleanCorpus(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getDouble(3))).toSet
    assert(streamed.size == docs.count(), "every doc labeled exactly once")
    assert(streamed == batch,
      s"labels diverged: extra=${(streamed -- batch).take(3)} missing=${(batch -- streamed).take(3)}")
  }

  test("streaming quality classifier is map-only and matches the batch twin") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val dir = Files.createTempDirectory("graft-qc-stream").toString
    docs.select("doc_id", "text").coalesce(1).write.mode("append").parquet(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    // ordered=false: the gate is one codegen'd pass per row — no
    // state, no watermark, runs unchanged under append mode
    val q = operators.Curation.qualityClassifier(stream, ordered = false)
      .writeStream.outputMode("append")
      .format("memory").queryName("qc_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("qc_out").collect()
      .map(r => (r.getLong(0), r.getDouble(6), r.getBoolean(7))).toSet
    val batch = operators.Curation.qualityClassifier(
      spark.read.schema(schema).parquet(dir)).collect()
      .map(r => (r.getLong(0), r.getDouble(6), r.getBoolean(7))).toSet
    assert(streamed == batch, "streaming classifier diverged from batch")
  }

  test("streaming pii scrub is map-only and matches the batch twin") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = Files.createTempDirectory("graft-pii-stream").toString
    docs.withColumn("text", concat(col("text"),
        lit(" mail "), col("doc_id"), lit("@ex.org ip 10.0.0.1")))
      .select("doc_id", "text").coalesce(1).write.mode("append").parquet(dir)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    // ordered=false: the scrub is pure map-side work, so it runs
    // unchanged under append mode with no state and no watermark.
    val q = operators.Pipeline.piiScrub(stream, ordered = false)
      .writeStream.outputMode("append")
      .format("memory").queryName("pii_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("pii_out").collect()
      .map(r => (r.getLong(0), r.getAs[Int]("pii_total"), r.getAs[String]("redacted"))).toSet
    val batch = operators.Pipeline.piiScrub(
      spark.read.schema(schema).parquet(dir)).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("pii_total"), r.getAs[String]("redacted"))).toSet
    assert(streamed == batch, "streaming scrub diverged from batch")
    assert(streamed.forall(_._2 >= 2), "planted email+ip not detected")
  }

  test("streaming minhash near-dup pairs converge to the batch twin across batches") {
    import spark.implicits._
    implicit val s = spark
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = Files.createTempDirectory("graft-minhash-stream").toString
    // First wave: lower half of the corpus.
    docs.filter(col("doc_id") < 250).coalesce(1).write.mode("append").parquet(dir)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select(col("doc_id"), col("text"))
    val q = EventStreams.minhashPairStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("minhash_out").start()
    q.processAllAvailable()
    val firstWave = spark.table("minhash_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // Second wave arrives: cross-wave pairs must appear (later doc
    // pairs against the state members of the first wave).
    docs.filter(col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("minhash_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val batch = operators.Dedup.minhashLsh(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"streamed pairs diverged: extra=${streamed -- batch} missing=${batch -- streamed}")
    assert(firstWave.subsetOf(streamed) && firstWave != streamed,
      "second wave contributed no new pairs — cross-batch state not exercised")
  }

  test("streaming funnel converges to the batch twin when waves arrive in time order") {
    import spark.implicits._
    implicit val s = spark
    val events = Tables.load(spark, sfDir, "events")
    val cut = events.selectExpr("percentile(unix_micros(ts), 0.5)").head.getDouble(0).toLong
    val dir = Files.createTempDirectory("graft-funnel-stream").toString
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    events.filter(unix_micros(col("ts")) <= cut)
      .selectExpr(cols: _*).coalesce(1).write.mode("append").parquet(dir)

    val schema = events.selectExpr(cols: _*).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .as[EventStreams.Event]
    val q = EventStreams.funnelStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    q.processAllAvailable()
    events.filter(unix_micros(col("ts")) > cut)
      .selectExpr(cols: _*).coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()

    // stage strictly increases per emission, so max stage = final state
    val streamed = spark.table("funnel_out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
    val batch = operators.Events.funnel(events).collect().map { r =>
      def micros(i: Int): Long =
        if (r.isNullAt(i)) -1L
        else { val t = r.getTimestamp(i).toInstant
               t.getEpochSecond * 1000000L + t.getNano / 1000L }
      r.getLong(0) -> (r.getInt(4), Seq(micros(1), micros(2), micros(3)))
    }.toMap
    // batch emits every user; the stream only users with progress
    val batchReached = batch.filter(_._2._1 > 0)
    assert(streamed.keySet == batchReached.keySet, "user sets diverged")
    streamed.foreach { case (u, (_, stage, times)) =>
      assert((stage, times) == batchReached(u), s"user $u diverged")
    }
  }

  test("streaming as-of enrichment converges to the batch twin across ordered waves") {
    import spark.implicits._
    implicit val s = spark
    val events = Tables.load(spark, sfDir, "events")
    val cut = events.selectExpr("percentile(unix_micros(ts), 0.5)").head.getDouble(0).toLong
    val dir = Files.createTempDirectory("graft-asof-stream").toString
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    events.filter(unix_micros(col("ts")) <= cut)
      .selectExpr(cols: _*).coalesce(1).write.mode("append").parquet(dir)

    val schema = events.selectExpr(cols: _*).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .as[EventStreams.Event]
    val q = EventStreams.asofStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    q.processAllAvailable()
    events.filter(unix_micros(col("ts")) > cut)
      .selectExpr(cols: _*).coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()

    // matched_ts included: the emitted timestamp must carry the exact
    // MICROS the batch twin emits (not a millis truncation)
    def proj(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("matched_id"), col("lag_us"),
        coalesce(unix_micros(col("matched_ts")), lit(-1L)).as("mts"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getLong(3))).toSet
    val streamed = proj(spark.table("asof_out"))
    val batch = proj(operators.Events.asofJoin(events))
    assert(streamed == batch,
      s"asof diverged: extra=${(streamed -- batch).take(5)} missing=${(batch -- streamed).take(5)}")
  }

  test("streaming sessionize emits exactly the closed sessions of the batch twin") {
    import spark.implicits._
    implicit val s = spark
    val ev = streamingEvents
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    val q = EventStreams.sessionizeStream(ev)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sess_out")
      .select(col("user_id"), col("session_seq"), col("n_events"),
        round(col("sum_value"), 4).as("sum_value"))
      .collect().map(_.toSeq).toSet

    val batch = Events.sessionize(Tables.load(spark, sfDir, "events"))
    val lastSeq = batch.groupBy("user_id")
      .agg(max("session_seq").as("last_seq"))
    val closed = batch.join(lastSeq, "user_id")
      .filter(col("session_seq") < col("last_seq"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        round(col("sum_value"), 4).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == closed)
  }
}
