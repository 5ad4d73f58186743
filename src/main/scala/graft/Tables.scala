package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver's testdata layout. */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      // events.ts has shipped as either parquet TIMESTAMP(NANOS) (read
      // as long via nanosAsLong, truncated to micros) or plain
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
      // TIMESTAMP_NTZ). Both normalize to a session-UTC TimestampType
      // column — the DuckDB oracle's CAST(ts AS TIMESTAMP) sees the
      // identical instants.
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => df
        case _ =>
          df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
    } else df
  }

  // The documents table with its embedding column materialized ONCE
  // per (session, dir) and pinned — the store-side precomputation a
  // library performs at ingest (VectorLibrary.addDocuments), provided
  // here for queries that run straight off the testdata layout.
  // Embedding the corpus per query is the scale anti-pattern this
  // replaces.
  private val embeddedCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def documentsEmbedded(spark: SparkSession, dir: String, dim: Int = 64): DataFrame =
    embeddedCache.computeIfAbsent(
      s"${System.identityHashCode(spark)}|$dir|$dim", _ =>
        // ingest-time layout: embed ONCE, stored PARALLEL — a cached
        // 1-split scan would serialize every hybrid probe's termFreqs
        // + cosine pass on one core (guide §2.5 / §6 file sizing)
        graft.GraftFunctions.scaleScan(load(spark, dir, "documents"))
          .withColumn("embedding", graft.GraftFunctions.embedText(col("text"), dim))
          .persist())
}
