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
      // events.ts is parquet TIMESTAMP(NANOS): read as long (see
      // nanosAsLong in Graft.configure) and truncate to microseconds —
      // the DuckDB oracle applies the same CAST(ts AS TIMESTAMP).
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else df
  }
}
