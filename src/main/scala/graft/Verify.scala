package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: this main's stdout tail is a driver-parsed
    // artifact, and benign WARNs (CacheManager re-cache notices, task
    // retries) interleave into a merged stdout+stderr capture.
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // 125 queries sequentially = ~2.5 min wall at sf0.01; the driver's
    // correctness step has come back empty since the suite crossed 120
    // queries (r5/r6), consistent with a step timeout. Spark's scheduler
    // is thread-safe and the index memo caches are concurrent TrieMaps,
    // so run queries through a small pool — each query still gets the
    // full 32 cores for its own stages; the pool just overlaps the
    // per-query planning/IO gaps. Queries that share a build-once index
    // race only on who builds first (deterministic fit, temp-dir
    // isolated), so the worst case is one duplicated build.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    import scala.concurrent.duration._
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), 60.minutes)
    pool.shutdown()
    // Queries run concurrently here, so per-query release would race an
    // in-flight sibling's pinned frame; one drain after the pool settles
    // still bounds the session's cached blocks (DISK_ONLY, sf0.01-sized).
    GraftFunctions.releasePins()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
