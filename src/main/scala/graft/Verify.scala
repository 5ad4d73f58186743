package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare — and then the
  * compare ITSELF (tools/compare.py, the exact-value DuckDB oracle), so
  * one compact GRAFT_CORRECTNESS_JSON stdout line carries the per-round
  * verdict even when the driver's own compare step dies silently
  * (CORRECTNESS_r05..r07 all came back `{}` despite 126/126 passing;
  * this mirrors the bench-marker fix that made BENCH_r07 parse). */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    // 126 queries sequentially = ~2.5 min wall at sf0.01; the driver's
    // correctness step has come back empty since the suite crossed 120
    // queries (r5/r6), consistent with a step timeout. Spark's scheduler
    // is thread-safe and the index memo caches are concurrent TrieMaps,
    // so run queries through a small pool — each query still gets the
    // full 32 cores for its own stages; the pool just overlaps the
    // per-query planning/IO gaps. Queries that share a build-once index
    // race only on who builds first (deterministic fit, temp-dir
    // isolated), so the worst case is one duplicated build. NOTE the
    // standing single-writer assumption: none of the verify queries
    // mutate a shared library (deleteDocuments' session-conf
    // save/restore, VectorLibrary.scala, is NOT safe under this pool —
    // keep mutation out of `queries`, it belongs in specs/ladders).
    val dumpFailed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          dumpFailed.add(name)
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

    // ---- in-process oracle compare + compact stdout marker ----------
    // The DuckDB compare runs HERE, from the same main the driver
    // already invokes, so its verdict cannot be lost to a downstream
    // step. Python+duckdb are driver-side tools; if this environment
    // lacks them the marker says so loudly instead of staying silent.
    val dumped = SparkEntry.queries.size - dumpFailed.size
    val failedDumps = {
      import scala.jdk.CollectionConverters._
      dumpFailed.asScala.toSeq.sorted
    }
    val compareScript = Seq("tools/compare.py", "/root/repo/tools/compare.py")
      .find(p => new java.io.File(p).isFile)
    val marker: String = compareScript match {
      case None =>
        s"""{"dumped":$dumped,"dump_failed":${failedDumps.size},"compare":"unavailable: tools/compare.py not found"}"""
      case Some(script) =>
        val cmpJson = s"$outDir/compare.json"
        try {
          val logFile = new java.io.File(s"$outDir/compare_log.txt")
          val pb = new ProcessBuilder(
            "python3", script, sfDir, outDir, "--json", cmpJson)
          pb.redirectErrorStream(true)
          pb.redirectOutput(logFile)
          val proc = pb.start()
          val done = proc.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
          if (!done) { proc.destroyForcibly()
            throw new RuntimeException("compare timed out after 20 min") }
          val raw = Files.readString(Paths.get(cmpJson))
          // refresh the repo-root record when run from the repo (the
          // standing VERIFY_LOCAL.json contract, tools/verify_local.sh)
          if (new java.io.File("tools/compare.py").isFile)
            Files.writeString(Paths.get("VERIFY_LOCAL.json"), raw)
          // minimal field pulls — no JSON lib on the main classpath,
          // and the three counters are flat ints in compare.py's dump
          def intField(k: String): String =
            ("\"" + k + "\":\\s*(\\d+)").r.findFirstMatchIn(raw)
              .map(_.group(1)).getOrElse("-1")
          // failing query names: a verdict passes with hash:true
          // (oracle mode) or rows:true in rows-only mode; anything
          // else is a fail the marker should name
          val nameRe = "\"([A-Za-z0-9_]+)\":\\s*\\{([^}]*)\\}".r
          val failedNames = nameRe.findAllMatchIn(raw).collect {
            case m if !m.group(2).contains("\"hash\": true") &&
                      !(m.group(2).contains("rows-only") &&
                        m.group(2).contains("\"rows\": true")) =>
              m.group(1)
          }.toSeq.distinct.take(20)
          val failedJson = failedNames.map(n => s""""$n"""").mkString("[", ",", "]")
          s"""{"passes":${intField("passes")},"fails":${intField("fails")},"rows_only":${intField("rows_only")},"failed":$failedJson,"dump_failed":${failedDumps.size},"sf":"$sfDir","detail":"$cmpJson"}"""
        } catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.toString)
            .replace("\\", "\\\\").replace("\"", "'").take(160)
          s"""{"dumped":$dumped,"dump_failed":${failedDumps.size},"compare":"failed: $msg"}"""
        }
    }
    // Marker-prefixed line for harnesses that grep, then the bare JSON
    // as the final stdout line (StdoutOutput in build.sbt keeps both
    // verbatim — no "[info] " prefix).
    println(s"GRAFT_CORRECTNESS_JSON: $marker")
    println(marker)
  }
}
