package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare — and then the
  * compare ITSELF (tools/compare.py, the exact-value DuckDB oracle), so
  * one compact GRAFT_CORRECTNESS_JSON stdout line carries the per-round
  * verdict even when the driver's own compare step dies silently
  * (CORRECTNESS_r05..r07 all came back `{}` despite 126/126 passing;
  * this mirrors the bench-marker fix that made BENCH_r07 parse).
  *
  * r9: the r8 gate worked but took ~16 min wall (dumps ~5 min + a SERIAL
  * compare ~11 min) — longer than the driver's correctness-step budget,
  * so the marker never reached the recorded tail. Now the compare runs
  * CONCURRENTLY with the dumps: oracle_sql.json is written first,
  * compare.py starts immediately in --wait mode with a multiprocessing
  * pool, and each query becomes comparable the moment its dump lands
  * (signalled via <outDir>/_done/<name>). Progress lines
  * (GRAFT_CORRECTNESS_PROGRESS) stream through to stdout so even a
  * truncated tail carries a partial verdict. */
object Verify {
  /** Session confs a pooled verify query must not mutate: anything a
    * save/restore pattern (deleteDocuments' maxPartitionBytes dance)
    * or an ad-hoc tuning write would touch. Watched around the dump
    * pool and per query in VerifyPoolSafetySpec. */
  val WatchedConfs: Seq[String] = Seq(
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.shuffle.partitions",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.enabled",
    "spark.sql.session.timeZone")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // PROVISIONAL status line, printed before any Spark startup cost:
    // a driver window that kills this step early still captures a
    // parseable line. Deliberately a DIFFERENT prefix than the final
    // GRAFT_CORRECTNESS_JSON verdict (and not a substring-match of it):
    // a harness that takes the FIRST marker match must never read this
    // non-verdict as the result. CORRECTNESS_r05..r09 all came back
    // `{}`; the gate itself is fast (≤2 min, judge-timed), so the
    // residual suspect is the capture channel.
    println(s"""GRAFT_VERIFY_STATUS: {"status":"running","queries":${SparkEntry.queries.size},"sf":"$sfDir"}""")
    Console.out.flush()
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
    val doneDir = new java.io.File(outDir, "_done")
    // stale sentinels from a previous run would release compares against
    // half-written dumps — clear, then recreate
    Option(doneDir.listFiles()).foreach(_.foreach(_.delete()))
    doneDir.mkdirs()
    // stale verdicts are worse than stale sentinels: if THIS run's
    // compare crashes before writing its marker, a leftover marker.json
    // from a previous run would be republished as this run's verdict —
    // clear them so a crashed compare reads as "compare failed", loudly
    new java.io.File(outDir, "marker.json").delete()
    new java.io.File(outDir, "compare.json").delete()

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
    // oracle_sql.json FIRST: compare.py reads it at startup, and the
    // compare now starts before the dumps finish. This startup snapshot
    // holds only the STATIC entries — the ~18 dynamic oracles (IVF/PQ/
    // PCA/clustering inline centroids fitted while their query runs)
    // appear in the post-dump rewrite below, which compare.py re-reads
    // when the _ALL sentinel lands.
    def writeOracleJson(): Unit = {
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    }
    writeOracleJson()

    // ---- start the oracle compare CONCURRENTLY with the dumps --------
    // Python+duckdb are driver-side tools; if this environment lacks
    // them the marker says so loudly instead of staying silent.
    val compareScript = Seq("tools/compare.py", "/root/repo/tools/compare.py")
      .find(p => new java.io.File(p).isFile)
    val cmpJson = s"$outDir/compare.json"
    val markerJson = s"$outDir/marker.json"
    val compareProc: Option[(Process, Thread)] = compareScript.flatMap { script =>
      try {
      val logFile = new java.io.File(s"$outDir/compare_log.txt")
      // The driver-schema artifact (per-query rows_match/schema_match/
      // hash_match/spark_rows/oracle_rows/err — the exact keys of
      // CORRECTNESS_r01..r04) lands at the REPO ROOT when this main
      // runs from the repo (same condition as the VERIFY_LOCAL.json
      // refresh below), so a round whose driver-side compare dies is
      // adjudicated by reading this file with zero translation.
      // A SPARK_GRAFT_VERIFY_ONLY subset run must never clobber the
      // repo-root records with a partial verdict — those files are the
      // round's correctness fallback channel.
      val driverJson =
        if (new java.io.File("tools/compare.py").isFile
            && sys.env.get("SPARK_GRAFT_VERIFY_ONLY").isEmpty)
          "CORRECTNESS_LOCAL.json"
        else s"$outDir/correctness_local.json"
      val pb = new ProcessBuilder(
        "python3", script, sfDir, outDir, "--wait", "--jobs", "12",
        "--json", cmpJson, "--marker", markerJson,
        "--driver-json", driverJson)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      // pump the child's stdout: everything → compare_log.txt, and the
      // GRAFT_CORRECTNESS_PROGRESS lines ALSO echo to our stdout so a
      // driver window that times out mid-gate still records a partial
      // verdict in its captured tail
      val pump = new Thread(() => {
        val w = new java.io.PrintWriter(new java.io.FileWriter(logFile))
        try {
          val r = new java.io.BufferedReader(
            new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
          var line = r.readLine()
          while (line != null) {
            w.println(line); w.flush()
            if (line.startsWith("GRAFT_")) println(line)
            line = r.readLine()
          }
        } finally w.close()
      }, "graft-compare-pump")
      pump.setDaemon(true)
      pump.start()
      Some((proc, pump))
      } catch { case e: Throwable =>
        // no python3 (or exec failure): degrade to dumps-only with a
        // loud marker, never crash before the dumps run
        System.err.println(s"[verify] cannot start compare.py: $e")
        None
      }
    }

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
    // That single-writer assumption is now CHECKED, not assumed: session
    // confs and the shared library's manifests are snapshotted around
    // the dumps below, and any drift prints a loud violation marker
    // (plus VerifyPoolSafetySpec exercising the same invariant per
    // query). The shared library warms FIRST so its build is not
    // mistaken for a query-side mutation.
    val warmLib = VectorLibrary.forDataset(spark, sfDir)
    def libState(): Seq[String] =
      (warmLib.storeGenerations().map(_.toString) ++
        warmLib.manifestInfo.collect().map(_.toString)).sorted
    def confState(): Seq[(String, Option[String])] = Verify.WatchedConfs
      .map(k => k -> (try spark.conf.getOption(k) catch { case _: Throwable => None }))
    val libBefore = libState()
    val confBefore = confState()
    val dumpFailed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val dumpedCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    // Dev-only subset run (SPARK_GRAFT_VERIFY_ONLY=q1,q2): iterate on
    // one operator's oracle without paying the full 120+-query gate.
    // The official gate never sets it; compare.py still reads the full
    // oracle map and compares whatever dumps exist.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None => SparkEntry.queries
    }
    val futures = selected.toSeq.map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          dumpFailed.add(name)
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        // sentinel AFTER the write (or failure) — releases this query's
        // oracle compare in the concurrently-running compare.py
        new java.io.File(doneDir, name).createNewFile()
        val n = dumpedCount.incrementAndGet()
        if (n % 20 == 0)
          println(s"""GRAFT_DUMP_PROGRESS: {"dumped":$n,"total":${SparkEntry.queries.size}}""")
      }
    }
    import scala.concurrent.duration._
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), 60.minutes)
    pool.shutdown()
    // pool-safety audit: queries must be pure readers — a mutator in
    // `queries` (session-conf save/restore, a library write) is unsafe
    // under the 4-way pool and invalidates the round's dumps
    val confDrift = confState().zip(confBefore).collect {
      case ((k, a), (_, b)) if a != b => s"$k: $b -> $a" }
    val libDrift = if (libState() == libBefore) Nil
      else Seq("shared library manifests changed")
    val poolViolations = confDrift ++ libDrift
    if (poolViolations.nonEmpty)
      println("GRAFT_POOL_SAFETY_VIOLATION: " +
        poolViolations.mkString("[\"", "\",\"", "\"]"))
    // the complete oracle map — dynamic entries are stashed now that
    // every query has run — MUST land before _ALL releases compare.py's
    // re-read
    writeOracleJson()
    // _ALL releases any compare still gated on a sentinel (belt and
    // braces — every future above touches its own) and tells compare.py
    // to re-read oracle_sql.json for the dynamic entries
    new java.io.File(doneDir, "_ALL").createNewFile()
    // Queries run concurrently here, so per-query release would race an
    // in-flight sibling's pinned frame; one drain after the pool settles
    // still bounds the session's cached blocks (DISK_ONLY, sf0.01-sized).
    GraftFunctions.releasePins()
    spark.stop()

    // ---- collect the compare verdict + compact stdout marker ---------
    val dumped = SparkEntry.queries.size - dumpFailed.size
    val failedDumps = {
      import scala.jdk.CollectionConverters._
      dumpFailed.asScala.toSeq.sorted
    }
    val marker: String = compareProc match {
      case None =>
        s"""{"dumped":$dumped,"dump_failed":${failedDumps.size},"compare":"unavailable: tools/compare.py missing or python3 failed to start"}"""
      case Some((proc, pump)) =>
        try {
          val done = proc.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
          if (!done) { proc.destroyForcibly()
            throw new RuntimeException("compare timed out after 20 min") }
          pump.join(10000)
          // the marker file is the compare's own compact verdict —
          // written atomically (write+rename), read verbatim; no regex
          // over compare.json (the r8 regex misparsed the enclosing
          // "verdicts" key when the first verdict failed)
          val m = Files.readString(Paths.get(markerJson)).trim
          require(m.startsWith("{") && m.endsWith("}"),
            s"marker.json is not a JSON object: ${m.take(80)}")
          // refresh the repo-root record when run from the repo (the
          // standing VERIFY_LOCAL.json contract, tools/verify_local.sh;
          // README "Correctness artifacts" names it for the driver)
          if (new java.io.File("tools/compare.py").isFile && only.isEmpty)
            Files.writeString(Paths.get("VERIFY_LOCAL.json"),
              Files.readString(Paths.get(cmpJson)))
          val safety = if (poolViolations.isEmpty) "\"ok\""
            else s"\"VIOLATED: ${poolViolations.size} mutation(s) — see GRAFT_POOL_SAFETY_VIOLATION\""
          s"""{${m.stripPrefix("{").stripSuffix("}")},"dump_failed":${failedDumps.size},"pool_safety":$safety,"sf":"$sfDir","detail":"$cmpJson"}"""
        } catch { case e: Throwable =>
          // even a failed marker handoff refreshes the stable-path
          // record when the per-query verdicts landed (compare.json is
          // written before marker.json in tools/compare.py)
          try if (new java.io.File("tools/compare.py").isFile &&
                  new java.io.File(cmpJson).isFile && only.isEmpty)
            Files.writeString(Paths.get("VERIFY_LOCAL.json"),
              Files.readString(Paths.get(cmpJson)))
          catch { case _: Throwable => () }
          val msg = Option(e.getMessage).getOrElse(e.toString)
            .replace("\\", "\\\\").replace("\"", "'").take(160)
          s"""{"dumped":$dumped,"dump_failed":${failedDumps.size},"compare":"failed: $msg"}"""
        }
    }
    // The final verdict goes out on EVERY channel a capture might
    // record: (1) a flushed stderr copy first (a stderr-only or merged
    // capture still carries it, and in a merged capture it lands BEFORE
    // the bare-JSON last line), then (2) the marker-prefixed stdout
    // line for harnesses that grep, then (3) the bare JSON as the final
    // stdout line for harnesses that parse the last line (StdoutOutput
    // in build.sbt keeps all of it verbatim — no "[info] " prefix).
    System.err.println(s"GRAFT_CORRECTNESS_JSON: $marker")
    System.err.flush()
    println(s"GRAFT_CORRECTNESS_JSON: $marker")
    println(marker)
    Console.out.flush()
  }
}
