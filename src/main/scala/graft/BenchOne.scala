package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time + explain a single named query, printing JVM
  * process-CPU beside wall for every run (the same (wall, cpu) pair
  * graft.Bench records per query).
  *
  * `--load N` spawns N EXTERNAL busy-loop processes (`sh -c 'while :;
  * do :; done'`) for the second half of the runs — a contention demo:
  * the loaded runs show wall inflating while cpu stays ROUGHLY flat.
  * Note cpu<wall is sufficient contamination evidence, never
  * necessary: under heavy oversubscription the JVM's own consumed CPU
  * inflates too (GC/safepoint/scheduler churn — the r12 record grew a
  * query's cpu 70× alongside its wall), which is why [[Bench]] also
  * adjudicates against the committed quiet baseline and /proc/stat.
  * Killed on exit.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val explain = args.contains("--explain")
    var loadN = 0
    var sfDir = "/root/testdata/sf0.1"
    var ai = 1
    while (ai < args.length) {
      args(ai) match {
        case "--load" =>
          require(ai + 1 < args.length && args(ai + 1).forall(_.isDigit),
            "usage: BenchOne <query> [sfDir] [--explain] [--load N]")
          loadN = args(ai + 1).toInt; ai += 2
        case "--explain" => ai += 1
        case p => sfDir = p; ai += 1
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val runs = if (loadN > 0) 6 else 3
    var loaders: Seq[Process] = Seq.empty
    try {
      (1 to runs).foreach { i =>
        if (loadN > 0 && i == runs / 2 + 1) {
          loaders = (1 to loadN).map { _ =>
            new ProcessBuilder("sh", "-c", "while :; do :; done").start()
          }
          println(s"[bench-one] spawned $loadN external busy-loop processes")
        }
        val c0 = Bench.processCpuSec()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = Bench.processCpuSec() - c0
        // Align with Bench's methodology (r14, measurement fix): drop
        // this run's pinned frames before the next — otherwise run 2+
        // of a pinned query silently reuses run 1's cache (CacheManager
        // matches the canonicalized plan) and under-measures, while
        // Bench re-pins every run.
        graft.GraftFunctions.releasePins()
        println(f"[bench-one] $name run$i: wall=$wall%.2fs cpu=$cpu%.2fs " +
          f"(cpu/wall=${cpu / wall}%.1f) rows=$n" +
          (if (loaders.nonEmpty) " [loaded]" else ""))
      }
    } finally loaders.foreach(_.destroyForcibly())
    if (explain) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
