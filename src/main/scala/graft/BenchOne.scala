package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time + explain a single named query. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val explain = args.contains("--explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[bench-one] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    if (explain) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
