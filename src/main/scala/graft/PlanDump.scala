package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool (r13): dump `.explain("formatted")` for named queries into
  * `<outDir>/<name>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/r13/. Planning only; no
  * query executes (build-once index fits inside a query closure still
  * run, as they would before any explain).
  *
  * usage: runMain graft.PlanDump <outDir> <tag> <query> [query ...]
  *        (query = "all" dumps every SparkEntry entry)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.drop(2).sameElements(Array("all"))) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    // Fail on unknown names BEFORE the session starts (r14, ADVICE):
    // a typo mid-list would otherwise throw a bare
    // NoSuchElementException after earlier dumps already succeeded.
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — valid names are " +
        "SparkEntry.queries keys (or 'all')")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
      println(s"PLANDUMP: $name -> ${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
