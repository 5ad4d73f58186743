package graft
import org.apache.spark.sql.SparkSession
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg","knn_cosine","knn_batch","lsh_knn","dedup_minhash","dedup_ngram_jaccard","events_window_agg","library_search_e2e")
    names.foreach { n =>
      println(s"\n######## $n ########")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
