package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorSearch

class StorageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed tables co-locate the join: no shuffle exchange") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    spark.sql("DROP TABLE IF EXISTS emb_a")
    spark.sql("DROP TABLE IF EXISTS emb_b")
    emb.select("vec_id", "label").write
      .bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable("emb_a")
    emb.select("vec_id", "embedding").write
      .bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable("emb_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("emb_a").join(spark.table("emb_b"), "vec_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == emb.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS emb_a")
      spark.sql("DROP TABLE IF EXISTS emb_b")
    }
  }

  test("quantized two-phase search recovers the exact top-10") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val overlaps = (0 until 5).map { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))
      val corpus = emb.filter(col("vec_id") =!= qid)
      val exact = VectorSearch.knnFlat(corpus, q, "vec_id", "embedding", 10, "cosine")
        .collect().map(_.getLong(0)).toSet
      val quant = VectorSearch.knnQuantized(corpus, q, "vec_id", "embedding", 10)
        .collect().map(_.getLong(0)).toSet
      (exact intersect quant).size / 10.0
    }
    val mean = overlaps.sum / overlaps.size
    info(f"quantized recall@10 over 5 queries: $mean%.2f")
    assert(mean >= 0.9, s"int8 rerank lost too much: $overlaps")
  }

  test("lsh recall@10 against exact search is measured and sane") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val recalls = (0 until 5).map { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))
      val corpus = emb.filter(col("vec_id") =!= qid)
      val exact = VectorSearch.knnFlat(corpus, q, "vec_id", "embedding", 10, "cosine")
        .collect().map(_.getLong(0)).toSet
      val approx = VectorSearch.lshKnn(corpus, q, "vec_id", "embedding", 10)
        .collect().map(_.getLong(0)).toSet
      (exact intersect approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"lsh recall@10 over 5 queries: $mean%.2f (${recalls.mkString(", ")})")
    // sign-random-projection on isotropic gaussian data is the
    // hardest case; require better-than-random candidate quality.
    assert(mean >= 0.2, s"recall collapsed: $recalls")
  }
}
