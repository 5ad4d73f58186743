package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions exposes functions to pure SQL sessions") {
    // Force a NEW session (shared SparkContext is fine) so the
    // extensions actually apply; never stop it — the context is shared
    // with the other suites.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
          |       graft_simhash('hello world of spark engines', 42L) AS sh,
          |       size(graft_embed('hello', 32, 42L)) AS d""".stripMargin).collect()(0)
      assert(r.getDouble(0) == 1.0)
      assert(r.getInt(2) == 32)
      // trailing tuning args are optional with Column-API defaults
      val d = spark.sql(
        "SELECT size(graft_embed('hi there')) d, size(graft_minhash('a b c d')) m").collect()(0)
      assert(d.getInt(0) == 64 && d.getInt(1) == 64)
      // arity mistakes raise a clear message, not an analyzer crash
      val err = intercept[Exception](
        spark.sql("SELECT graft_cosine(graft_embed('x'))").collect())
      def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
      assert(root(err).getMessage.contains("graft_cosine expects 2 argument(s)"),
        s"unexpected: ${root(err).getMessage}")
    } finally {
      prior.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
