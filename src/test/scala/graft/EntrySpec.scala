package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("driver entry() returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every declared query runs on sf0.001 and yields a schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, SparkTestSession.sfDir)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("every oracle entry has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
