package graft

import org.scalatest.funsuite.AnyFunSuite

/** Verify's dump pool runs 4 queries concurrently in ONE session, so
  * every `SparkEntry.queries` entry must be a PURE READER: no
  * session-conf save/restore (deleteDocuments' maxPartitionBytes dance
  * is the known anti-example) and no shared-library mutation — a
  * mutator would race the 3 in-flight siblings and silently skew their
  * dumps. r8 documented this by convention only; now the gate audits
  * all 126 queries around the pooled dumps (GRAFT_POOL_SAFETY_VIOLATION
  * + a pool_safety marker field) and this spec checks the invariant
  * per-query on the representative set most likely to regress: the
  * shared-library readers and one of each operator family. */
class VerifyPoolSafetySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("verify queries leave session confs and the shared library untouched") {
    val sfDir = SparkTestSession.sfDir
    val lib = VectorLibrary.forDataset(spark, sfDir)
    def libState: Seq[String] =
      (lib.storeGenerations().map(_.toString) ++
        lib.manifestInfo.collect().map(_.toString)).sorted
    def confState: Seq[(String, Option[String])] =
      Verify.WatchedConfs.map(k => k -> spark.conf.getOption(k))
    val names = Seq(
      "q1_agg",                  // relational
      "library_search_e2e",      // the shared-library reader
      "library_search_filtered", // covers()-pruned scan over the library
      "library_lsh_batch",       // batch path over the persisted index
      "dedup_exact",             // dedup family
      "vector_stats")            // vector family
    for (n <- names) {
      assert(SparkEntry.queries.contains(n), s"representative query $n gone")
      val cb = confState
      val lb = libState
      SparkEntry.queries(n)(spark, sfDir).collect()
      assert(confState == cb, s"$n mutated a watched session conf")
      assert(libState == lb, s"$n mutated the shared library")
    }
  }
}
