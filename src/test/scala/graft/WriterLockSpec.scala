package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Cross-process single-writer enforcement: a second live writer is a
  * loud error, a crashed writer's stale lease is reclaimable, nested
  * mutations re-enter one lease. Reference parity: the in-process
  * RLock of vector_db/storage.py and background_tasks.py's per-library
  * rebuild serialization, moved onto the shared filesystem. */
class WriterLockSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("second writer session fails loudly while the first holds the lease") {
    val root = Files.createTempDirectory("graft-wlock").toString
    val a = new WriterLock(fs, root, leaseMs = 60000)
    val b = new WriterLock(fs, root, leaseMs = 60000)
    a.withLock {
      val e = intercept[WriterLock.ConcurrentWriterException](b.withLock(()))
      assert(e.getMessage.contains("being mutated"))
      // reentrant: the holder nests freely (updateDocument = delete+add)
      a.withLock { a.withLock(()) }
    }
    // released: the other session may now mutate
    b.withLock(())
    fs.delete(new Path(root), true)
  }

  test("a crashed writer's stale lease is broken; a live heartbeat is not") {
    val root = Files.createTempDirectory("graft-wlock2").toString
    val dead = new WriterLock(fs, root, leaseMs = 60000)
    // simulate a crash: acquire then LOSE the process (never release)
    val t = new Thread(() => dead.withLock { Thread.sleep(200000) })
    t.setDaemon(true); t.start()
    eventually(fs.exists(new Path(s"$root/_writer.lock")), "lock never appeared")
    // age the lease past expiry (the heartbeat would normally refresh
    // it — here we out-age a 300ms lease faster than its beat by
    // pinning mtime into the past)
    val successor = new WriterLock(fs, root, leaseMs = 300)
    fs.setTimes(new Path(s"$root/_writer.lock"),
      System.currentTimeMillis() - 10000, -1)
    @volatile var ran = false
    successor.withLock { ran = true } // breaks the stale lease
    assert(ran, "successor never acquired a stale lease")
    fs.delete(new Path(root), true)
  }

  test("library mutations run under the lock: a concurrent session's mutation throws") {
    val root = Files.createTempDirectory("graft-wlock3").toString
    val lib1 = new VectorLibrary(spark, root, "locked-lib")
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(8)
    lib1.addDocuments(docs) // also proves appendBatch acquires+releases
    // a second "session": its own library handle, its own lock identity
    val lib2 = new VectorLibrary(spark, root, "locked-lib")
    // hold lib1's lease on another thread mid-"mutation"
    val gate = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => lib1.synchronized {
      // acquire via the public surface: a slow compaction stand-in
      val m = lib1.getClass.getDeclaredMethod("withWriterLock", classOf[Function0[_]])
      m.setAccessible(true)
      m.invoke(lib1, () => { gate.countDown(); done.await(); null })
    })
    holder.start()
    gate.await()
    intercept[WriterLock.ConcurrentWriterException] {
      lib2.addDocuments(docs.withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id") + 1000))
    }
    done.countDown(); holder.join(10000)
    // after release the second session proceeds
    lib2.addDocuments(docs.withColumn("doc_id",
      org.apache.spark.sql.functions.col("doc_id") + 1000))
    lib1.delete()
    fs.delete(new Path(root), true)
  }

  private def eventually(cond: => Boolean, msg: String, ms: Long = 5000): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond) {
      if (System.currentTimeMillis() > deadline) fail(msg)
      Thread.sleep(20)
    }
  }
}
