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
    // pinning BOTH liveness channels into the past: the mtime and the
    // content timestamp — staleness evaluates max of the two)
    val successor = new WriterLock(fs, root, leaseMs = 300)
    val lockP = new Path(s"$root/_writer.lock")
    val past = System.currentTimeMillis() - 10000
    val rewrite = fs.create(lockP, true)
    rewrite.write(s"dead-owner\n$past\n".getBytes("UTF-8"))
    rewrite.close()
    fs.setTimes(lockP, past, -1)
    @volatile var ran = false
    successor.withLock { ran = true } // breaks the stale lease
    assert(ran, "successor never acquired a stale lease")
    fs.delete(new Path(root), true)
  }

  test("two breakers racing one stale lease: never two concurrent holders") {
    val root = Files.createTempDirectory("graft-wlock4").toString
    // plant a stale lock: a crashed holder whose last beat is long past
    fs.mkdirs(new Path(root))
    val lockP = new Path(s"$root/_writer.lock")
    val out = fs.create(lockP, false)
    out.write(s"dead-owner\n${System.currentTimeMillis() - 100000}\n".getBytes("UTF-8"))
    out.close()
    fs.setTimes(lockP, System.currentTimeMillis() - 100000, -1)
    // two sessions observe the SAME stale lock and race the break. The
    // r8 protocol (stat → delete → create) let breaker B delete breaker
    // A's FRESH lease; the rename-to-tombstone break makes exactly one
    // rename win, so concurrent holders are impossible.
    val holders = new java.util.concurrent.atomic.AtomicInteger(0)
    var maxConcurrent = 0
    val acquired = new java.util.concurrent.atomic.AtomicInteger(0)
    val refused = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        val w = new WriterLock(fs, root, leaseMs = 60000)
        barrier.await()
        try w.withLock {
          val n = holders.incrementAndGet()
          WriterLockSpec.this.synchronized {
            maxConcurrent = math.max(maxConcurrent, n) }
          Thread.sleep(400) // overlap window: a second holder WOULD show
          holders.decrementAndGet()
          acquired.incrementAndGet()
        } catch {
          case _: WriterLock.ConcurrentWriterException =>
            refused.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(15000))
    assert(acquired.get() >= 1, "no breaker ever acquired the stale lease")
    assert(maxConcurrent == 1,
      s"$maxConcurrent writers held the lease simultaneously")
    assert(acquired.get() + refused.get() == 2,
      "a breaker neither acquired nor failed loudly")
    fs.delete(new Path(root), true)
  }

  test("a displaced holder is loud: foreign lock content fails the mutation on exit") {
    val root = Files.createTempDirectory("graft-wlock5").toString
    val w = new WriterLock(fs, root, leaseMs = 300) // beat every 100 ms
    val e = intercept[WriterLock.ConcurrentWriterException] {
      w.withLock {
        // simulate a breaker that displaced us and installed its own
        // lease while our mutation runs
        val p = new Path(s"$root/_writer.lock")
        fs.delete(p, false)
        val out = fs.create(p, false)
        out.write(s"usurper\n${System.currentTimeMillis()}\n".getBytes("UTF-8"))
        out.close()
        Thread.sleep(500) // let at least one heartbeat observe the theft
        assert(w.leaseLost, "heartbeat never flagged the displaced lease")
      }
    }
    assert(e.getMessage.contains("lost"))
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

  test("per-tree leases: disjoint maintenance commits concurrently, conflicting footprints and all-tree writers fail loudly") {
    val root = Files.createTempDirectory("graft-wlock4").toString
    val lib1 = new VectorLibrary(spark, root, "trees-lib")
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(20)
    lib1.addDocuments(docs)
    lib1.buildPqIndex(m = 4, kk = 8)
    val lib2 = new VectorLibrary(spark, root, "trees-lib")

    // instance 1 holds ONLY the pq tree lease mid-"maintenance"
    val gate = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      val m = lib1.getClass.getDeclaredMethods
        .find(_.getName == "withTreeLocks").get
      m.setAccessible(true)
      m.invoke(lib1, Seq("pq"), () => { gate.countDown(); done.await(); null })
    })
    holder.start()
    gate.await()

    // DISJOINT footprint: grid maintenance from the second instance
    // commits concurrently — this was impossible under the r10
    // library-wide lease
    lib2.buildGridIndex(gridDims = 3, cellsPerDim = 3)
    assert(lib2.hasGridIndex)
    val eGrid = lib2.epochs.last
    // the concurrent writer's epoch is complete and resolvable
    lib2.consistentAt(eGrid).foreach(_._2.count())
    assert(lib2.epochInfo(eGrid).contains("grid"))

    // CONFLICTING footprint: pq-on-pq fails loudly at acquire
    intercept[WriterLock.ConcurrentWriterException] {
      lib2.buildPqIndex(m = 4, kk = 8)
    }
    // ALL-TREE transaction: needs every lease, including the held pq
    intercept[WriterLock.ConcurrentWriterException] {
      lib2.addDocuments(docs.withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id") + 5000))
    }

    done.countDown(); holder.join(10000)
    // after release: both conflicting mutations proceed, and every
    // epoch of the interleaved history resolves end-to-end
    lib2.buildPqIndex(m = 4, kk = 8)
    lib2.addDocuments(docs.withColumn("doc_id",
      org.apache.spark.sql.functions.col("doc_id") + 5000))
    lib2.epochs.foreach(e => lib2.consistentAt(e).foreach(_._2.count()))
    // the store and its maintained indexes agree at the final epoch
    val v = lib2.consistentAt(lib2.epochs.last)
    assert(v("pq").select("chunk_id").distinct().count()
      == v("store").select("chunk_id").count(),
      "pq index out of step with the store at the final epoch")
    lib1.delete()
    fs.delete(new Path(root), true)
  }

  test("overlapping disjoint frames in one instance: the last frame out records the epoch") {
    val root = Files.createTempDirectory("graft-wlock5").toString
    val lib = new VectorLibrary(spark, root, "frames-lib")
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(10)
    lib.addDocuments(docs)
    val before = lib.epochs.last
    // Force the exact interleave that used to skip BOTH records:
    // A enter (depth 1), B enter (depth 2), A exit (sees depth 2 —
    // skips), B exit (pre-fix: separate check-then-decrement also saw
    // depth 2 and skipped; post-fix: records on the 1 -> 0 transition).
    val m = lib.getClass.getDeclaredMethods.find(_.getName == "withTreeLocks").get
    m.setAccessible(true)
    val aIn = new java.util.concurrent.CountDownLatch(1)
    val aMayExit = new java.util.concurrent.CountDownLatch(1)
    // a real single-tree mutation first so the baseline epoch exists
    lib.buildPqIndex(m = 4, kk = 8)
    val afterPq = lib.epochs.last
    assert(afterPq > before)
    // frame A: holds the pq lease, parked inside its body
    val ta = new Thread(() => {
      m.invoke(lib, Seq("pq"), () => { aIn.countDown(); aMayExit.await(); null })
    })
    ta.start()
    aIn.await()
    // B is a REAL mutation overlapping A: it commits the grid tree
    // while A is still inside its pq frame
    val tb = new Thread(() => lib.buildGridIndex(gridDims = 3, cellsPerDim = 3))
    tb.start()
    // wait until B has entered its frame (depth 2) — poll the field
    val depthF = lib.getClass.getDeclaredField("mutationDepth")
    depthF.setAccessible(true)
    eventually(depthF.getInt(lib) >= 2, "second frame never entered")
    // A exits FIRST at depth 2 (the pre-fix skip), then B finishes
    aMayExit.countDown()
    ta.join(10000); tb.join(60000)
    assert(!ta.isAlive && !tb.isAlive)
    val afterGrid = lib.epochs.last
    assert(afterGrid > afterPq,
      "no epoch recorded for the grid build — both overlapping frames skipped")
    assert(lib.epochInfo(afterGrid).contains("grid"),
      s"final epoch missing the grid tree: ${lib.epochInfo(afterGrid)}")
    lib.delete()
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
