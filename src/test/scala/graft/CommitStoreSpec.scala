package graft

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.sources.CommitStore

/** The commit seam ([[graft.sources.CommitStore]]): mutual exclusion
  * and complete-or-absent for each implementation, scheme resolution,
  * and the LOUD refusal on object stores with no atomic primitive.
  * The full OCC protocol (rebase, ledger merge, four-writer race
  * through VersionedTable.merge) stays covered in VersionedTableSpec —
  * these specs isolate the storage primitive itself. */
class CommitStoreSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** Race `n` writers calling putIfAbsent on ONE destination through
    * `store`; returns (winners, losers) counts after all complete. */
  private def race(store: CommitStore, fs: FileSystem, logDir: HPath,
      dst: HPath, n: Int): (Int, Seq[Array[Byte]]) = {
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val winning = new java.util.concurrent.atomic.AtomicReference[Array[Byte]]()
    val attempts = (0 until n).map { i =>
      val payload = s"""{"writer":$i,"payload":"${"x" * 256}"}"""
        .getBytes("UTF-8")
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try {
            store.putIfAbsent(fs, logDir, dst, payload)
            wins.incrementAndGet()
            winning.set(payload)
          } catch { case _: java.io.IOException => () }
        }
      })
      payload
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS), "race timed out")
    assert(winning.get() != null, "no writer won the race")
    (wins.get(), attempts)
  }

  private def localFsAndDir(name: String): (FileSystem, HPath) = {
    val dir = graft.util.Scratch.dir(s"commit_store_$name")
    graft.util.Scratch.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new HPath(s"file:$dir")
    (p.getFileSystem(conf), p)
  }

  test("LocalLink: of 8 racing writers exactly one wins; content is complete") {
    val (fs, logDir) = localFsAndDir("local_race")
    val dst = new HPath(logDir, "00000007.json")
    val (wins, payloads) = race(CommitStore.LocalLink, fs, logDir, dst, 8)
    assert(wins === 1, s"exactly one putIfAbsent must succeed, got $wins")
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst.toUri.getPath))
    assert(payloads.exists(_.sameElements(bytes)),
      "destination must hold ONE writer's complete payload")
    // no temp wreckage left behind
    val leftovers = new java.io.File(logDir.toUri.getPath).list()
      .filter(_.startsWith(".tmp_"))
    assert(leftovers.isEmpty, s"temp files must be cleaned: ${leftovers.toSeq}")
    // a later put on the same destination still refuses
    intercept[java.nio.file.FileAlreadyExistsException] {
      CommitStore.LocalLink.putIfAbsent(fs, logDir, dst, "late".getBytes)
    }
  }

  test("HdfsRename protocol: complete-or-absent content, temps cleaned") {
    // NOTE the local FS can only exercise the CALL SEQUENCE: POSIX
    // rename(2) overwrites an existing destination, so mutual
    // exclusion here comes from HDFS's namenode (refuses existing
    // dst) — which is exactly why HdfsRename is registered for
    // hdfs/viewfs and NOT for "file" (LocalLink is). What the local
    // run CAN prove: every observable destination state is ONE
    // writer's complete payload, and no temp wreckage survives.
    val (fs, logDir) = localFsAndDir("rename_race")
    val dst = new HPath(logDir, "00000003.json")
    val (wins, payloads) = race(CommitStore.HdfsRename, fs, logDir, dst, 8)
    assert(wins >= 1, "at least one writer must complete")
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst.toUri.getPath))
    assert(payloads.exists(_.sameElements(bytes)),
      "destination must hold ONE writer's complete payload, never a mix")
    val leftovers = new java.io.File(logDir.toUri.getPath).list()
      .filter(_.startsWith(".tmp_"))
    assert(leftovers.isEmpty, s"temp files must be cleaned: ${leftovers.toSeq}")
  }

  test("HdfsRename classifies failures: lost race ONLY when dst exists; a transient outage rethrows as itself") {
    val (fs, logDir) = localFsAndDir("rename_classify")
    // a wrapper FS whose rename always throws — simulates a transient
    // namenode/FS failure that is NOT a commit race
    val flaky = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def rename(src: HPath, dst: HPath): Boolean =
        throw new java.io.IOException("transient namenode outage")
    }
    val dst = new HPath(logDir, "00000005.json")
    val e = intercept[java.io.IOException] {
      CommitStore.HdfsRename.putIfAbsent(flaky, logDir, dst, "x".getBytes)
    }
    assert(e.getMessage.contains("transient namenode outage"),
      s"an outage with no manifest at dst must surface AS the outage, " +
        s"not as a lost race: ${e.getMessage}")
    // same throwing rename, but the destination EXISTS: that IS a lost
    // race (the OCC rebase path), whatever the rename's excuse was
    val out = fs.create(dst, false)
    try out.write("winner".getBytes) finally out.close()
    val e2 = intercept[java.io.IOException] {
      CommitStore.HdfsRename.putIfAbsent(flaky, logDir, dst, "y".getBytes)
    }
    assert(e2.getMessage.contains("lost the commit race"),
      s"dst present must classify as a race: ${e2.getMessage}")
    // rename returning FALSE with no dst is an FS failure, named as such
    val refusing = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def rename(src: HPath, dst: HPath): Boolean = false
    }
    val dst3 = new HPath(logDir, "00000006.json")
    val e3 = intercept[java.io.IOException] {
      CommitStore.HdfsRename.putIfAbsent(refusing, logDir, dst3, "z".getBytes)
    }
    assert(e3.getMessage.contains("filesystem failure"),
      s"refused rename with no dst must read as an FS failure: ${e3.getMessage}")
  }

  test("a conforming in-memory store drives the seam: race through the TRAIT") {
    // the test double a deployment would register for an object store
    // with conditional put: putIfAbsent maps directly onto it
    val blobs = new ConcurrentHashMap[String, Array[Byte]]()
    val memStore = new CommitStore {
      override def putIfAbsent(fs: FileSystem, logDir: HPath, dst: HPath,
          bytes: Array[Byte]): Unit =
        if (blobs.putIfAbsent(dst.toString, bytes) != null)
          throw new java.io.IOException(s"$dst already exists")
    }
    CommitStore.register("memtest", memStore)
    val (fs, logDir) = localFsAndDir("mem_race")
    val dst = new HPath(logDir, "00000001.json")
    val resolved = CommitStore.forScheme("memtest")
    assert(resolved eq memStore, "registration must resolve by scheme")
    val (wins, payloads) = race(resolved, fs, logDir, dst, 8)
    assert(wins === 1)
    assert(payloads.exists(_.sameElements(blobs.get(dst.toString))))
  }

  test("object-store schemes refuse LOUDLY, naming the conditional-put remedy") {
    Seq("s3a", "s3", "gs", "abfss", "wasb").foreach { s =>
      val e = intercept[IllegalArgumentException] { CommitStore.forScheme(s) }
      assert(e.getMessage.contains(s"'$s://'"), s"scheme named: ${e.getMessage}")
      assert(e.getMessage.contains("conditional put") ||
        e.getMessage.contains("CommitStore.register"),
        s"remedy named: ${e.getMessage}")
    }
    // unknown schemes refuse too (default-deny: rename atomicity is a
    // property we must KNOW, not assume)
    val e = intercept[IllegalArgumentException] {
      CommitStore.forScheme("someFutureFs")
    }
    assert(e.getMessage.contains("somefuturefs") &&
      e.getMessage.contains("CommitStore.register"))
  }

  test("a NON-ATOMIC store surfaces lost commits; the seam's contract catches it") {
    // the anti-example: check-then-act (what S3A rename actually is) —
    // run the same race; if both writers pass the check, the second
    // SILENTLY overwrites. The spec demonstrates the hazard the seam's
    // refusal exists to prevent: with enough racers the non-atomic
    // store yields either multiple "winners" or a torn final state.
    val blobs = new ConcurrentHashMap[String, Array[Byte]]()
    val sloppy = new CommitStore {
      override def putIfAbsent(fs: FileSystem, logDir: HPath, dst: HPath,
          bytes: Array[Byte]): Unit = {
        val k = dst.toString
        if (blobs.containsKey(k)) // check ...
          throw new java.io.IOException(s"$k already exists")
        Thread.sleep(5) // ... window ...
        blobs.put(k, bytes) // ... act: NOT atomic with the check
      }
    }
    val (fs, logDir) = localFsAndDir("sloppy_race")
    val dst = new HPath(logDir, "00000001.json")
    val (wins, _) = race(sloppy, fs, logDir, dst, 8)
    assert(wins > 1,
      "the check-then-act store must exhibit the multi-winner anomaly " +
        s"the seam exists to prevent (got $wins winners)")
  }
}
