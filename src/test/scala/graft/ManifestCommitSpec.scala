package graft

import graft.log.{AppendRecord, CommitClaim, CommitMode, ConcurrentModificationException, EventDetail, EventLog}
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The object-store-safe commit protocol: conditional-put claim chain with
  * version reservations (README roadmap #1). Single primitive under test:
  * create-if-absent — everything else must follow from the protocol.
  */
class ManifestCommitSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def newLog(buckets: Int = 4): EventLog = {
    val dir = Files.createTempDirectory("graftmanifest").toFile.getAbsolutePath
    new EventLog(spark, dir, numBuckets = buckets, ulidSeed = Some(21L),
      commitMode = CommitMode.Manifest)
  }

  private def rec(id: String, v: Int, n: Int = 1) =
    AppendRecord(id, "Account", v, Map.empty,
      (1 to n).map(i => EventDetail("Deposited", s"""{"amount":$i}""")))

  test("appends commit through sequential claims and stay readable") {
    val log = newLog()
    log.append(Seq(rec("m-a", 0, 2)))
    log.append(Seq(rec("m-b", 0, 1)))
    log.append(Seq(rec("m-a", 2, 1)))
    assert(log.events.count() === 4L)
    assert(log.streamEvents("m-a").collect().map(_.getInt(3)).toSeq === Seq(1, 2, 3))
    val claims = log.manifest.claims()
    assert(claims.map(_.n) === Seq(1L, 2L, 3L), "claims must be gap-free and ordered")
    assert(claims.forall(_.done), "all commits finished, so all claims carry done markers")
    assert(claims.head.streams === Map("m-a" -> (0, 2)))
    assert(claims.head.eventIds.size === 2)
  }

  test("lost optimistic check throws, exactly like the lock path") {
    val log = newLog()
    log.append(Seq(rec("m-c", 0)))
    intercept[ConcurrentModificationException] {
      log.append(Seq(rec("m-c", 0))) // stale expectedVersion
    }
    assert(log.events.count() === 1L, "failed append must not write")
  }

  test("a crashed claimant's reservation is honored: no version reuse, only a gap") {
    val log = newLog()
    log.append(Seq(rec("m-d", 0))) // v1, claim 1
    // simulate a writer that claimed versions 2..3 and died before writing data
    log.manifest.refresh()
    assert(log.manifest.tryClaim(CommitClaim(2L, Map("m-d" -> (1, 3)), Seq.empty,
      "dead-writer", System.currentTimeMillis(), done = false)))
    // a writer validating against parquet alone would accept expected=1 and
    // reuse versions 2..3 — the reservation must reject it
    intercept[ConcurrentModificationException] {
      log.append(Seq(rec("m-d", 1)))
    }
    // acknowledging the reservation continues past the gap
    log.append(Seq(rec("m-d", 3)))
    assert(log.streamEvents("m-d").collect().map(_.getInt(3)).toSeq === Seq(1, 4),
      "versions 2..3 stay a permanent gap; no duplicates")
  }

  test("racing writers commit safely: every commit lands, claims stay unique") {
    // 4 writers: 2-writer contention failed to surface the local-rename
    // overwrite bug that 4-writer contention caught in ScaleSmoke — the
    // claim primitive must be atomic-exclusive, and this is its fence
    val writers = 4
    val rounds = 3
    val logA = newLog()
    val logs = logA +: (1 until writers).map(i => new EventLog(spark, logA.path,
      numBuckets = 4, ulidSeed = Some(22L + i), commitMode = CommitMode.Manifest))
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val futures = logs.zipWithIndex.map { case (log, i) =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          (0 until rounds).foreach(v => log.append(Seq(rec(s"race-$i", v))))
        }
      })
    }
    start.countDown()
    try futures.foreach(_.get(180, TimeUnit.SECONDS))
    finally { pool.shutdownNow(); () }
    (0 until writers).foreach { i =>
      assert(logA.streamEvents(s"race-$i").count() === rounds.toLong)
    }
    val ns = logA.manifest.claims().map(_.n)
    assert(ns === (1L to writers.toLong * rounds),
      s"claim chain must be dense and unique, got $ns")
  }

  test("pruned chain keeps committing (heads recovered from parquet)") {
    val log = newLog()
    (0 until 4).foreach(v => log.append(Seq(rec("m-p", v))))
    val heads = Map("m-p" -> 4)
    val removed = log.manifest.prune(heads)
    assert(removed === 3, "everything but the tip is reflected in parquet")
    // a fresh process (new chain cache) must still validate correctly
    val log2 = new EventLog(spark, log.path, numBuckets = 4,
      ulidSeed = Some(23L), commitMode = CommitMode.Manifest)
    log2.append(Seq(rec("m-p", 4)))
    assert(log2.streamEvents("m-p").collect().map(_.getInt(3)).toSeq === (1 to 5))
  }

  test("committedEvents hides claims whose done marker is missing (read-committed)") {
    val log = newLog()
    log.append(Seq(rec("rc-a", 0)))
    log.append(Seq(rec("rc-b", 0, 2)))
    assert(log.committedEvents.count() === 3L)
    // simulate a claimant that wrote data but died before markDone
    val dir = new java.io.File(log.path, graft.log.ManifestCommitLog.CommitDir)
    assert(new java.io.File(dir, "v2.done").delete(), "fixture must delete the marker")
    val log2 = new EventLog(spark, log.path, numBuckets = 4, commitMode = CommitMode.Manifest)
    assert(log2.events.count() === 3L, "raw view still sees the files")
    assert(log2.committedEvents.count() === 1L, "read-committed view hides claim 2")
    assert(log2.committedEvents.select("aggregate_id").collect().map(_.getString(0)).toSeq
      === Seq("rc-a"))
    // catchup replay reads the same view: the pending claim must not replay
    assert(log2.range("", "").count() === 1L)
  }

  test("lock-mode logs keep an empty chain") {
    val dir = Files.createTempDirectory("graftlockmode").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 2, ulidSeed = Some(24L))
    log.append(Seq(rec("l-a", 0)))
    assert(log.manifest.claims().isEmpty)
  }
}
