package graft

import graft.log.{AppendRecord, CommitClaim, CommitMode, EventLog}
import graft.streaming.{ProjMessage, Projector}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** The live projector's read-committed gate (manifest mode): the file stream
  * lists a claim's staged `c{N}-` files as soon as the writer moves them into
  * the buckets — BEFORE the done-flip. Delivering them unconditionally breaks
  * exactly-once on the crash path: prune deletes a condemned claim's files
  * and the redelivered batch re-appends under fresh (higher) ULIDs, so the
  * monotonic dedup passes both copies. The gate holds each micro-batch until
  * every referenced claim resolves: done → deliver, condemned+pruned → drop.
  */
class LiveCommitGateSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark
  private def tempDir = Files.createTempDirectory("graftgate").toFile.getAbsolutePath

  private val t0 = 1700000000000L

  /** Simulate a writer that claimed, moved its staged files into the buckets,
    * and stalled (or died) before markDone: real parquet bucket files built
    * by a scratch lock-mode log, copied in under the claim token.
    */
  private def craftPendingClaim(log: EventLog, records: Seq[AppendRecord],
      nowMs: Long, tsMs: Long): Long = {
    val scratchDir = tempDir
    val scratch = new EventLog(spark, scratchDir, numBuckets = log.numBuckets,
      ulidSeed = Some(99L))
    scratch.append(records, nowMs)
    log.manifest.refresh()
    val n = log.manifest.claims().map(_.n).foldLeft(0L)(math.max) + 1
    val streams = records.map(r => r.aggregateId ->
      (r.expectedVersion, r.expectedVersion + r.details.size)).toMap
    assert(log.manifest.tryClaim(CommitClaim(n, streams, Seq.empty, "zombie",
      tsMs, done = false)))
    val conf = spark.sessionState.newHadoopConf()
    import org.apache.hadoop.fs.{FileUtil, Path}
    val src = new Path(s"$scratchDir/events")
    val fs = src.getFileSystem(conf)
    fs.listStatus(src)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .foreach { d =>
        val dest = new Path(s"${log.path}/events/${d.getPath.getName}")
        fs.mkdirs(dest)
        fs.listStatus(d.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            FileUtil.copy(fs, f.getPath, fs,
              new Path(dest, s"c$n-${f.getPath.getName}"), false, conf): Unit
          }
      }
    n
  }

  private def dep(n: Int) = AccountType.deposited(n)

  test("live delivers a pending claim's rows only after its done-flip") {
    val log = new EventLog(spark, tempDir, numBuckets = 4, ulidSeed = Some(31L),
      commitMode = CommitMode.Manifest)
    log.append(Seq(AppendRecord("gate-seed", "Account", 0, Map.empty,
      Seq(AccountType.created(1, "S")))), nowMs = t0)

    val buf = ArrayBuffer[(ProjMessage, Long)]()
    val proj = new Projector(log, "gate1", tempDir, partitions = 2)
    val q = proj.live(ds => {
      val rows = ds.collect(); val now = System.currentTimeMillis()
      buf.synchronized { buf ++= rows.map(_ -> now); () }
    })
    try {
      q.processAllAvailable()
      assert(buf.map(_._1.aggregate_id).toSeq == Seq("gate-seed"))

      val n = craftPendingClaim(log,
        Seq(AppendRecord("gate-x", "Account", 0, Map.empty, Seq(dep(1), dep(2)))),
        nowMs = t0 + 60000L, tsMs = System.currentTimeMillis())
      @volatile var doneAt = 0L
      val flipper = new Thread(() => {
        Thread.sleep(2000)
        doneAt = System.currentTimeMillis()
        log.manifest.markDone(n)
      })
      flipper.start()
      q.processAllAvailable() // blocks in the gate until the flip
      flipper.join()
      val xRows = buf.filter(_._1.aggregate_id == "gate-x")
      assert(xRows.size == 2, s"claim $n's rows arrive exactly once after done")
      assert(xRows.forall(_._2 >= doneAt),
        "no row of the claim may be handled before its done-flip")
    } finally q.stop()
  }

  test("a condemned claim's rows are dropped; redelivery lands exactly once") {
    val log = new EventLog(spark, tempDir, numBuckets = 4, ulidSeed = Some(37L),
      commitMode = CommitMode.Manifest)
    log.append(Seq(AppendRecord("gate2-seed", "Account", 0, Map.empty,
      Seq(AccountType.created(1, "S")))), nowMs = t0)

    val buf = ArrayBuffer[ProjMessage]()
    val proj = new Projector(log, "gate2", tempDir, partitions = 2)
    val q = proj.live(ds => buf.synchronized { buf ++= ds.collect(); () })
    try {
      q.processAllAvailable()
      assert(buf.map(_.aggregate_id).toSeq == Seq("gate2-seed"))

      // zombie writer: staged files in place, claim pending, writer dead
      // (claim timestamped old enough for prune to condemn it)
      craftPendingClaim(log,
        Seq(AppendRecord("gate2-x", "Account", 0, Map.empty, Seq(dep(1), dep(2)))),
        nowMs = t0 + 60000L, tsMs = System.currentTimeMillis() - 600000L)
      // an unrelated committed append keeps the condemned claim off the tip
      log.append(Seq(AppendRecord("gate2-z", "Account", 0, Map.empty,
        Seq(dep(9)))), nowMs = t0 + 120000L)
      val pruner = new Thread(() => {
        Thread.sleep(2000)
        log.manifest.prune(Map("gate2-seed" -> 1, "gate2-z" -> 1),
          staleMs = 60000L): Unit
      })
      pruner.start()
      q.processAllAvailable() // gate waits on the pending claim → condemned
      pruner.join()
      assert(!buf.exists(_.aggregate_id == "gate2-x"),
        "a condemned claim's staged rows must never reach the handler")
      assert(buf.count(_.aggregate_id == "gate2-z") == 1)

      // the redelivery (fresh ULIDs, chain-fenced heads) must deliver once
      assert(log.appendBulk(
        { val s = spark; import s.implicits._
          Seq(("gate2-x", "Account", "Deposited", """{"money":1}""", 1),
            ("gate2-x", "Account", "Deposited", """{"money":2}""", 2))
            .toDF("aggregate_id", "aggregate_kind", "kind", "body", "seq") },
        nowMs = t0 + 300000L) == 2L)
      q.processAllAvailable()
      assert(buf.count(_.aggregate_id == "gate2-x") == 2,
        "the redelivered batch is the single visible copy")
    } finally q.stop()
  }

  test("a condemned claim from a clock-skewed writer cannot swallow its redelivery") {
    // the zombie's clock ran an hour AHEAD: its staged rows carry ULIDs far
    // above real time. If the dedup watermark advanced on those rows before
    // the gate dropped them, the legitimate redelivery — minted at true
    // wall-clock, i.e. LOWER ids — would be silently discarded forever.
    // The watermark must move only with rows actually delivered.
    val log = new EventLog(spark, tempDir, numBuckets = 4, ulidSeed = Some(43L),
      commitMode = CommitMode.Manifest)
    log.append(Seq(AppendRecord("gate4-seed", "Account", 0, Map.empty,
      Seq(AccountType.created(1, "S")))), nowMs = t0)

    val buf = ArrayBuffer[ProjMessage]()
    val proj = new Projector(log, "gate4", tempDir, partitions = 2)
    val q = proj.live(ds => buf.synchronized { buf ++= ds.collect(); () })
    try {
      q.processAllAvailable()
      craftPendingClaim(log,
        Seq(AppendRecord("gate4-x", "Account", 0, Map.empty, Seq(dep(1), dep(2)))),
        nowMs = t0 + 3600000L, // skewed one hour ahead
        tsMs = System.currentTimeMillis() - 600000L)
      log.append(Seq(AppendRecord("gate4-z", "Account", 0, Map.empty,
        Seq(dep(9)))), nowMs = t0 + 30000L)
      val pruner = new Thread(() => {
        Thread.sleep(2000)
        log.manifest.prune(Map("gate4-seed" -> 1, "gate4-z" -> 1),
          staleMs = 60000L): Unit
      })
      pruner.start()
      q.processAllAvailable()
      pruner.join()
      assert(!buf.exists(_.aggregate_id == "gate4-x"))

      // redelivery at TRUE wall-clock: ULIDs BELOW the condemned copies'
      assert(log.appendBulk(
        { val s = spark; import s.implicits._
          Seq(("gate4-x", "Account", "Deposited", """{"money":1}""", 1),
            ("gate4-x", "Account", "Deposited", """{"money":2}""", 2))
            .toDF("aggregate_id", "aggregate_kind", "kind", "body", "seq") },
        nowMs = t0 + 120000L) == 2L)
      q.processAllAvailable()
      assert(buf.count(_.aggregate_id == "gate4-x") == 2,
        "lower-ULID redelivery must pass: the watermark never saw the skewed rows")
    } finally q.stop()
  }

  test("a fresh live stream after forget delivers ONE copy — the scrubbed one") {
    // a done rewrite leaves the replaced file and its c{N}- copy side by side
    // until gcReplaced (10-min retention): same ids, different bodies. A
    // fresh projector listing both in one micro-batch must drop the replaced
    // file's rows (committedView parity) — not deliver both copies, and
    // never hand the pre-forget body to the handler.
    val log = new EventLog(spark, tempDir, numBuckets = 4, ulidSeed = Some(47L),
      commitMode = CommitMode.Manifest)
    log.append(Seq(AppendRecord("gate5-x", "Account", 0, Map.empty,
      Seq(AccountType.created(1, "Secret"), dep(5)))), nowMs = t0)
    log.forget("gate5-x", Set("AccountCreated"),
      b => b.replace("Secret", "[gone]"), identity)

    val buf = ArrayBuffer[ProjMessage]()
    val proj = new Projector(log, "gate5", tempDir, partitions = 2)
    val q = proj.live(ds => buf.synchronized { buf ++= ds.collect(); () })
    try {
      q.processAllAvailable()
      assert(buf.size == 2, s"each event exactly once, got ${buf.size}")
      val created = buf.filter(_.kind == "AccountCreated")
      assert(created.size == 1 && created.head.body.contains("[gone]") &&
        !created.head.body.contains("Secret"),
        "the delivered copy must be the scrubbed one")
    } finally q.stop()
  }

  test("live auto-compacts its checkpoint table without losing resume state") {
    val log = new EventLog(spark, tempDir, numBuckets = 4, ulidSeed = Some(53L))
    val statePath = tempDir
    val buf = ArrayBuffer[ProjMessage]()
    val p1 = new Projector(log, "gatec", statePath, partitions = 2, compactEvery = 1)
    val q1 = p1.live(ds => buf.synchronized { buf ++= ds.collect(); () })
    try {
      log.append(Seq(AppendRecord("gatec-a", "Account", 0, Map.empty,
        Seq(AccountType.created(1, "A"), dep(2)))), nowMs = t0)
      q1.processAllAvailable()
      log.append(Seq(AppendRecord("gatec-a", "Account", 2, Map.empty,
        Seq(dep(3)))), nowMs = t0 + 60000L)
      q1.processAllAvailable()
      assert(buf.size == 3)
    } finally q1.stop()

    // restart WITHOUT the engine stream checkpoint: resume rides entirely on
    // the (now compacted) checkpoint table watermarks — nothing redelivers
    val conf = spark.sessionState.newHadoopConf()
    val sc = new org.apache.hadoop.fs.Path(s"$statePath/stream_checkpoint")
    sc.getFileSystem(conf).delete(sc, true): Unit
    val buf2 = ArrayBuffer[ProjMessage]()
    val p2 = new Projector(log, "gatec", statePath, partitions = 2, compactEvery = 1)
    val q2 = p2.live(ds => buf2.synchronized { buf2 ++= ds.collect(); () })
    try {
      q2.processAllAvailable()
      assert(buf2.isEmpty, s"compacted watermarks must suppress redelivery, got $buf2")
      log.append(Seq(AppendRecord("gatec-a", "Account", 3, Map.empty,
        Seq(dep(4)))), nowMs = t0 + 120000L)
      q2.processAllAvailable()
      assert(buf2.map(_.kind).toSeq == Seq("MoneyDeposited") && buf2.head.sequence == 4L,
        "only the new event arrives, with the sequence continuing past the compacted tokens")
    } finally q2.stop()
  }

  test("equal-id copies in one batch: the NEWEST existing file's body wins") {
    // A lock-mode rewrite (forget/compact) briefly leaves the old file and
    // its rewritten copy side by side; both land in one micro-batch with
    // the same ids but different bodies (the rewrite may have scrubbed
    // them). An arbitrary pick could hand the pre-forget body to the
    // handler — the gate must deterministically deliver the youngest
    // file's copy.
    val log = new EventLog(spark, tempDir, numBuckets = 2, ulidSeed = Some(61L))
    log.append(Seq(AppendRecord("nf-a", "Account", 0, Map.empty,
      Seq(AccountType.created(1, "secret")))), nowMs = t0)
    val conf = spark.sessionState.newHadoopConf()
    import org.apache.hadoop.fs.Path
    val events = new Path(s"${log.path}/events")
    val fs = events.getFileSystem(conf)
    val orig = fs.listStatus(events).filter(_.getPath.getName.startsWith("bucket="))
      .flatMap(d => fs.listStatus(d.getPath))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    // craft the "rewritten copy": same id, scrubbed body, younger mtime
    val scrubDir = s"$tempDir/scrub"
    spark.read.parquet(orig.toString)
      .withColumn("body", org.apache.spark.sql.functions.lit("""{"gone":true}"""))
      .coalesce(1).write.parquet(scrubDir)
    val scrubPart = fs.listStatus(new Path(scrubDir))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    val copy = new Path(orig.getParent, s"zz-${scrubPart.getName}")
    org.apache.hadoop.fs.FileUtil.copy(fs, scrubPart, fs, copy, false, conf): Unit
    // make the ordering unambiguous: old file 10 s older than the copy
    val now = System.currentTimeMillis()
    fs.setTimes(orig, now - 10000L, -1L)
    fs.setTimes(copy, now, -1L)

    val buf = ArrayBuffer[ProjMessage]()
    val proj = new Projector(log, "gatenf", tempDir, partitions = 2)
    val q = proj.live(ds => buf.synchronized { buf ++= ds.collect(); () })
    try {
      q.processAllAvailable()
      assert(buf.size == 1, s"equal-id copies must collapse to one delivery, got $buf")
      assert(buf.head.body == """{"gone":true}""",
        s"the newest file's (scrubbed) body must win, got ${buf.head.body}")
    } finally q.stop()
  }

  /** Craft the classic mid-rewrite coexistence with an EQUAL mtime: old file
    * and scrubbed copy, where the copy's name sorts lexically LOWER than the
    * original — so a name-based tie-break would deterministically deliver
    * the WRONG (pre-rewrite) body. Returns (orig, copy, fs).
    */
  private def craftMtimeTie(log: EventLog): (org.apache.hadoop.fs.Path,
      org.apache.hadoop.fs.Path, org.apache.hadoop.fs.FileSystem) = {
    val conf = spark.sessionState.newHadoopConf()
    import org.apache.hadoop.fs.Path
    val events = new Path(s"${log.path}/events")
    val fs = events.getFileSystem(conf)
    val orig = fs.listStatus(events).filter(_.getPath.getName.startsWith("bucket="))
      .flatMap(d => fs.listStatus(d.getPath))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    val scrubDir = s"${log.path}/.scrub-tie"
    spark.read.parquet(orig.toString)
      .withColumn("body", org.apache.spark.sql.functions.lit("""{"gone":true}"""))
      .coalesce(1).write.parquet(scrubDir)
    val scrubPart = fs.listStatus(new Path(scrubDir))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    val copy = new Path(orig.getParent, s"aa-${scrubPart.getName}")
    org.apache.hadoop.fs.FileUtil.copy(fs, scrubPart, fs, copy, false, conf): Unit
    fs.delete(new Path(scrubDir), true): Unit
    val now = System.currentTimeMillis()
    fs.setTimes(orig, now, -1L)
    fs.setTimes(copy, now, -1L)
    (orig, copy, fs)
  }

  test("equal-mtime tie: delivery waits until existence disambiguates the copies") {
    val log = new EventLog(spark, tempDir, numBuckets = 2, ulidSeed = Some(62L))
    log.append(Seq(AppendRecord("tie-a", "Account", 0, Map.empty,
      Seq(AccountType.created(1, "secret")))), nowMs = t0)
    val (orig, _, fs) = craftMtimeTie(log)
    // the rewrite completes moments later: the old copy disappears and
    // existence — not an arbitrary name comparison — picks the survivor
    val deleter = new Thread(() => {
      Thread.sleep(700); fs.delete(orig, false): Unit
    })
    deleter.setDaemon(true); deleter.start()
    val buf = ArrayBuffer[ProjMessage]()
    val proj = new Projector(log, "gatetie", tempDir, partitions = 2)
    val q = proj.live(ds => buf.synchronized { buf ++= ds.collect(); () })
    try {
      q.processAllAvailable()
      assert(buf.size == 1, s"equal-id copies must collapse to one delivery, got $buf")
      assert(buf.head.body == """{"gone":true}""",
        s"the surviving (scrubbed) copy must win the tie, got ${buf.head.body}")
    } finally q.stop()
  }

  test("a persistent equal-mtime tie fails loudly instead of guessing") {
    val log = new EventLog(spark, tempDir, numBuckets = 2, ulidSeed = Some(63L))
    log.append(Seq(AppendRecord("tie-b", "Account", 0, Map.empty,
      Seq(AccountType.created(1, "secret")))), nowMs = t0)
    craftMtimeTie(log): Unit // neither copy ever goes away — crashed rewrite
    val proj = new Projector(log, "gatetie2", tempDir, partitions = 2,
      claimWaitMs = 1500L)
    val q = proj.live(_ => ())
    val e = intercept[Throwable] { q.processAllAvailable() }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("cannot be ordered"),
      s"expected the loud tie failure, got: $messages")
  }

  test("a projector started directly with live() pins its partition count") {
    val log = new EventLog(spark, tempDir, numBuckets = 4, ulidSeed = Some(41L))
    val statePath = tempDir
    val p4 = new Projector(log, "gatemeta", statePath, partitions = 4)
    val q = p4.live(_ => ())
    try q.processAllAvailable() finally q.stop()
    // a reopening at a different count must fail fast, not silently remap
    val p2 = new Projector(log, "gatemeta", statePath, partitions = 2)
    val e = intercept[IllegalArgumentException] { p2.live(_ => ()) }
    assert(e.getMessage.contains("4 partitions"))
  }
}
