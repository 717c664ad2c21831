package graft

import graft.codec.Codec
import graft.log.EventLog
import graft.replay.EventFilter
import graft.store.EventStore
import graft.streaming.{ProjMessage, Projector}
import java.nio.file.Files
import org.apache.spark.sql.Dataset
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** G7: catchup → switch → live e2e with checkpoint dedup
  * (reference: test/integration/kafka/e2e_kafka_proj_test.go:50-182).
  */
class ProjectorSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def tempDir = Files.createTempDirectory("graftproj").toFile.getAbsolutePath

  private def fold(msgs: Seq[ProjMessage]): Map[String, Long] =
    msgs.filter(m => m.meta_kind == "catchup" || m.meta_kind == "live")
      .sortBy(_.id)
      .groupBy(_.aggregate_id)
      .map { case (id, ms) =>
        var acc = AccountType.empty
        ms.foreach(m => acc = AccountType.fold(acc, m.kind, m.body))
        acc.owner -> acc.balance
      }

  test("G7: catchup delivers history + switch; live delivers only new events; restart dedups") {
    val log = new EventLog(spark, tempDir, numBuckets = 4, ulidSeed = Some(11L))
    val store = new EventStore(log, AccountType)
    val accId = "01HXAMPLEPROJACCT000000001"
    val t0 = 1700000000000L
    store.create(accId, Seq(
      AccountType.created(100, "Paulo"),
      AccountType.deposited(10),
      AccountType.deposited(20)), nowMs = t0)

    val statePath = tempDir
    val proj = new Projector(log, "balances", statePath,
      filter = EventFilter(aggregateKinds = Seq("Account")),
      partitions = 2, untilOffsetMs = 60000L)

    val buf = ArrayBuffer[ProjMessage]()
    val handle: Dataset[ProjMessage] => Unit =
      ds => buf.synchronized { buf ++= ds.collect(); () }

    // ── catchup at t0+2min: all 3 events are older than until = now−1min ──
    val until = proj.catchup(handle, nowMs = t0 + 120000L)
    assert(buf.count(_.meta_kind == "catchup") == 3)
    assert(buf.count(_.meta_kind == "switch") == 1)
    val sw = buf.find(_.meta_kind == "switch").get
    assert(sw.id == until && sw.aggregate_id == "")
    assert(fold(buf.toSeq) == Map("Paulo" -> 130L)) // golden: balance 130

    // ── live: initial files are all ≤ the switch watermark → rejected ─────
    val q = proj.live(handle)
    try {
      q.processAllAvailable()
      assert(buf.size == 4, "no duplicates from the overlap re-read")

      // a new event lands after the watermark
      store.update(accId)(_ => Seq(AccountType.withdrawn(15)), nowMs = t0 + 300000L)
      q.processAllAvailable()
      assert(buf.count(_.meta_kind == "live") == 1)
      assert(buf.find(_.meta_kind == "live").get.sequence == 1L,
        "live messages carry the per-partition bus sequence")
      assert(buf.size == 5, "golden: 5 messages total")
      assert(fold(buf.toSeq) == Map("Paulo" -> 115L)) // golden: balance 115
    } finally q.stop()

    // ── restart the live stream from saved checkpoints: nothing re-delivered ──
    val buf2 = ArrayBuffer[ProjMessage]()
    val proj2 = new Projector(log, "balances", s"$statePath/restart",
      filter = EventFilter(aggregateKinds = Seq("Account")), partitions = 2)
    // reuse the same checkpoint table
    val cps = proj.checkpoints.load("balances")
    proj2.checkpoints.save(cps.values.toSeq)
    val q2 = proj2.live(ds => buf2.synchronized { buf2 ++= ds.collect(); () })
    try {
      q2.processAllAvailable()
      assert(buf2.isEmpty, "checkpoint dedup rejects already-handled ids")
    } finally q2.stop()
  }

  test("G7 at 8 partitions: fan-out catchup + live, per-partition sequences, restart dedups") {
    // the reference e2e shape (e2e_kafka_proj_test.go:109-182) at real
    // parallelism: 100 streams over 8 dedup partitions (default = numBuckets)
    val log = new EventLog(spark, tempDir, numBuckets = 8, ulidSeed = Some(17L))
    import graft.log.{AppendRecord, EventDetail}
    val t0 = 1700000000000L
    val ids = (1 to 100).map(i => f"01HXMULTIPART${i}%013d")
    log.append(ids.map(id => AppendRecord(id, "Account", 0, Map.empty,
      Seq(AccountType.created(10, s"o-$id"), AccountType.deposited(1)))), nowMs = t0)

    val proj = new Projector(log, "mp", tempDir,
      filter = EventFilter(aggregateKinds = Seq("Account")))
    assert(proj.numPartitions == 8, "default parallelism follows log.numBuckets")

    val buf = ArrayBuffer[ProjMessage]()
    val handle: Dataset[ProjMessage] => Unit =
      ds => buf.synchronized { buf ++= ds.collect(); () }
    proj.catchup(handle, nowMs = t0 + 120000L)
    val caught = buf.filter(_.meta_kind == "catchup")
    assert(caught.size == 200)
    assert(caught.map(_.partition).distinct.size == 8,
      "100 streams must fan out over all 8 partitions")

    val q = proj.live(handle)
    try {
      q.processAllAvailable()
      assert(buf.count(_.meta_kind == "live") == 0, "overlap re-read rejected")
      log.append(ids.take(40).map(id => AppendRecord(id, "Account", 2, Map.empty,
        Seq(AccountType.withdrawn(1)))), nowMs = t0 + 300000L)
      q.processAllAvailable()
      val live = buf.filter(_.meta_kind == "live")
      assert(live.size == 40)
      // per-partition bus sequences are 1..k and ordered by id
      live.groupBy(_.partition).foreach { case (p, ms) =>
        assert(ms.sortBy(_.id).map(_.sequence) == (1L to ms.size), s"partition $p")
      }
    } finally q.stop()

    // restart from saved checkpoints at the same parallelism: no re-delivery
    val buf2 = ArrayBuffer[ProjMessage]()
    val proj2 = new Projector(log, "mp", s"$tempDir/restart-mp",
      filter = EventFilter(aggregateKinds = Seq("Account")))
    proj2.checkpoints.save(proj.checkpoints.load("mp").values.toSeq)
    val q2 = proj2.live(ds => buf2.synchronized { buf2 ++= ds.collect(); () })
    try {
      q2.processAllAvailable()
      assert(buf2.isEmpty, "checkpoint dedup rejects every already-handled id")
      log.append(Seq(AppendRecord(ids.head, "Account", 3, Map.empty,
        Seq(AccountType.deposited(5)))), nowMs = t0 + 600000L)
      q2.processAllAvailable()
      assert(buf2.map(_.aggregate_id).toSeq == Seq(ids.head),
        "only the post-restart event is delivered")
      val prior = buf.count(m => m.meta_kind == "live" &&
        m.partition == buf2.head.partition)
      assert(buf2.head.sequence == prior + 1L,
        "partition sequence continues from the checkpoint across the restart")
    } finally q2.stop()
  }

  test("incremental catchup: a second run resumes from the previous switch watermark") {
    val log = new EventLog(spark, tempDir, numBuckets = 4, ulidSeed = Some(15L))
    val store = new EventStore(log, AccountType)
    val t0 = 1700000000000L
    val id = "01HXINCRCATCHUP0000000001"
    store.create(id, Seq(AccountType.created(100, "P"), AccountType.deposited(1)), nowMs = t0)

    val proj = new Projector(log, "incr", tempDir, partitions = 2)
    val buf = ArrayBuffer[ProjMessage]()
    val handle: org.apache.spark.sql.Dataset[ProjMessage] => Unit =
      ds => buf.synchronized { buf ++= ds.collect(); () }

    proj.catchup(handle, nowMs = t0 + 120000L)
    assert(buf.count(_.meta_kind == "catchup") == 2)

    // more history lands after the first catchup finished
    store.update(id)(_ => Seq(AccountType.deposited(2)), nowMs = t0 + 300000L)
    store.update(id)(_ => Seq(AccountType.deposited(3)), nowMs = t0 + 310000L)

    buf.clear()
    proj.catchup(handle, nowMs = t0 + 600000L)
    // ONLY the two new events replay — history before the previous switch
    // watermark is not re-delivered
    val second = buf.filter(_.meta_kind == "catchup")
    assert(second.length == 2, s"expected incremental replay of 2, got ${second.length}")
    assert(second.map(m => graft.codec.Codec.parse(m.body).get("money").asLong()).sorted == Seq(2L, 3L))
  }

  test("live stream starts on an EMPTY log and picks up the first-ever event") {
    val log = new EventLog(spark, tempDir, numBuckets = 4, ulidSeed = Some(14L))
    val proj = new Projector(log, "emptystart", tempDir, partitions = 2)
    val buf = ArrayBuffer[ProjMessage]()
    val q = proj.live(ds => buf.synchronized { buf ++= ds.collect(); () })
    try {
      q.processAllAvailable() // empty log: no batches, no crash
      assert(buf.isEmpty)
      new EventStore(log, AccountType)
        .create("01HXEMPTYSTART00000000001", Seq(AccountType.created(9, "E")))
      q.processAllAvailable()
      assert(buf.map(_.aggregate_id).toSeq == Seq("01HXEMPTYSTART00000000001"))
    } finally q.stop()
  }

  test("live stream picks up a NEW bucket directory created after the stream started") {
    val log = new EventLog(spark, tempDir, numBuckets = 64, ulidSeed = Some(13L))
    val store = new EventStore(log, AccountType)
    val t0 = 1700000000000L
    // seed one stream so the source has an initial directory
    store.create("01HXNEWBUCKETSEED00000001", Seq(AccountType.created(1, "Seed")), nowMs = t0)

    val proj = new Projector(log, "newbucket", tempDir, partitions = 2)
    val buf = ArrayBuffer[ProjMessage]()
    proj.catchup(ds => buf.synchronized { buf ++= ds.collect(); () }, nowMs = t0 + 120000L)
    val q = proj.live(ds => buf.synchronized { buf ++= ds.collect(); () })
    try {
      q.processAllAvailable()
      val before = buf.size
      // a brand-new aggregate whose fnv bucket directory did not exist yet
      val freshId = (1 to 1000).map(i => f"01HXNEWBUCKETFRESH${i}%07d")
        .find(id => log.bucketOf(id) != log.bucketOf("01HXNEWBUCKETSEED00000001")).get
      store.create(freshId, Seq(AccountType.created(42, "Fresh")), nowMs = t0 + 300000L)
      q.processAllAvailable()
      val live = buf.drop(before)
      assert(live.exists(m => m.aggregate_id == freshId && m.kind == "AccountCreated"),
        s"expected the new-bucket event to arrive, got ${live.map(m => (m.meta_kind, m.aggregate_id))}")
    } finally q.stop()
  }

  test("filter: discriminator AND-of-ORs and split selector") {
    val log = new EventLog(spark, tempDir, numBuckets = 4, ulidSeed = Some(12L))
    import graft.log.{AppendRecord, EventDetail}
    // two tenants
    log.append(Seq(AppendRecord("01HXTENANTA00000000000001", "Account", 0,
      Map("tenant" -> "xyz"), Seq(AccountType.created(100, "X"), AccountType.deposited(1)))))
    log.append(Seq(AppendRecord("01HXTENANTB00000000000002", "Account", 0,
      Map("tenant" -> "abc"), Seq(AccountType.created(50, "Y")))))

    val xyz = new graft.replay.Player(log)
      .replay("", "", EventFilter(discriminator = Map("tenant" -> Seq("xyz"))))
    assert(xyz.count() == 2) // golden G4 shape: tenant xyz sees its events only
    val both = new graft.replay.Player(log)
      .replay("", "", EventFilter(discriminator = Map("tenant" -> Seq("xyz", "abc"))))
    assert(both.count() == 3) // OR within a key
    val none = new graft.replay.Player(log)
      .replay("", "", EventFilter(discriminator = Map("tenant" -> Seq("xyz"), "geo" -> Seq("eu"))))
    assert(none.count() == 0) // AND across keys

    // split selector partitions the id space completely and disjointly
    val s0 = new graft.replay.Player(log).replay("", "", EventFilter(splits = 2, splitIds = Seq(0)))
    val s1 = new graft.replay.Player(log).replay("", "", EventFilter(splits = 2, splitIds = Seq(1)))
    assert(s0.count() + s1.count() == 3)
    assert(s0.join(s1, Seq("id"), "inner").count() == 0)
  }
}
