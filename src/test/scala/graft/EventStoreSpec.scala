package graft

import graft.codec.Codec
import graft.core.EventRow
import graft.log.{AppendRecord, ConcurrentModificationException, EventDetail, EventLog}
import graft.store.EventStore
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Golden scenarios from the reference test suite (FIXTURES.md §3), re-run
  * against the Parquet event log: G1 rehydration, G5 forget, G6 migration,
  * G8 optimistic concurrency.
  */
class EventStoreSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def freshLog(buckets: Int = 4): EventLog = {
    val dir = Files.createTempDirectory("graftlog").toFile.getAbsolutePath
    new EventLog(spark, dir, numBuckets = buckets, ulidSeed = Some(42L))
  }

  test("G1: save/retrieve — fold with snapshot threshold 3, balance 136") {
    val store = new EventStore(freshLog(), AccountType, snapshotThreshold = 3)
    val id = "01HXAMPLEACCT00000000000A1"
    store.create(id, Seq(
      AccountType.created(100, "Paulo"),
      AccountType.deposited(10),
      AccountType.deposited(20)), nowMs = 1700000000000L)

    // snapshot written at version 3 with the exact golden body
    val snap = store.log.latestSnapshot(id).get
    assert(snap.aggregate_version == 3)
    assert(snap.body == """{"status":"OPEN","balance":130,"owner":"Paulo"}""")

    val v = store.update(id)(_ => Seq(
      AccountType.deposited(5), AccountType.deposited(1)), nowMs = 1700000001000L)
    assert(v == 5)

    val got = store.retrieve(id)
    assert(got.state == Account("OPEN", 136, "Paulo"))
    assert(got.version == 5)

    // log shape: versions 1..5, kinds as per golden
    val rows = store.log.streamEvents(id).collect()
    assert(rows.map(_.getAs[Int]("aggregate_version")).toSeq == (1 to 5))
    assert(rows.map(_.getAs[String]("kind")).toSeq ==
      Seq("AccountCreated", "MoneyDeposited", "MoneyDeposited", "MoneyDeposited", "MoneyDeposited"))
    // no snapshot past version 3 (2 new events < threshold)
    assert(store.log.latestSnapshot(id).get.aggregate_version == 3)
  }

  test("G8b: genuinely concurrent writers (threads) — exactly one append wins") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val log = freshLog()
    val id = "01HXAMPLERACE000000000001"
    log.append(Seq(AppendRecord(id, "Account", 0, Map.empty,
      Seq(AccountType.created(100, "R")))))
    // both writers observed version 1; they race the commit section
    val attempts = Future.traverse(1 to 2) { i =>
      Future {
        try { log.append(Seq(AppendRecord(id, "Account", 1, Map.empty,
          Seq(AccountType.deposited(i))))); true }
        catch { case _: ConcurrentModificationException => false }
      }
    }
    val results = Await.result(attempts, 120.seconds)
    assert(results.count(identity) == 1, s"exactly one writer must win, got $results")
    assert(log.streamEvents(id).count() == 2)
  }

  test("S4/A5/F4: byIds point fetch, distinct streams per kind, custom filter predicate") {
    val store = new EventStore(freshLog(), AccountType, snapshotThreshold = 99)
    val ids = Seq("01HXAMPLEACCT00000000000A1", "01HXAMPLEACCT00000000000A2",
      "01HXAMPLEACCT00000000000A3")
    ids.zipWithIndex.foreach { case (id, i) =>
      store.create(id, Seq(AccountType.created(100 + i, s"owner$i"),
        AccountType.deposited(i)), nowMs = 1700000000000L + i)
    }

    // S4: fetch exactly the requested event ids (store.go:665-674 semantics)
    val twoIds = store.log.streamEvents(ids.head).collect().map(_.getAs[String]("id")).toSeq
    val got = store.log.byIds(twoIds).collect()
    assert(got.map(_.getAs[String]("id")).toSet == twoIds.toSet)
    assert(got.forall(_.getAs[String]("aggregate_id") == ids.head))

    // A5: one row per stream, restricted by kind
    assert(store.log.distinctStreams(Some("Account")).collect()
      .map(_.getString(0)).toSet == ids.toSet)
    assert(store.log.distinctStreams(Some("NoSuchKind")).count() == 0)
    assert(store.log.distinctStreams(None).count() == 3)

    // F4: arbitrary custom predicate composes into the pushdown conjunction
    import org.apache.spark.sql.functions.col
    val f = graft.replay.EventFilter(aggregateKinds = Seq("Account"),
      custom = Some(col("kind") === "AccountCreated"))
    val created = store.log.activeEvents.filter(f.toColumn).collect()
    assert(created.length == 3)
    assert(created.forall(_.getAs[String]("kind") == "AccountCreated"))
  }

  test("S5: outbox polling walks the log exactly once in id order via keyset cursor") {
    val store = new EventStore(freshLog(), AccountType, snapshotThreshold = 99)
    (1 to 3).foreach { i =>
      store.create(s"01HXAMPLEACCT0000000000OB$i", Seq(
        AccountType.created(i, s"o$i"), AccountType.deposited(i),
        AccountType.deposited(i * 2)), nowMs = 1700000000000L + i * 1000)
    }
    // poll in batches of 4 until drained, acking by last seen id
    var cursor = ""
    var seen = Vector.empty[String]
    var batch = store.log.outboxBatch(cursor, limit = 4).collect()
    while (batch.nonEmpty) {
      val ids = batch.map(_.getAs[String]("id")).toVector
      assert(ids == ids.sorted, "batch must be id-ordered")
      seen ++= ids
      cursor = ids.last
      batch = store.log.outboxBatch(cursor, limit = 4).collect()
    }
    // 9 events, batches of 4 → 4+4+1, no repeats, no gaps, global id order
    assert(seen.length == 9 && seen.distinct.length == 9 && seen == seen.sorted)
    val all = store.log.activeEvents.orderBy("id").collect().map(_.getAs[String]("id"))
    assert(seen == all.toVector)
  }

  test("retrieve of an unknown stream raises UnknownAggregateException") {
    val store = new EventStore(freshLog(), AccountType)
    intercept[graft.store.UnknownAggregateException] {
      store.retrieve("01HXNOSUCHSTREAM000000000")
    }
  }

  test("snapshot threshold accumulates across updates (tail counter survives)") {
    val store = new EventStore(freshLog(), AccountType, snapshotThreshold = 3)
    val id = "01HXSNAPACCUM000000000001"
    store.create(id, Seq(AccountType.created(100, "P"))) // 1 < 3: no snapshot
    assert(store.log.latestSnapshot(id).isEmpty)
    store.update(id)(_ => Seq(AccountType.deposited(1))) // tail 2 < 3
    assert(store.log.latestSnapshot(id).isEmpty)
    store.update(id)(_ => Seq(AccountType.deposited(2))) // tail 3 >= 3: snapshot at v3
    val snap = store.log.latestSnapshot(id).get
    assert(snap.aggregate_version == 3)
    assert(AccountType.decodeState(snap.body).balance == 103)
    store.update(id)(_ => Seq(AccountType.deposited(3))) // 1 since snap: none
    assert(store.log.latestSnapshot(id).get.aggregate_version == 3)
    assert(store.retrieve(id).state.balance == 106)
  }

  test("commit lock file: held during append, released after, stale locks broken") {
    val log = freshLog()
    val lockFile = new java.io.File(log.path, ".graft.commit.lock")
    log.append(Seq(AppendRecord("01HXLOCKFILE0000000000001", "Account", 0, Map.empty,
      Seq(AccountType.created(1, "L")))))
    assert(!lockFile.exists(), "lock must be released after the commit section")
    // a stale lock (e.g. a crashed writer) does not wedge the log forever
    assert(lockFile.createNewFile())
    lockFile.setLastModified(System.currentTimeMillis() - 10 * 60 * 1000L)
    log.append(Seq(AppendRecord("01HXLOCKFILE0000000000001", "Account", 1, Map.empty,
      Seq(AccountType.deposited(1)))))
    assert(!lockFile.exists())
    assert(new EventStore(log, AccountType).retrieve("01HXLOCKFILE0000000000001").version == 2)
  }

  test("aggregate kinds are isolated: two stores share one log without crosstalk") {
    val log = freshLog()
    val accounts = new EventStore(log, AccountType)
    accounts.create("01HXMIXACCT00000000000001", Seq(AccountType.created(100, "P")))
    log.append(Seq(AppendRecord("01HXMIXORDER0000000000002", "Order", 0, Map.empty,
      Seq(EventDetail("OrderPlaced", """{"sku":"x"}""")))))
    val spark2 = spark
    import spark2.implicits._
    val states = accounts.rehydrateAll().collect().toMap
    assert(states.keySet == Set("01HXMIXACCT00000000000001"))
    assert(log.activeEvents.count() == 2) // both kinds live in the log
  }

  test("as-of read: state at an instant ignores later events and later snapshots") {
    val store = new EventStore(freshLog(), AccountType, snapshotThreshold = 2)
    val id = "01HXASOFACCT0000000000001"
    val t1 = 1700000000000L
    val t2 = t1 + 86400000L // +1 day
    store.create(id, Seq(AccountType.created(100, "P"), AccountType.deposited(10)), nowMs = t1)
    store.update(id)(_ => Seq(AccountType.deposited(50), AccountType.ownerUpdated("Q")), nowMs = t2)

    val asOf = store.retrieveAt(id, t1 + 3600000L) // one hour after the first tx
    assert(asOf.state == Account("OPEN", 110, "P"))
    assert(asOf.version == 2)
    val now = store.retrieve(id)
    assert(now.state == Account("OPEN", 160, "Q") && now.version == 4)

    val spark2 = spark
    import spark2.implicits._
    val all = store.rehydrateAllAt(t1 + 3600000L).collect().toMap
    assert(all(id) == Account("OPEN", 110, "P"))
    // before the stream existed → empty / unknown
    assert(store.rehydrateAllAt(t1 - 1000L).isEmpty)
    intercept[graft.store.UnknownAggregateException] {
      store.retrieveAt(id, t1 - 1000L)
    }
  }

  test("G8: two writers at the same base version — exactly one succeeds") {
    val log = freshLog()
    val store = new EventStore(log, AccountType)
    val id = "01HXAMPLEACCT00000000000B2"
    store.create(id, Seq(AccountType.created(100, "P")))
    // both writers read version 1, then race their appends
    log.append(Seq(AppendRecord(id, "Account", 1, Map.empty,
      Seq(AccountType.deposited(5)))))
    val ex = intercept[ConcurrentModificationException] {
      log.append(Seq(AppendRecord(id, "Account", 1, Map.empty,
        Seq(AccountType.deposited(7)))))
    }
    assert(ex.getMessage.contains("expected version 1"))
    assert(store.retrieve(id).state.balance == 105)
  }

  test("G5: forget scrubs owner from OwnerUpdated events and snapshots, count unchanged") {
    val store = new EventStore(freshLog(), AccountType, snapshotThreshold = 2)
    val id = "01HXAMPLEACCT00000000000C3"
    store.create(id, Seq(AccountType.created(100, "Paulo"), AccountType.ownerUpdated("Paulo Pereira")))
    store.update(id)(_ => Seq(AccountType.deposited(10), AccountType.ownerUpdated("Paulo Quintans")))

    def scrubOwner(body: String): String = {
      val n = Codec.parse(body).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      if (n.has("owner")) n.put("owner", "")
      Codec.write(n)
    }
    store.forget(id, Set("OwnerUpdated"))(scrubOwner, scrubOwner)

    val evs = store.log.streamEvents(id).collect()
    assert(evs.length == 4) // count unchanged
    val owners = evs.filter(_.getAs[String]("kind") == "OwnerUpdated")
      .map(r => Codec.parse(r.getAs[String]("body")).get("owner").asText())
    assert(owners.length == 2 && owners.forall(_ == ""))
    // AccountCreated keeps its owner (only targeted kinds are scrubbed)
    val created = evs.filter(_.getAs[String]("kind") == "AccountCreated")
      .map(r => Codec.parse(r.getAs[String]("body")).get("owner").asText())
    assert(created.head == "Paulo")
    // all snapshots scrubbed
    val snaps = store.log.snapshots.filter(org.apache.spark.sql.functions.col("aggregate_id") === id).collect()
    assert(snaps.nonEmpty)
    snaps.foreach { r =>
      assert(Codec.parse(r.getAs[String]("body")).get("owner").asText() == "")
    }
  }

  test("G6: migration — 9-row golden log and Account_V2 snapshot, balance 105") {
    val store = new EventStore(freshLog(), AccountType, snapshotThreshold = 3)
    val id = "01HXAMPLEACCT00000000000D4"
    store.create(id, Seq(
      AccountType.created(100, "Paulo Pereira"),
      AccountType.deposited(20),
      AccountType.withdrawn(15),
      AccountType.ownerUpdated("Paulo Quintans Pereira")), nowMs = 1700000000000L)

    store.migrate(1, Set("AccountCreated", "OwnerUpdated"), AccountV2Type)(evs => {
      val out = evs.map { e =>
        e.kind match {
          case "AccountCreated" =>
            val n = Codec.parse(e.body)
            val (f, l) = AccountV2Type.splitName(n.get("owner").asText())
            AccountV2Type.createdV2(n.get("money").asLong(), f, l)
          case "OwnerUpdated" =>
            val n = Codec.parse(e.body)
            val (f, l) = AccountV2Type.splitName(n.get("owner").asText())
            AccountV2Type.ownerUpdatedV2(f, l)
          case _ => EventDetail(e.kind, e.body)
        }
      }
      Some(out)
    }, nowMs = 1700000002000L)

    import org.apache.spark.sql.functions.col
    val all = store.log.events.filter(col("aggregate_id") === id)
      .orderBy("aggregate_version").collect()
    assert(all.length == 9, "exactly 9 rows after migration")

    // rows 1-4: originals, invalidated by revision 1
    (0 to 3).foreach { i =>
      assert(all(i).getAs[Int]("migration") == 1)
      assert(!all(i).getAs[Boolean]("migrated"))
    }
    assert(all.take(4).map(_.getAs[String]("kind")).toSeq ==
      Seq("AccountCreated", "MoneyDeposited", "MoneyWithdrawn", "OwnerUpdated"))
    // row 5: the Invalidated fence
    assert(all(4).getAs[String]("kind") == "Invalidated")
    assert(all(4).getAs[Int]("aggregate_version") == 5)
    assert(all(4).getAs[Int]("migration") == 1)
    assert(all(4).getAs[String]("body") == "{}")
    // rows 6-9: migrated copies, active
    assert(all.drop(5).map(_.getAs[String]("kind")).toSeq ==
      Seq("AccountCreated_V2", "MoneyDeposited", "MoneyWithdrawn", "OwnerUpdated_V2"))
    assert(all.drop(5).map(_.getAs[Int]("aggregate_version")).toSeq == Seq(6, 7, 8, 9))
    all.drop(5).foreach { r =>
      assert(r.getAs[Int]("migration") == 0)
      assert(r.getAs[Boolean]("migrated"))
    }

    // exactly one snapshot: the migrated state at version 9, golden body
    val snaps = store.log.snapshots.filter(col("aggregate_id") === id).collect()
    assert(snaps.length == 1)
    assert(snaps.head.getAs[String]("aggregate_kind") == "Account_V2")
    assert(snaps.head.getAs[Int]("aggregate_version") == 9)
    assert(snaps.head.getAs[String]("body") ==
      """{"status":"OPEN","balance":105,"owner":{"firstName":"Paulo","lastName":"Quintans Pereira"}}""")

    // V2 store reads the migrated stream: balance 105
    val storeV2 = new EventStore(store.log, AccountV2Type, snapshotThreshold = 3)
    val got = storeV2.retrieve(id)
    assert(got.state == AccountV2("OPEN", 105, "Paulo", "Quintans Pereira"))
    assert(got.version == 9)
  }

  test("migrate's driver-side summary is capped by graft.migrate.collectMax") {
    val store = new EventStore(freshLog(), AccountType)
    val ids = (1 to 3).map(i => f"01HXAMPLECAP000000000000$i%02d")
    ids.foreach(id => store.create(id, Seq(AccountType.created(10, "o")),
      nowMs = 1700000000000L))
    store.log.spark.conf.set("graft.migrate.collectMax", "2")
    try {
      val e = intercept[IllegalStateException] {
        store.migrate(1, Set("AccountCreated"), AccountType)(evs =>
          Some(evs.map(r => EventDetail(r.kind, r.body))), nowMs = 1700000002000L)
      }
      assert(e.getMessage.contains("migrateDistributed"),
        "the error must name the scale path")
      // the cap aborts the driver COLLECT, not the migration — rewrites landed
      import org.apache.spark.sql.functions.col
      assert(store.log.events
        .filter(col("aggregate_id").isin(ids: _*) && col("migrated")).count() === 3L)
    } finally store.log.spark.conf.unset("graft.migrate.collectMax")
  }

  test("EventLog.migrate's compat collect is capped too; the migration still lands") {
    val log = freshLog()
    val store = new EventStore(log, AccountType)
    val ids = (1 to 3).map(i => f"01HXAMPLELOGCAP0000000000$i%01d")
    ids.foreach(id => store.create(id, Seq(AccountType.created(10, "o")),
      nowMs = 1700000000000L))
    log.spark.conf.set("graft.migrate.collectMax", "2")
    try {
      val e = intercept[IllegalStateException] {
        log.migrate(1, Set("AccountCreated"), evs =>
          Some(evs.map(r => EventDetail(r.kind, r.body))),
          nowMs = 1700000002000L)
      }
      assert(e.getMessage.contains("migrateDistributed"),
        "the error must name the scale path")
      // the cap aborts the driver COLLECT, not the migration — rewrites landed
      import org.apache.spark.sql.functions.col
      assert(log.events
        .filter(col("aggregate_id").isin(ids: _*) && col("migrated")).count() === 3L)
    } finally log.spark.conf.unset("graft.migrate.collectMax")
  }

  test("M3: upcast-at-read lifts V1 payloads through the chain") {
    val store = new EventStore(freshLog(), AccountV2Type, codec = AccountV2Type.upcasters)
    val id = "01HXAMPLEACCT00000000000E5"
    // V1-shaped payloads in the log...
    store.log.append(Seq(AppendRecord(id, "Account_V2", 0, Map.empty, Seq(
      AccountType.created(100, "Paulo Pereira"),
      AccountType.deposited(20),
      AccountType.ownerUpdated("Paulo Quintans Pereira")))))
    // ...read through the upcaster chain as V2
    val got = store.retrieve(id)
    assert(got.state == AccountV2("OPEN", 120, "Paulo", "Quintans Pereira"))
  }

  test("A1 at scale: rehydrateAll folds every stream in one distributed pass") {
    val log = freshLog()
    val store = new EventStore(log, AccountType)
    val ids = (1 to 20).map(i => f"01HXAMPLEACCTBULK${i}%09d")
    ids.zipWithIndex.foreach { case (id, i) =>
      store.create(id, Seq(AccountType.created(100 * (i + 1), s"owner$i")))
      store.update(id)(_ => Seq(AccountType.deposited(i)))
    }
    val spark2 = spark
    import spark2.implicits._
    val states = store.rehydrateAll().collect().toMap
    assert(states.size == 20)
    ids.zipWithIndex.foreach { case (id, i) =>
      assert(states(id) == Account("OPEN", 100L * (i + 1) + i, s"owner$i"))
    }
  }
}
