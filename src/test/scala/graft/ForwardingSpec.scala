package graft

import graft.log.{AppendRecord, EventLog}
import graft.replay.{EventFilter, Player}
import graft.store.EventStore
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Golden scenarios G2-G4 (FIXTURES.md §3): poll/outbox forwarding and the
  * filtered variants. In the Spark engine the outbox collapses into the
  * replayable log itself, so "forwarding" = an ordered replay through the
  * bus frame; the assertions mirror the reference's (message counts and the
  * replayed balance 135).
  */
class ForwardingSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def freshStore(seed: Long) = {
    val dir = Files.createTempDirectory("graftfwd").toFile.getAbsolutePath
    new EventStore(
      new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(seed)), AccountType)
  }

  private def replayBalance(log: EventLog, filter: EventFilter): (Long, Map[String, Long]) = {
    val msgs = new Player(log).replayOrdered("", "", filter)
      .select("aggregate_id", "kind", "body", "aggregate_kind").collect()
    val folded = msgs.filter(_.getString(3) == "Account")
      .groupBy(_.getString(0)).map { case (_, rows) =>
        var acc = AccountType.empty
        rows.foreach(r => acc = AccountType.fold(acc, r.getString(1), r.getString(2)))
        acc.owner -> acc.balance
      }
    (msgs.length.toLong, folded)
  }

  test("G2: forward all events in order — 4 messages, replayed balance 135") {
    val store = freshStore(41L)
    val id = "01HXFORWARDACCT0000000001"
    store.create(id, Seq(
      AccountType.created(100, "Paulo"),
      AccountType.deposited(10),
      AccountType.deposited(20)))
    store.update(id)(_ => Seq(AccountType.deposited(5)))
    val (n, balances) = replayBalance(store.log, EventFilter())
    assert(n == 4)
    assert(balances == Map("Paulo" -> 135L))
  }

  test("G3: aggregate-kind filter forwards only matching kinds — 4 events") {
    val store = freshStore(42L)
    val id = "01HXFORWARDACCT0000000002"
    store.create(id, Seq(AccountType.created(100, "Paulo"), AccountType.deposited(10),
      AccountType.deposited(20)))
    store.update(id)(_ => Seq(AccountType.deposited(5)))
    // noise from another aggregate kind
    store.log.append(Seq(AppendRecord("01HXOTHERAGG0000000000003", "Order", 0, Map.empty,
      Seq(graft.log.EventDetail("OrderPlaced", """{"x":1}""")))))

    val (nAll, _) = replayBalance(store.log, EventFilter())
    assert(nAll == 5)
    val (n, balances) = replayBalance(store.log, EventFilter(aggregateKinds = Seq("Account")))
    assert(n == 4)
    assert(balances == Map("Paulo" -> 135L))
  }

  test("G4: discriminator filter — tenant xyz sees 4 events (balance 135), abc sees 2") {
    val dir = Files.createTempDirectory("graftfwd4").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4,
      discriminatorKeys = Set("tenant"), ulidSeed = Some(43L))
    val xyz = new EventStore(log, AccountType, discriminator = Map("tenant" -> "xyz"))
    val abc = new EventStore(log, AccountType, discriminator = Map("tenant" -> "abc"))
    val idX = "01HXTENANTXYZ000000000001"
    val idA = "01HXTENANTABC000000000002"
    xyz.create(idX, Seq(AccountType.created(100, "Paulo"), AccountType.deposited(10),
      AccountType.deposited(20)))
    xyz.update(idX)(_ => Seq(AccountType.deposited(5)))
    abc.create(idA, Seq(AccountType.created(50, "Quintans"), AccountType.deposited(1)))

    val (nX, balX) = replayBalance(log, EventFilter(discriminator = Map("tenant" -> Seq("xyz"))))
    assert(nX == 4)
    assert(balX == Map("Paulo" -> 135L)) // golden: replayed balance 135
    val (nA, _) = replayBalance(log, EventFilter(discriminator = Map("tenant" -> Seq("abc"))))
    assert(nA == 2)
    // disallowed discriminator keys are dropped at append time
    val other = new EventStore(log, AccountType,
      discriminator = Map("tenant" -> "zzz", "geo" -> "eu"))
    other.create("01HXTENANTZZZ000000000003", Seq(AccountType.created(1, "G")))
    val row = log.activeEvents
      .filter(org.apache.spark.sql.functions.col("aggregate_id") === "01HXTENANTZZZ000000000003")
      .select("discriminator").head()
    assert(row.getMap[String, String](0).toMap == Map("tenant" -> "zzz"))
  }
}
