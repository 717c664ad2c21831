package graft

import graft.log.EventLog
import graft.store.EventStore
import graft.streaming.EventBus
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

class EventBusSpec extends AnyFunSuite {
  test("kind-prefix matcher: *, prefix*, exact (store/eventbus.go semantics)") {
    assert(EventBus.matches("*", "anything"))
    assert(EventBus.matches("Money*", "MoneyDeposited"))
    assert(EventBus.matches("Money*", "MoneyWithdrawn"))
    assert(!EventBus.matches("Money*", "AccountCreated"))
    assert(EventBus.matches("AccountCreated", "AccountCreated"))
    assert(!EventBus.matches("AccountCreated", "AccountCreatedV2"))
  }

  test("publish dispatches to matching subscribers only") {
    val bus = new EventBus
    val all = ArrayBuffer[String]();
    val money = ArrayBuffer[String]()
    bus.subscribe("*")(e => { all += e.kind; () })
    bus.subscribe("Money*")(e => { money += e.kind; () })
    val gen = new graft.core.Ulid.Generator(seed = Some(3L))
    def ev(kind: String) = graft.core.EventRow(gen.next(1L), "a", 1, 1, "Account",
      kind, "{}", Map.empty, new java.sql.Timestamp(0L), 0, false)
    bus.publish(Seq(ev("AccountCreated"), ev("MoneyDeposited"), ev("MoneyWithdrawn")))
    assert(all.toSeq == Seq("AccountCreated", "MoneyDeposited", "MoneyWithdrawn"))
    assert(money.toSeq == Seq("MoneyDeposited", "MoneyWithdrawn"))
  }
}

class RebuildProjectionSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("M4: rebuild with NoOp fence bumps every stream and folds states") {
    val dir = Files.createTempDirectory("graftrebuild").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(21L))
    val store = new EventStore(log, AccountType)
    (1 to 5).foreach { i =>
      store.create(f"01HXREBUILD${i}%015d", Seq(
        AccountType.created(100L * i, s"own$i"), AccountType.deposited(i)))
    }
    val spark2 = spark
    import spark2.implicits._
    val states = store.rebuildProjection(fence = true).collect().toMap
    assert(states.size == 5)
    (1 to 5).foreach { i =>
      assert(states(f"01HXREBUILD${i}%015d") == Account("OPEN", 100L * i + i, s"own$i"))
    }
    // every stream got its NoOp fence at version 3
    import org.apache.spark.sql.functions._
    val fences = log.activeEvents.filter(col("kind") === EventLog.KindNoOp).collect()
    assert(fences.length == 5)
    fences.foreach(r => assert(r.getAs[Int]("aggregate_version") == 3))
    // a writer that read version 2 before the rebuild now loses its race
    intercept[graft.log.ConcurrentModificationException] {
      log.append(Seq(graft.log.AppendRecord("01HXREBUILD000000000000001", "Account", 2,
        Map.empty, Seq(AccountType.deposited(1)))))
    }
  }
}
