package graft

import graft.log.EventLog
import graft.replay.EventFilter
import graft.store.EventStore
import graft.streaming.{ProjMessage, Projector}
import java.nio.file.Files
import org.apache.spark.sql.Dataset
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** T5 exactly-once under failure: a handler crash fails the micro-batch
  * BEFORE the checkpoint save; restarting from the Spark streaming
  * checkpoint redelivers the batch once, so an idempotent sink sees every
  * message exactly once (the reference's handle+checkpoint-in-one-
  * transaction contract, projection/checkpoints.go:33-53).
  */
class RecoverySpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("handler failure → restart → redelivery without duplication or loss") {
    val dir = Files.createTempDirectory("graftrecover").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(61L))
    val store = new EventStore(log, AccountType)
    val id = "01HXRECOVERACCT0000000001"
    val t0 = 1700000000000L
    store.create(id, Seq(AccountType.created(100, "P")), nowMs = t0)

    val proj = new Projector(log, "recover", dir,
      filter = EventFilter(aggregateKinds = Seq("Account")), partitions = 2)
    proj.catchup(_ => (), nowMs = t0 + 120000L)

    val delivered = mutable.Map[String, Int]().withDefaultValue(0)
    @volatile var failOnce = true
    val handle: Dataset[ProjMessage] => Unit = ds => {
      val rows = ds.collect()
      if (rows.nonEmpty && failOnce) {
        failOnce = false
        throw new RuntimeException("injected handler crash")
      }
      delivered.synchronized { rows.foreach(m => delivered(m.id) += 1) }
    }

    // a live event lands; the first delivery attempt crashes the query
    store.update(id)(_ => Seq(AccountType.deposited(42)), nowMs = t0 + 300000L)
    val q1 = proj.live(handle)
    val failed = intercept[Exception] { q1.processAllAvailable() }
    assert(failed.getMessage.contains("injected handler crash") ||
      Option(failed.getCause).exists(_.getMessage.contains("injected handler crash")))
    q1.stop()
    assert(delivered.isEmpty, "failed batch must not count as delivered")

    // restart from the same streaming checkpoint: the batch is redelivered once
    val q2 = proj.live(handle)
    try {
      q2.processAllAvailable()
      assert(delivered.values.toSeq == Seq(1), s"exactly-once, got $delivered")
      // and the projection-level checkpoint only advanced on success
      val cp = proj.checkpoints.load("recover")
      assert(cp.values.exists(_.sequence == 1L))
    } finally q2.stop()

    // a further restart redelivers nothing
    val q3 = proj.live(handle)
    try {
      q3.processAllAvailable()
      assert(delivered.values.sum == 1)
    } finally q3.stop()
  }
}
