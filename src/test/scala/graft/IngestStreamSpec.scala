package graft

import graft.log.EventLog
import graft.store.EventStore
import graft.streaming.StreamAggs
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous ingestion into the log: versions continue per stream across
  * micro-batches, and the ingest ledger makes batch redelivery a no-op (the
  * exactly-once handshake with the query checkpoint).
  */
class IngestStreamSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("stream appends continue versions; redelivered batches are no-ops") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftingest").toFile.getAbsolutePath
    val log = new EventLog(spark, s"$dir/log", numBuckets = 4, ulidSeed = Some(71L))
    // pre-existing history: stream A at version 2
    val store = new EventStore(log, AccountType)
    store.create("A", Seq(AccountType.created(100, "a"), AccountType.deposited(1)))

    def batchDf(rows: Seq[(String, Long, Long)]) = // (stream, seq, money)
      rows.toDF("aggregate_id", "seq", "money").select(
        col("aggregate_id"), lit("Account").as("aggregate_kind"),
        lit("MoneyDeposited").as("kind"),
        format_string("""{"money":%d}""", col("money")).as("body"),
        col("seq"))

    // direct appendBulk: continues A at 3..4, starts B at 1..2
    val n1 = log.appendBulk(batchDf(Seq(("A", 0L, 5L), ("A", 1L, 6L),
      ("B", 0L, 7L), ("B", 1L, 8L))), ledgerId = Some("q1"), batchId = 0L)
    assert(n1 == 4L)
    assert(store.retrieve("A").version == 4)
    assert(store.retrieve("A").state == Account("OPEN", 112, "a"))

    // redelivery of batch 0 is a no-op; batch 1 proceeds
    assert(log.appendBulk(batchDf(Seq(("A", 0L, 999L))),
      ledgerId = Some("q1"), batchId = 0L) == 0L)
    assert(log.appendBulk(batchDf(Seq(("B", 0L, 9L))),
      ledgerId = Some("q1"), batchId = 1L) == 1L)
    assert(log.events.filter(col("aggregate_id") === "B").count() == 3L)
    // per-stream id order equals version order after multi-batch ingest
    val b = log.streamEvents("B").select("id", "aggregate_version").collect()
    assert(b.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    assert(b.map(_.getString(0)).toSeq == b.map(_.getString(0)).sorted.toSeq)

    // end to end through a readStream: same rows land exactly once
    val inDir = s"$dir/in"
    batchDf(Seq(("C", 0L, 1L), ("C", 1L, 2L), ("A", 2L, 3L)))
      .write.parquet(inDir)
    val q = StreamAggs.ingestStream(
        spark.readStream.schema(
          "aggregate_id string, aggregate_kind string, kind string, body string, seq long")
          .parquet(inDir),
        log, ledgerId = "q2")
      .option("checkpointLocation", s"$dir/chk").start()
    try q.processAllAvailable() finally q.stop()
    assert(store.retrieve("C").version == 2)
    assert(store.retrieve("A").version == 5)
    assert(log.events.count() == 2L + 4L + 1L + 3L)
  }
}
