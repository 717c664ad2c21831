package graft

import graft.log.{AppendRecord, DiscriminatorPolicy, EventDetail, EventLog}
import graft.store.EventStore
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed bulk ingest: version assignment, per-stream ULID order,
  * continuation of the optimistic counters, the new-stream guard, and the
  * discriminator pipeline.
  */
class BulkImportSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def sourceRows(n: Int) = {
    val s = spark
    import s.implicits._
    s.range(n.toLong * 3).select(
      concat(lit("01HXBULK"), format_string("%018d", (col("id") / 3).cast("long"))).as("aggregate_id"),
      lit("Account").as("aggregate_kind"),
      when(col("id") % 3 === 0, "AccountCreated").otherwise("MoneyDeposited").as("kind"),
      when(col("id") % 3 === 0, """{"money":100,"owner":"o"}""")
        .otherwise("""{"money":5}""").as("body"),
      (col("id") % 3).as("seq"))
  }

  test("bulk import assigns versions in seq order, ids increase with version") {
    val dir = Files.createTempDirectory("graftbulk").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(41L))
    val n = log.bulkImport(sourceRows(200), nowMs = 1700000000000L)
    assert(n == 600L)
    assert(log.activeEvents.count() == 600L)

    // versions are exactly 1..3 per stream, in seq order
    val bad = log.activeEvents
      .groupBy("aggregate_id")
      .agg(sort_array(collect_list(col("aggregate_version"))).as("vs"))
      .filter(col("vs") =!= array(lit(1), lit(2), lit(3)))
      .count()
    assert(bad == 0L)
    // within a stream, ULID order equals version order (catchup replays
    // must see a stream's events in version order when sorted by id)
    val misordered = log.activeEvents
      .groupBy("aggregate_id")
      .agg(
        transform(sort_array(collect_list(struct(col("id"), col("aggregate_version")))),
          s => s.getField("aggregate_version")).as("byId"))
      .filter(col("byId") =!= array(lit(1), lit(2), lit(3)))
      .count()
    assert(misordered == 0L)

    // the store folds an imported stream and the version counter continues
    val store = new EventStore(log, AccountType)
    val id0 = "01HXBULK000000000000000007"
    val got = store.retrieve(id0)
    assert(got.version == 3 && got.state == Account("OPEN", 110, "o"))
    store.update(id0)(_ => Seq(AccountType.deposited(1)))
    assert(store.retrieve(id0).version == 4)

    // a second import of the same streams is rejected
    intercept[graft.log.ConcurrentModificationException] {
      log.bulkImport(sourceRows(10), nowMs = 1700000001000L)
    }
    // ...unless the caller takes responsibility
    val extra = sourceRows(10).withColumn("aggregate_id",
      concat(col("aggregate_id"), lit("X")))
    assert(log.bulkImport(extra, nowMs = 1700000002000L) == 30L)
  }

  test("every commit writes exactly one file per touched bucket (stream-arrival order)") {
    // live projectors read the log as a file stream: a commit scattered over
    // several files per bucket can straddle micro-batches out of id order
    // and the monotonic dedup drops the stragglers — one file per bucket per
    // commit is the invariant that makes per-partition arrival id-ordered
    // (and the small-files guarantee)
    val dir = Files.createTempDirectory("graftonefile").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(43L))
    log.bulkImport(sourceRows(200), nowMs = 1700000000000L) // commit 1
    log.appendBulk(sourceRows(200).withColumn("seq", col("seq") + 3),
      nowMs = 1700000060000L) // commit 2
    (0 until 4).foreach { b =>
      val files = new java.io.File(s"$dir/events/bucket=$b")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 2, s"bucket $b: expected 1 file per commit x 2 commits, got $files")
    }
  }

  test("bulk import runs rows through the discriminator policy") {
    val dir = Files.createTempDirectory("graftbulkd").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(43L),
      discriminatorPolicy = Some(DiscriminatorPolicy(
        allowedKeys = Set("tenant"), root = Map("tenant" -> "t1"))))
    val rows = sourceRows(5).withColumn("discriminator",
      map(lit("rogue"), lit("x")))
    assert(log.bulkImport(rows, nowMs = 1700000000000L) == 15L)
    // rogue dropped, root tenant filled in on every row
    assert(log.activeEvents
      .filter(element_at(col("discriminator"), "tenant") === "t1").count() == 15L)
    assert(log.activeEvents
      .filter(element_at(col("discriminator"), "rogue").isNotNull).count() == 0L)
    // normal append still works against imported heads
    log.append(Seq(AppendRecord("01HXBULK000000000000000001", "Account", 3,
      Map.empty, Seq(EventDetail("MoneyDeposited", """{"money":2}""")))))
    assert(log.activeEvents.count() == 16L)
  }
}
