package graft

import graft.log.{AppendRecord, EventLog}
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed shape of the maintenance rewrites (the way
  * PlanShapeSpec pins shuffles): M2 migration and M4 fencing must launch a
  * job count bounded by the BUCKET count, never by the STREAM count — the
  * driver-side per-stream loop these replaced launched 3+ jobs per stream.
  */
class MigrationScaleSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private val nStreams = 300

  private def countJobs[A](f: => A): (A, Int) = {
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = f
      Thread.sleep(500) // listener bus is async; drain before reading the count
      (out, jobs.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def freshLog(): EventLog = {
    val dir = Files.createTempDirectory("graftmigscale").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(77L))
    val records = (1 to nStreams).map { i =>
      AppendRecord(f"01HXSCALE${i}%017d", "Account", 0, Map.empty, Seq(
        AccountType.created(100L * i, s"own$i"),
        AccountType.deposited(i)))
    }
    log.append(records, nowMs = 1700000000000L)
    log
  }

  test("M2 migrate over 300 streams launches O(buckets) jobs, not O(streams)") {
    val log = freshLog()
    val (migrated, jobs) = countJobs {
      log.migrate(1, Set("AccountCreated"), evs => {
        Some(evs.map(e =>
          if (e.kind == "AccountCreated") graft.log.EventDetail("AccountCreated_V2", e.body)
          else graft.log.EventDetail(e.kind, e.body)))
      }, nowMs = 1700000001000L)
    }
    assert(migrated.size == nStreams)
    assert(jobs < 60, s"migration of $nStreams streams launched $jobs jobs — " +
      "the job count must be bounded by the bucket count, not the stream count")

    // shape survives: every stream has 2 invalidated originals, a fence, 2 copies
    val one = log.events.filter(col("aggregate_id") === f"01HXSCALE${7}%017d")
      .orderBy(col("aggregate_version")).collect()
    assert(one.length == 5)
    assert(one.map(_.getAs[String]("kind")).toSeq ==
      Seq("AccountCreated", "MoneyDeposited", "Invalidated", "AccountCreated_V2", "MoneyDeposited"))
    assert(one.map(_.getAs[Int]("migration")).toSeq == Seq(1, 1, 1, 0, 0))
    assert(one.map(_.getAs[Boolean]("migrated")).toSeq ==
      Seq(false, false, false, true, true))
    // replacement ids are per-stream increasing (per-partition monotonic ULIDs)
    val newIds = one.drop(2).map(_.getAs[String]("id")).toSeq
    assert(newIds == newIds.sorted && newIds.distinct.size == 3)
    // active view: exactly the migrated copies
    assert(log.activeEvents.count() == nStreams * 2L)
  }

  test("dense and selective plan shapes produce the same migration (hint parity)") {
    // a SELECTIVE handler (half the streams rewritten, a quarter declined by
    // the handler) through BOTH plan shapes: the dense single-shuffle fold
    // and the default candidates+semi-join fold must agree on every surviving
    // row — the hint may only change the plan, never the data
    def handler(evs: Seq[graft.core.EventRow]): Option[Seq[graft.log.EventDetail]] = {
      val n = evs.head.aggregate_id.takeRight(3).toInt
      if (n % 4 == 0) None // candidate stream the handler leaves untouched
      else Some(evs.map(e =>
        if (e.kind == "AccountCreated") graft.log.EventDetail("AccountCreated_V2", e.body)
        else graft.log.EventDetail(e.kind, e.body)))
    }
    def run(dense: Boolean) = {
      val log = freshLog()
      // only even-numbered streams hold the target kind after this scrub:
      // make the target kinds genuinely selective by renaming odd streams'
      // Created events out of the target set first
      val pre = log.migrateDistributed(1, Set("AccountCreated"), evs =>
        if (evs.head.aggregate_id.takeRight(3).toInt % 2 == 1)
          Some(evs.map(e =>
            if (e.kind == "AccountCreated") graft.log.EventDetail("LegacyCreated", e.body)
            else graft.log.EventDetail(e.kind, e.body)))
        else None, nowMs = 1700000001000L, dense = dense).count()
      assert(pre == nStreams / 2)
      val out = log.migrateDistributed(2, Set("AccountCreated"), handler,
        nowMs = 1700000002000L, dense = dense)
      (log, out.collect().map(_.aggregateId).sorted.toSeq)
    }
    val (denseLog, denseIds) = run(dense = true)
    val (selLog, selIds) = run(dense = false)
    assert(denseIds === selIds)
    assert(denseIds.nonEmpty && denseIds.size < nStreams,
      "the scenario must be genuinely selective for the parity to mean anything")
    def shape(log: EventLog) = log.events
      .select("aggregate_id", "aggregate_version", "kind", "body", "migration", "migrated")
      .orderBy("aggregate_id", "aggregate_version")
      .collect().toSeq
    assert(shape(denseLog) === shape(selLog))
    // per-stream replacement-id monotonicity holds in the dense shape too
    val ids = denseLog.activeEvents
      .filter(col("migrated"))
      .select("aggregate_id", "aggregate_version", "id")
      .orderBy("aggregate_id", "aggregate_version").collect()
      .groupBy(_.getString(0)).values
    ids.foreach { rows =>
      val seq = rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
      assert(seq == seq.sorted && seq.distinct.size == seq.size)
    }
  }

  test("M2 migrate under Manifest commit mode: one atomic rewrite claim, one visible version") {
    val dir = Files.createTempDirectory("graftmigmanifest").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(78L),
      commitMode = graft.log.CommitMode.Manifest)
    val n = 50
    (1 to n).foreach { i =>
      log.append(Seq(AppendRecord(f"01HXMANIF${i}%017d", "Account", 0, Map.empty, Seq(
        AccountType.created(10L * i, s"o$i"), AccountType.deposited(i)))),
        nowMs = 1700000000000L + i)
    }
    val migrated = log.migrate(1, Set("AccountCreated"), evs => {
      Some(evs.map(e =>
        if (e.kind == "AccountCreated") graft.log.EventDetail("AccountCreated_V2", e.body)
        else graft.log.EventDetail(e.kind, e.body)))
    }, nowMs = 1700000100000L)
    assert(migrated.size == n)
    // committed readers see exactly one version of every rewritten row:
    // 2 active copies per stream, 3 invalidated (2 originals + fence)
    assert(log.activeEvents.count() == n * 2L)
    assert(log.committedEvents.count() == n * 5L)
    val one = log.committedEvents.filter(col("aggregate_id") === f"01HXMANIF${9}%017d")
      .orderBy(col("aggregate_version")).collect()
    assert(one.map(_.getAs[String]("kind")).toSeq ==
      Seq("AccountCreated", "MoneyDeposited", "Invalidated", "AccountCreated_V2", "MoneyDeposited"))
    assert(one.map(_.getAs[Int]("migration")).toSeq == Seq(1, 1, 1, 0, 0))
    // the rewrite claims completed and the replaced files are GC-able
    assert(log.gcReplaced(retentionMs = 0L) > 0)
    assert(log.activeEvents.count() == n * 2L, "reads unchanged after GC")
  }

  test("manifest-mode migrate + fences at 1e5 streams: reservations ride sidecars, " +
      "driver holds no per-stream state") {
    val dir = Files.createTempDirectory("graftmigsidecar").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 8, ulidSeed = Some(79L),
      commitMode = graft.log.CommitMode.Manifest)
    val n = 100000
    // setup via bulkImport (itself sidecar-scale: n > the 1e4 inline default)
    val batch = spark.range(1, n + 1L).select(
      format_string("01HXSIDE%017d", col("id")).as("aggregate_id"),
      lit("Account").as("aggregate_kind"),
      lit("AccountCreated").as("kind"),
      lit("""{"money":1}""").as("body"),
      lit(1).as("seq"))
    assert(log.bulkImport(batch, nowMs = 1700000000000L) === n.toLong)

    // M2 through the DISTRIBUTED entry point — the per-stream outcome never
    // touches the driver; neither may the claim's reservation set
    val (migratedCount, migJobs) = countJobs {
      log.migrateDistributed(1, Set("AccountCreated"), evs => Some(evs.map(e =>
        graft.log.EventDetail("AccountCreated_V2", e.body))),
        nowMs = 1700000100000L).count()
    }
    assert(migratedCount === n.toLong)
    val rewrite = log.manifest.claims()
      .filter(_.kind == graft.log.CommitClaim.KindRewrite).last
    assert(rewrite.streams.isEmpty && rewrite.streamsRef.isDefined,
      "a 1e5-stream migration claim must carry a sidecar ref, not 1e5 TSV lines")
    assert(rewrite.refCount === n.toLong && rewrite.refMaxHead === 3)
    assert(migJobs < 60,
      s"1e5-stream migration launched $migJobs jobs — must be bucket-bounded")
    assert(log.activeEvents.count() === n.toLong, "one migrated copy per stream")
    assert(log.committedEvents.count() === 3L * n, "original + fence + copy")

    // M4 kind-wide fence pass over the same 1e5 streams
    val (fenced, fenceJobs) = countJobs(
      log.appendNoOpFences("Account", nowMs = 1700000200000L))
    assert(fenced === n.toLong)
    val fenceClaim = log.manifest.claims().last
    assert(fenceClaim.streams.isEmpty && fenceClaim.streamsRef.isDefined,
      "a 1e5-stream fence claim must carry a sidecar ref")
    assert(fenceClaim.refCount === n.toLong && fenceClaim.refMaxHead === 4)
    assert(fenceJobs < 25, s"1e5-stream fence pass launched $fenceJobs jobs")
    assert(log.activeEvents.filter(col("kind") === EventLog.KindNoOp).count()
      === n.toLong)
  }

  test("M4 appendNoOpFences over 300 streams launches O(1) jobs and fences all") {
    val log = freshLog()
    val (n, jobs) = countJobs(log.appendNoOpFences("Account", nowMs = 1700000002000L))
    assert(n == nStreams.toLong)
    assert(jobs < 15, s"fencing $nStreams streams launched $jobs jobs")
    val fences = log.activeEvents.filter(col("kind") === EventLog.KindNoOp)
    assert(fences.count() == nStreams.toLong)
    assert(fences.filter(col("aggregate_version") =!= 3).count() == 0L)
    // minted ids are globally unique across partitions
    assert(fences.select("id").distinct().count() == nStreams.toLong)
  }
}
