package graft

import graft.log.{AppendRecord, EventDetail, EventLog}
import graft.store.EventStore
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Re-bucketing: grow (and shrink) the physical bucket count with content,
  * versions, ids and snapshots intact, and the new layout actually used —
  * point reads prune to the NEW bucket directories and appends continue
  * against the same optimistic counters.
  */
class RebucketSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("rebucket 4 -> 8 -> 2 preserves the log and re-prunes point reads") {
    val dir = Files.createTempDirectory("graftrebucket").toFile.getAbsolutePath
    val log4 = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(51L))
    val store4 = new EventStore(log4, AccountType, snapshotThreshold = 2)
    (1 to 60).foreach { i =>
      store4.create(f"01HXREBUCKET${i}%014d", Seq(
        AccountType.created(10L * i, s"o$i"), AccountType.deposited(i)))
    }
    val before = log4.activeEvents.orderBy("id")
      .select("id", "aggregate_id", "aggregate_version", "kind", "body")
      .collect().map(_.toString).toSeq
    assert(log4.snapshots.count() == 60L, "threshold-2 snapshots all present")

    val log8 = log4.rebucket(8)
    assert(log8.numBuckets == 8)
    // physical layout moved to 8 buckets
    val dirs = new java.io.File(s"$dir/events").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).sorted
    assert(dirs.length == 8 || dirs.length <= 8 && dirs.nonEmpty)
    // content identical, ids/versions untouched
    val after = log8.activeEvents.orderBy("id")
      .select("id", "aggregate_id", "aggregate_version", "kind", "body")
      .collect().map(_.toString).toSeq
    assert(after == before)
    assert(log8.snapshots.count() == 60L)
    // the DSv2 marker carries the new count
    assert(graft.sources.GraftMeta.numBuckets(spark, s"$dir/events").contains(8))

    // point read prunes against the NEW bucket assignment and folds right
    val store8 = new EventStore(log8, AccountType, snapshotThreshold = 2)
    val got = store8.retrieve(f"01HXREBUCKET${7}%014d")
    assert(got.version == 2 && got.state == Account("OPEN", 77, "o7"))
    // appends continue at the right version
    store8.update(f"01HXREBUCKET${7}%014d")(_ => Seq(AccountType.deposited(3)))
    assert(store8.retrieve(f"01HXREBUCKET${7}%014d").state == Account("OPEN", 80, "o7"))

    // shrink: 8 -> 2, stale high-numbered directories must be gone
    val log2 = log8.rebucket(2)
    assert(log2.activeEvents.count() == 121L) // 120 + the update above
    val dirs2 = new java.io.File(s"$dir/events").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    assert(dirs2.subsetOf(Set("bucket=0", "bucket=1")), s"stale dirs: $dirs2")
    assert(new EventStore(log2, AccountType).retrieve(f"01HXREBUCKET${7}%014d")
      .state == Account("OPEN", 80, "o7"))
  }

  test("rebucketCopy: manifest-mode copy + cutover, committed view only") {
    val dir = Files.createTempDirectory("graftrebucketcp").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(52L),
      commitMode = graft.log.CommitMode.Manifest)
    val store = new EventStore(log, AccountType, snapshotThreshold = 2)
    (1 to 40).foreach { i =>
      store.create(f"01HXREBUCKCOPY${i}%012d", Seq(
        AccountType.created(10L * i, s"o$i"), AccountType.deposited(i)))
    }
    // leave a replaced (not yet GCed) file behind: the copy must read the
    // committed view, or the stale pre-compaction rows come along
    log.compact(buckets = Some(Seq(0)))
    val before = log.activeEvents.orderBy("id")
      .select("id", "aggregate_id", "aggregate_version", "kind", "body")
      .collect().map(_.toString).toSeq
    val snapsBefore = log.snapshots.count()

    val moved = log.rebucketCopy(s"$dir-v2", 7)
    assert(moved.activeEvents.orderBy("id")
      .select("id", "aggregate_id", "aggregate_version", "kind", "body")
      .collect().map(_.toString).toSeq === before)
    assert(moved.snapshots.count() === snapsBefore)
    val dirs = new java.io.File(s"$dir-v2/events").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    assert(dirs.forall(d => d.stripPrefix("bucket=").toInt < 7))
    // the new log is live: reads fold and writes append under ITS chain
    val movedStore = new EventStore(moved, AccountType)
    assert(movedStore.retrieve(f"01HXREBUCKCOPY${7}%012d")
      .state == Account("OPEN", 77, "o7"))
    movedStore.update(f"01HXREBUCKCOPY${7}%012d")(st => Seq(AccountType.deposited(3)))
    assert(movedStore.retrieve(f"01HXREBUCKCOPY${7}%012d")
      .state == Account("OPEN", 80, "o7"))
    // the SOURCE log is untouched (cutover is the caller's protocol)
    assert(log.activeEvents.orderBy("id")
      .select("id", "aggregate_id", "aggregate_version", "kind", "body")
      .collect().map(_.toString).toSeq === before)
    // lock-mode logs must refuse (they rebucket in place)
    val lockLog = new EventLog(spark,
      Files.createTempDirectory("graftrebucketlk").toFile.getAbsolutePath,
      numBuckets = 2, ulidSeed = Some(53L))
    intercept[IllegalArgumentException] { lockLog.rebucketCopy(s"$dir-v3", 3) }
  }
}
