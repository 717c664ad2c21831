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
}
