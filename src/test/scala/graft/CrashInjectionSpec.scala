package graft

import graft.log.{AppendRecord, CommitMode, EventDetail, EventLog}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-injection harness for the manifest commit protocol: kill a writer
  * at EVERY step of claim→stage→sidecar→done (via the phase hook — one
  * enumerated point per scenario, stronger than sampling), recover with a
  * fresh writer (prune, the cadence any rival runs), and assert the
  * protocol's recovery invariants at each point:
  *   - single fate: the committed view equals the pre-crash state OR the
  *     fully-applied state, never a partial mix;
  *   - no lost rows: every original row stays present through crash,
  *     condemnation, retry and GC;
  *   - no resurrection: GC after recovery never brings replaced rows back;
  *   - convergence: a retried operation completes and reads correctly.
  */
class CrashInjectionSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private case class InjectedCrash(label: String)
    extends RuntimeException(s"injected crash at '$label'")

  private def newLog(dir: String, seed: Long): EventLog =
    new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(seed),
      commitMode = CommitMode.Manifest)

  /** Arm the hook to throw the first time `point` fires, run `op`, disarm.
    * Returns the labels seen, so a renamed phase label fails loudly instead
    * of silently skipping the scenario.
    */
  private def crashAt[A](point: String)(op: => A): Set[String] = {
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    EventLog.crashHook = Some { l =>
      seen.add(l)
      if (l == point) throw InjectedCrash(l)
    }
    try {
      op
      fail(s"operation survived crash point '$point'")
    } catch {
      case _: InjectedCrash => ()
    } finally EventLog.crashHook = None
    import scala.jdk.CollectionConverters._
    seen.asScala.toSet
  }

  // every phase label on the migration path, in protocol order — the
  // sidecar is forced below the inline threshold so ALL steps execute
  private val migratePoints = Seq(
    "migrate: plan fold+checkpoint", // before anything is claimed or staged
    "migrate: heads probe",
    "migrate: sidecar write",        // reservation sidecar staged, no claim
    "migrate: staleness probe",      // claim won, nothing staged yet
    "migrate: stage events rewrite", // claim won, sidecar live
    "migrate: fence+copy append",    // staged rewrites in place, no append
    "migrate: markDone")             // everything staged, fate not sealed

  test("a migration writer dies at EVERY protocol step: recovery invariants hold") {
    sys.props("graft.bulkClaim.inlineMax") = "0" // force the sidecar leg
    try {
      migratePoints.foreach { point =>
        val dir = Files.createTempDirectory(s"graftcrash").toFile.getAbsolutePath
        val log = newLog(dir, 61L)
        (1 to 6).foreach(i => log.append(Seq(AppendRecord(s"cr-$i", "Account", 0,
          Map.empty, Seq(EventDetail("Created", s"""{"v":$i}"""))))))
        val before = log.committedEvents
          .orderBy("aggregate_id", "aggregate_version").collect().toSeq

        val seen = crashAt(point) {
          log.migrate(1, Set("Created"),
            evs => Some(evs.map(r => EventDetail("CreatedV2", r.body))))
        }
        assert(seen.contains(point),
          s"phase '$point' never fired — label drift in EventLog?")

        // recovery: a FRESH writer prunes the dead claim chain
        val fresh = newLog(dir, 62L)
        fresh.manifest.prune(Map.empty, staleMs = 0L): Unit

        // SINGLE FATE: every crash point precedes markDone, so the fate
        // must be "not committed" — the committed view reads exactly as
        // before the migration started (no staged row leaks through)
        val after = fresh.committedEvents
          .orderBy("aggregate_id", "aggregate_version").collect().toSeq
        assert(after === before,
          s"crash at '$point' must leave the pre-migration view")

        // NO RESURRECTION: GC at horizon 0 sweeps nothing live
        fresh.gcReplaced(retentionMs = 0L): Unit
        assert(fresh.committedEvents
          .orderBy("aggregate_id", "aggregate_version").collect().toSeq === before)

        // CONVERGENCE: the retried migration completes in full
        val out = fresh.migrate(1, Set("Created"),
          evs => Some(evs.map(r => EventDetail("CreatedV2", r.body))))
        assert(out.size === 6, s"retry after '$point' must migrate all streams")
        val act = fresh.activeEvents.filter(col("kind") === "CreatedV2")
        assert(act.select("aggregate_id").distinct().count() === 6L)
        assert(act.count() === 6L, "exactly one migrated copy per stream")
        // NO LOST ROWS: originals survive in the committed view (the raw
        // file view keeps replaced pre-rewrite copies until GC — by design),
        // flagged not dropped
        val originals = fresh.committedEvents
          .filter(col("kind") === "Created" && !col("migrated"))
        assert(originals.count() === 6L)
        assert(originals.filter(col("migration") === 1).count() === 6L)
        // ids stay unique through the whole lifecycle
        assert(fresh.committedEvents.select("id").distinct().count() ===
          fresh.committedEvents.count())
        // and GC after the committed retry still changes nothing visible
        fresh.gcReplaced(retentionMs = 0L): Unit
        assert(fresh.activeEvents.filter(col("kind") === "CreatedV2").count() === 6L)
      }
    } finally {
      sys.props.remove("graft.bulkClaim.inlineMax"): Unit
      EventLog.crashHook = None
    }
  }

  private val importPoints = Seq(
    "import: heads probe", "import: sidecar write",
    "import: bucketed write", "import: markDone")

  test("a bulk-import writer dies at every step: redelivery lands exactly once") {
    val s = spark
    import s.implicits._
    sys.props("graft.bulkClaim.inlineMax") = "0"
    try {
      importPoints.foreach { point =>
        val dir = Files.createTempDirectory("graftcrashimp").toFile.getAbsolutePath
        val log = newLog(dir, 63L)
        log.append(Seq(AppendRecord("seed-1", "Account", 0, Map.empty,
          Seq(EventDetail("Created", """{"v":0}""")))))
        val batch = (1 to 40).map(i => (s"imp-$i", "User", "Evt", s"""{"i":$i}""", 1L))
          .toDF("aggregate_id", "aggregate_kind", "kind", "body", "seq")

        val seen = crashAt(point) { log.bulkImport(batch, seqCol = "seq") }
        assert(seen.contains(point),
          s"phase '$point' never fired — label drift in EventLog?")

        val fresh = newLog(dir, 64L)
        fresh.manifest.prune(Map.empty, staleMs = 0L): Unit
        // single fate: all 40 rows or none — a partial import is the one
        // outcome the claim must make impossible
        val n = fresh.committedEvents.filter(col("aggregate_kind") === "User").count()
        assert(n === 0L || n === 40L, s"crash at '$point' left a partial import: $n")

        // redelivery of the SAME batch: exactly-once net effect
        if (n === 0L) fresh.bulkImport(batch, seqCol = "seq"): Unit
        assert(fresh.committedEvents.filter(col("aggregate_kind") === "User")
          .count() === 40L)
        assert(fresh.committedEvents.filter(col("aggregate_kind") === "User")
          .select("aggregate_id").distinct().count() === 40L)
        assert(fresh.committedEvents.select("id").distinct().count() ===
          fresh.committedEvents.count())
      }
    } finally {
      sys.props.remove("graft.bulkClaim.inlineMax"): Unit
      EventLog.crashHook = None
    }
  }
}
