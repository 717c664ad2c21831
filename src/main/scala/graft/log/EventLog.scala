package graft.log

import graft.Checkpoints.Ownable
import graft.Checkpoints
import graft.core.{EventSchema, EventRow, SnapshotRow, Ulid}
import graft.functions.Fnv1a32
import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One event payload inside an append transaction. */
case class EventDetail(kind: String, body: String)

/** A write-side record: all events of one transaction for one aggregate
  * (reference: EventRecord, eventstore.go:137-149).
  */
case class AppendRecord(
    aggregateId: String,
    aggregateKind: String,
    expectedVersion: Int, // optimistic-concurrency base: current max version of the stream
    discriminator: Map[String, String],
    details: Seq[EventDetail])

class ConcurrentModificationException(msg: String) extends RuntimeException(msg)

/** Discriminator governance, the reference's `DiscriminatorMerge` pipeline
  * verbatim (store/store.go:195-228; options `WithDiscriminatorKeys` /
  * `WithDiscriminator` / `WithDiscriminatorHook`,
  * store/postgresql/store.go:74-96): the per-call discriminator passes
  * through the optional hook (which sees the call values and the operation
  * kind, and may replace or extend them), is merged over the repo-root
  * discriminator (call/hook wins on conflicts), and is then filtered to the
  * declared key allow-list — with the reference's strict rule that NO
  * declared keys means NO discriminator is stored at all (`filterOut`,
  * store/store.go:213-228).
  */
case class DiscriminatorPolicy(
    allowedKeys: Set[String] = Set.empty,
    root: Map[String, String] = Map.empty,
    hook: Option[DiscriminatorPolicy.Hook] = None) {
  def merge(callDisc: Map[String, String], kind: String): Map[String, String] = {
    val hooked = hook.fold(callDisc)(h => h(callDisc, kind))
    val merged = root ++ hooked
    if (allowedKeys.isEmpty) Map.empty
    else merged.view.filterKeys(allowedKeys.contains).toMap
  }
}

object DiscriminatorPolicy {
  /** (call discriminator, operation kind) → discriminator to use. */
  type Hook = (Map[String, String], String) => Map[String, String]
  /** Hook kinds (store/store.go:40-41). */
  val OnPersist = "persist"
  val OnRetrieve = "retrieve"
}

/** How appends exclude each other (reads are identical in both modes):
  *  - [[CommitMode.Lock]]: the single-writer lock-file section — correct on
  *    POSIX/HDFS, where atomic create-if-absent is guaranteed;
  *  - [[CommitMode.Manifest]]: the [[ManifestCommitLog]] claim chain — the
  *    object-store-safe protocol whose only primitive is conditional put.
  */
sealed trait CommitMode
object CommitMode {
  case object Lock extends CommitMode
  case object Manifest extends CommitMode
}

/** Executor-side plan of one stream's migration: handler output plus the
  * minted replacement rows (fence first, copies after).
  */
case class MigrationPlan(
    aggregateId: String,
    aggregateKind: String,
    discriminator: Map[String, String],
    maxVersion: Int,
    details: Seq[EventDetail],
    rows: Seq[EventRow])

/** Per-bucket physical footprint (maintenance telemetry). */
case class BucketStat(bucket: Int, files: Int, bytes: Long)

/** Operational snapshot of the log's physical state — what a maintenance
  * scheduler consumes to decide WHEN to compact (file counts per bucket are
  * the small-files signal), gc (replaced files awaiting delete) and prune
  * the commit chain (claim counts).
  */
case class LogStats(
    events: Seq[BucketStat],
    snapshots: Seq[BucketStat],
    pendingClaims: Int,
    doneClaims: Int,
    replacedAwaitingGc: Int) {
  def eventFiles: Int = events.map(_.files).sum
  def eventBytes: Long = events.map(_.bytes).sum
  def maxFilesPerBucket: Int = (0 +: events.map(_.files)).max
}

/** Output-file clustering for [[EventLog.compact]] — how a rewritten
  * bucket's rows arrange into files, which decides what later scans can
  * SKIP via parquet min/max stats.
  */
sealed trait CompactionLayout
object CompactionLayout {
  /** Default: files sorted by event id (ULID) — optimal for id-range scans
    * (time is the ULID prefix), the log's dominant access path.
    */
  case object IdSort extends CompactionLayout

  /** Z-order clustering: files cover compact Morton intervals of `dims`, so
    * a box predicate over ALL the interleaved dimensions prunes at once —
    * the layout for workloads that mix time-range scans WITH per-stream or
    * attribute slices (Delta/Iceberg `OPTIMIZE ZORDER BY`, re-expressed
    * over [[graft.ops.Layout.zorderRepartition]]). `dims` must already be
    * integers in `[0, 2^bitsPerDim)` — scale with [[graft.ops.Layout.scaleTo]]
    * / `pmod` (e.g. `ulid_millis(col("id"))` scaled to the log's time range,
    * `pmod(fnv1a32(col("aggregate_id")), 1 << bits)`). `filesPerBucket`
    * bounds the z-granularity of each bucket rewrite.
    */
  final case class ZOrder(dims: Seq[org.apache.spark.sql.Column],
      bitsPerDim: Int = 16, filesPerBucket: Int = 8) extends CompactionLayout
}

/** Result of migrating one stream: its new head after the rewrite. */
case class MigratedStream(
    aggregateId: String,
    lastVersion: Int,
    lastEventId: String,
    details: Seq[EventDetail],
    discriminator: Map[String, String])

/** The global append-only event log over bucketed Parquet.
  *
  * Layout: `<path>/events/bucket=N/…` with `bucket = pmod(fnv1a32(aggregate_id),
  * numBuckets)` and files written in `id` (ULID) order, so
  *  - point scans of one stream prune to a single bucket directory,
  *  - global `(after, until]` range scans skip whole files via Parquet min/max
  *    stats on the lexicographically time-ordered `id`,
  *  - downstream `groupBy(aggregate_id)` folds shuffle at most once, and the
  *    bucket column gives catchup workers their split selector for free.
  *
  * Mutation semantics mirror the reference: append-only except Forget (in-place
  * body scrub, M1), Migration (flag rows inactive + append replacements, M2)
  * and snapshot inserts — all implemented as copy-on-write rewrites of ONLY the
  * affected bucket partitions (dynamic partition overwrite), never the full
  * table. Optimistic concurrency (the reference's UNIQUE(aggregate_id,
  * aggregate_version) index, store/postgresql/store.go:702) is enforced by a
  * per-log single-writer commit section that validates the stream's max version
  * before committing; a lost race surfaces as ConcurrentModificationException
  * (eventstore.go:21).
  */
class EventLog(
    val spark: SparkSession,
    val path: String,
    val numBuckets: Int = 32,
    discriminatorKeys: Set[String] = Set.empty,
    ulidSeed: Option[Long] = None,
    val commitMode: CommitMode = CommitMode.Lock,
    val discriminatorPolicy: Option[DiscriminatorPolicy] = None) {

  import EventLog._

  private val eventsPath = s"$path/events"
  private val snapshotsPath = s"$path/snapshots"
  private val gen = new Ulid.Generator(seed = ulidSeed)

  /** Declared discriminator keys (ctor allow-list ∪ policy allow-list).
    * Each is materialized as a top-level `disc_<key>` string column on every
    * event/snapshot write — the Spark restatement of the reference's
    * physical per-key columns + indexes (store/postgresql/store.go:712-726)
    * — so tenant-scoped scans filter on a plain pushable column instead of
    * decoding the `MAP` for every row of a 100 TB log. Files written before
    * a key was declared lack the column and read as null; every filter site
    * keeps the map predicate as the source of truth and uses the column
    * only as the parquet-pushable pruning twin, so old data stays correct
    * (just unpruned until the next compaction rewrites it).
    */
  val declaredDiscKeys: Seq[String] =
    (discriminatorKeys ++ discriminatorPolicy.fold(Set.empty[String])(_.allowedKeys))
      .toSeq.sorted
  declaredDiscKeys.foreach(k => require(k.matches("[A-Za-z][A-Za-z0-9_]*"),
    s"declared discriminator key '$k' must be identifier-safe ([A-Za-z][A-Za-z0-9_]*) " +
      "to materialize as a disc_ column"))

  private val evSchema = EventSchema.withDiscColumns(EventSchema.events, declaredDiscKeys)
  private val snSchema = EventSchema.withDiscColumns(EventSchema.snapshots, declaredDiscKeys)

  /** Write-side half of the materialization: derive any missing `disc_<key>`
    * column from the map. Idempotent — rewrite paths whose input already
    * carries the columns pass through unchanged.
    */
  private def ensureDiscCols(df: DataFrame): DataFrame =
    declaredDiscKeys.foldLeft(df) { (d, k) =>
      if (d.columns.contains(EventSchema.discColName(k))) d
      else d.withColumn(EventSchema.discColName(k), element_at(col("discriminator"), lit(k)))
    }

  /** Dev-only phase timing for the maintenance paths (`-Dgraft.phaseTiming`):
    * prints per-phase wall time so slow-query triage attributes seconds to
    * jobs, not guesses. Free when the property is unset.
    */
  @inline private def phase[A](label: String)(f: => A): A = {
    EventLog.crashHook.foreach(_(label))
    if (EventLog.phaseTiming) {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    } else f
  }

  spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

  def bucketOf(aggregateId: String): Int =
    Math.floorMod(Fnv1a32.hashString(aggregateId), numBuckets)

  // ── reads ────────────────────────────────────────────────────────────────

  /** Full envelope incl. the physical bucket partition column. */
  def eventsWithBucket: DataFrame =
    if (!exists(eventsPath)) emptyEvents(withBucket = true)
    else spark.read.schema(addBucket(evSchema)).parquet(eventsPath)

  /** The logical event table (no physical layout columns). */
  def events: DataFrame = eventsWithBucket.drop("bucket")

  /** Active (non-invalidated) rows only — what every query sees by default.
    * Claim-aware in manifest mode: replaced-but-not-yet-GCed files would
    * otherwise double-count every rewritten row.
    */
  def activeEvents: DataFrame = committedView(events).filter(col("migration") === 0)

  /** Read-committed view (manifest mode): excludes rows of claims whose
    * `done` marker is absent — in-flight appends whose multi-bucket data is
    * only partially visible, or crashed claimants. Possible because
    * manifest-mode commits prefix every data file with their claim token
    * (`c{N}-…`), so commit membership is recoverable from the file name; the
    * predicate evaluates per-row post-scan and costs nothing when every
    * claim is done. Lock-mode files carry no token and always pass. This is
    * the first half of manifest-scoped reads (README roadmap #1); full
    * add/remove file manifests would extend the same mechanism to the
    * bucket-rewriting maintenance ops.
    */
  def committedEvents: DataFrame = committedView(events)

  /** Claim-aware read filter (manifest mode; identity under Lock):
    * hides pending claims' token-prefixed files and files superseded by a
    * completed rewrite — excluded until the lazy physical delete
    * (gcReplaced) catches up. The done-flip is the atomic visibility
    * switch, so no reader ever sees both versions of a file. Replaced files
    * are matched on their bucket-qualified relative name (one partitioned
    * write reuses part-file basenames across bucket directories). Applies to events and snapshots alike (claims carry absolute
    * paths; both tables share the one chain).
    */
  private def committedView(df: DataFrame, refreshed: Boolean = false): DataFrame = {
    if (commitMode == CommitMode.Lock) return df
    // `refreshed = true` skips the chain LIST for callers inside a retry
    // loop that just paid manifest.refresh() — on object stores the listing
    // is the dominant commit-path cost, and claims() would repeat it
    val claims = if (refreshed) manifest.cachedClaims() else manifest.claims()
    val pending = claims.filterNot(_.done).map(c => s"c${c.n}")
    val replaced = manifest.replacedRelnames().toSeq
    var out = df
    if (pending.nonEmpty)
      out = out.where(!regexp_extract(input_file_name(), "/(c\\d+)-[^/]*$", 1)
        .isin(pending: _*))
    if (replaced.nonEmpty)
      // table+bucket-qualified (last three segments): one partitioned write
      // reuses a part-file basename across bucket dirs, and events/snapshots
      // share one chain, so shorter keys are ambiguous
      out = out.where(!regexp_extract(input_file_name(), "/([^/]+/bucket=[^/]+/[^/]+)$", 1)
        .isin(replaced: _*))
    out
  }

  /** Physically delete files superseded by completed rewrites (VACUUM
    * semantics — reads are already correct without it; this reclaims space
    * and lets `manifest.prune` retire the rewrite claims). `retentionMs`
    * guards in-flight readers: a scan that listed a file just before the
    * rewrite's visibility flip may still be executing, so only rewrites
    * older than the retention window are collected. Eager deletion inside
    * the rewrite itself caused exactly that race (FILE_NOT_EXIST on a
    * concurrent reader) — never GC inline.
    */
  def gcReplaced(retentionMs: Long = 10 * 60 * 1000L,
      nowMs: Long = System.currentTimeMillis()): Int = {
    if (commitMode == CommitMode.Lock) return 0
    val conf = spark.sessionState.newHadoopConf()
    var n = 0
    manifest.claims()
      .filter(c => c.done && c.kind == CommitClaim.KindRewrite &&
        nowMs - c.tsMs >= retentionMs)
      .flatMap(_.replaced).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(conf)
        if (fs.exists(hp) && fs.delete(hp, false)) n += 1
      }
    n
  }

  def snapshots: DataFrame =
    if (!exists(snapshotsPath)) emptySnapshots
    else committedView(
      spark.read.schema(addBucket(snSchema)).parquet(snapshotsPath))
      .drop("bucket")

  /** S1: one stream's active events after a version, in version order
    * (store/postgresql/store.go:423-444). Bucket-pruned point scan.
    */
  def streamEvents(aggregateId: String, sinceVersion: Int = 0): DataFrame =
    committedView(eventsWithBucket)
      .filter(col("bucket") === bucketOf(aggregateId) &&
        col("aggregate_id") === aggregateId &&
        col("migration") === 0 &&
        col("aggregate_version") > sinceVersion)
      .drop("bucket")
      .orderBy(col("aggregate_version"))

  /** S2: latest snapshot of one stream (store/postgresql/store.go:295-323).
    * Bucket-pruned like the event point scan — a point read must never list
    * more than one partition directory.
    */
  def latestSnapshot(aggregateId: String): Option[SnapshotRow] = {
    import spark.implicits._
    if (!exists(snapshotsPath)) return None
    committedView(spark.read.schema(addBucket(snSchema)).parquet(snapshotsPath))
      .filter(col("bucket") === bucketOf(aggregateId) &&
        col("aggregate_id") === aggregateId)
      .drop("bucket")
      .orderBy(col("id").desc)
      .limit(1)
      .as[SnapshotRow]
      .collect()
      .headOption
  }

  /** S3: global `(after, until]` keyset range scan in ULID order
    * (store/postgresql/store.go:497-518). Predicates push to Parquet; the
    * `id` sort order within files makes min/max skipping effective.
    *
    * Reads through [[committedEvents]]: catchup replay must never process an
    * in-flight commit's partially-visible data (identical to `activeEvents`
    * in Lock mode, where the view adds no predicate). The reference gets the
    * same guarantee from SQL transaction isolation; the overlap re-read +
    * idempotent dedup (T4/T7) still covers the live streaming path.
    */
  def range(afterId: String, untilId: String): DataFrame =
    committedEvents.filter(col("migration") === 0)
      .filter((if (afterId.isEmpty) lit(true) else col("id") > afterId) &&
        (if (untilId.isEmpty) lit(true) else col("id") <= untilId))

  /** S4: id IN (...) fetch (store/postgresql/store.go:665-674). */
  def byIds(ids: Seq[String]): DataFrame =
    committedView(events).filter(col("id").isin(ids: _*))

  /** S5: one outbox poll batch — the next `limit` committed events strictly
    * after `afterId` in ULID order (sink/poller/poller.go:83-84 polls 20 at a
    * time; the driver of this method is a forwarder loop that acks by
    * remembering the last id, exactly the reference's keyset cursor). The
    * ULID lower bound prunes files via min/max stats before the global
    * order+limit, so a poll touches the log's tail, not its history.
    */
  def outboxBatch(afterId: String, limit: Int = 20): DataFrame =
    committedEvents.filter(col("migration") === 0)
      .filter(if (afterId.isEmpty) lit(true) else col("id") > afterId)
      .orderBy(col("id")).limit(limit)

  /** A5: distinct stream ids, optionally restricted to one aggregate kind.
    * The reference pages this scan 100 ids at a time
    * (store/postgresql/projection_migration.go:180); here it is one
    * distributed distinct — partial-aggregated map-side, so the exchange
    * carries unique ids per partition, not the event count.
    */
  def distinctStreams(kind: Option[String] = None): DataFrame =
    kind.fold(activeEvents)(k => activeEvents.filter(col("aggregate_kind") === k))
      .select(col("aggregate_id")).distinct()

  /** Retrieve-side discriminator scoping (the reference's `OnRetrieve` hook
    * path + per-call context, applied as a query filter the way its
    * listener/poller options do — `WithDiscriminatorKV`,
    * sink/poller/poller.go): rows must carry EVERY merged (key, value).
    * Identity when no policy is configured. For DECLARED keys the filter
    * pairs the map predicate (source of truth) with its materialized
    * `disc_<key>` twin — `disc_k = v OR disc_k IS NULL` — which parquet
    * pushes down and skips row groups on (the reference indexes disc_*
    * columns for exactly this, store/postgresql/store.go:712-726). The
    * IS NULL leg keeps files written before the key was declared correct:
    * their column reads null and the map predicate alone decides.
    */
  def withDiscriminator(df: DataFrame, callDisc: Map[String, String] = Map.empty): DataFrame =
    discriminatorPolicy match {
      case None => df
      case Some(p) =>
        val cols = df.columns.toSet
        p.merge(callDisc, DiscriminatorPolicy.OnRetrieve).foldLeft(df) {
          case (d, (k, v)) =>
            val mapEq = element_at(col("discriminator"), k) === v
            val dc = EventSchema.discColName(k)
            if (cols.contains(dc))
              d.filter(mapEq && (col(dc) === v || col(dc).isNull))
            else d.filter(mapEq)
        }
    }

  /** SQL surface: register the log as temp views (`<prefix>_events`,
    * `<prefix>_events_active`, `<prefix>_snapshots`) and the engine's SQL
    * functions (`fnv1a32`, `ulid_millis`), so `spark.sql` queries run
    * against the log directly.
    */
  def registerViews(prefix: String = "graft"): Unit = {
    graft.functions.registerAll(spark)
    events.createOrReplaceTempView(s"${prefix}_events")
    activeEvents.createOrReplaceTempView(s"${prefix}_events_active")
    snapshots.createOrReplaceTempView(s"${prefix}_snapshots")
  }

  // ── append (S-write) ─────────────────────────────────────────────────────

  /** Append one or more transactions. Returns the assigned event ids.
    *
    * Single-writer commit section per log path; validates each stream's
    * current max version against `expectedVersion` and throws
    * [[ConcurrentModificationException]] on a lost race — the Spark
    * restatement of the unique-index violation. On a real deployment this
    * section is the table-format commit (e.g. a transactional manifest);
    * the validation query prunes to the touched buckets only.
    */
  def append(records: Seq[AppendRecord], nowMs: => Long = System.currentTimeMillis()): Seq[String] =
    commitMode match {
      case CommitMode.Lock =>
        withLogLock(path) {
          validateVersions(records, maxVersions(records.map(_.aggregateId).distinct))
          val rows = buildRows(records, nowMs)
          writeEvents(rows, SaveMode.Append)
          rows.map(_.id)
        }
      case CommitMode.Manifest => appendViaManifest(records, nowMs)
    }

  /** The claim-chain append (see [[ManifestCommitLog]]): validate against
    * `max(parquet head, reserved head)`, claim the next manifest slot, write
    * data only after the claim sticks. A lost claim race retries from a fresh
    * read of the chain; a conflicting reservation on one of OUR streams
    * surfaces as [[ConcurrentModificationException]], exactly like the lock
    * path's lost optimistic check.
    */
  private def appendViaManifest(records: Seq[AppendRecord], nowMs: => Long): Seq[String] = {
    val touched = records.map(_.aggregateId).distinct
    var attempts = 0
    while (attempts < 100) {
      val tip = manifest.refresh()
      val parquetHeads = maxVersions(touched, refreshed = true)
      val resvHeads = manifest.reservedHeads(touched)
      val heads = touched.map(s =>
        s -> math.max(parquetHeads.getOrElse(s, 0), resvHeads.getOrElse(s, 0))).toMap
      validateVersions(records, heads)
      val rows = buildRows(records, nowMs)
      val claimed = records.map(r =>
        r.aggregateId -> (r.expectedVersion, r.expectedVersion + r.details.size)).toMap
      val claim = CommitClaim(tip + 1, claimed, rows.map(_.id), writerId,
        System.currentTimeMillis(), done = false)
      if (manifest.tryClaim(claim)) {
        writeEventsIsolated(rows, s"c${claim.n}")
        manifest.markDone(claim.n)
        return rows.map(_.id)
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"manifest commit for $touched lost ${attempts} claim races — giving up")
  }

  private def validateVersions(records: Seq[AppendRecord], current: Map[String, Int]): Unit =
    records.foreach { r =>
      val cur = current.getOrElse(r.aggregateId, 0)
      if (cur != r.expectedVersion)
        throw new ConcurrentModificationException(
          s"stream ${r.aggregateId}: expected version ${r.expectedVersion}, log has $cur")
    }

  private def buildRows(records: Seq[AppendRecord], nowMs: => Long): Seq[EventRow] =
    records.flatMap { r =>
      val disc = discriminatorPolicy match {
        case Some(p) => p.merge(r.discriminator, DiscriminatorPolicy.OnPersist)
        case None => filterDiscriminator(r.discriminator)
      }
      r.details.zipWithIndex.map { case (d, i) =>
        EventRow(
          id = gen.next(nowMs),
          aggregate_id = r.aggregateId,
          aggregate_id_hash = Fnv1a32.hashString(r.aggregateId),
          aggregate_version = r.expectedVersion + i + 1,
          aggregate_kind = r.aggregateKind,
          kind = d.kind,
          body = d.body,
          discriminator = disc,
          created_at = new Timestamp(nowMs),
          migration = 0,
          migrated = false)
      }
    }

  /** Bulk ingest for backfills and initial loads: append a DataFrame of NEW
    * streams' events in one distributed write. Input columns:
    * `aggregate_id`, `aggregate_kind`, `kind`, `body`, `seqCol` (any
    * per-stream ordering column) and optionally `discriminator`
    * (map<string,string>). Versions are assigned 1..n per stream in seq
    * order, and event ids come from per-partition monotonic ULID generators
    * after a repartition+sort on the stream key — so ids increase with
    * version inside every stream, exactly like transactional appends.
    *
    * The reference has no bulk path (an import loops `store.Create` one
    * transaction at a time — 10⁸ streams cost 10⁸ round-trips); this is one
    * shuffle plus one bucketed write, and the optimistic version counters
    * continue correctly afterwards because versions ARE the per-stream
    * sequence. `timeCol` (millis) keeps HISTORICAL timestamps: each event's
    * ULID time component and `created_at` come from it, so time-range scans
    * and as-of reads work on backfilled history exactly as on live appends
    * (per stream, `seqCol` order must not decrease in `timeCol` — the same
    * invariant live appends have). Without it every row is stamped `nowMs`.
    * `requireNew` (default) rejects the import if any target stream already
    * exists (one distributed semi-join probe); disable it only when the
    * caller guarantees disjointness. The discriminator pipeline (policy
    * merge / legacy key filter) applies per row as in [[append]].
    *
    * Concurrency: in Lock mode the lock section serializes writers on
    * shared storage. In Manifest mode the import is CLAIM-FENCED like every
    * other writer: it reserves `(0, head)` for every imported stream in the
    * commit chain, so a concurrent `append`/`appendBulk`/`bulkImport`
    * touching the same stream from another driver either sees the
    * reservation (and fails its optimistic check) or loses the claim race —
    * the loser surfaces [[ConcurrentModificationException]], matching the
    * reference's unique-index guarantee on every write path
    * (store/postgresql/store.go:702). Reservations ride the claim TSV up to
    * [[ManifestCommitLog.inlineClaimMaxStreams]] streams; beyond that they
    * go to a range-sorted parquet SIDECAR and the stream set never touches
    * the driver — claim file and driver memory stay flat at 10⁸ streams.
    * `manifest.prune` must not run concurrently with an import (standard
    * maintenance-window rule).
    */
  def bulkImport(rows: DataFrame, nowMs: Long = System.currentTimeMillis(),
      seqCol: String = "seq", timeCol: Option[String] = None,
      requireNew: Boolean = true): Long = withBulkWriteGuard {
    import spark.implicits._
    val seedBase = ulidSeed
    val discFn: Map[String, String] => Map[String, String] = discriminatorPolicy match {
      case Some(p) => d => p.merge(d, DiscriminatorPolicy.OnPersist)
      case None =>
        val keys = discriminatorKeys
        d => if (keys.isEmpty) d
          else d.view.filterKeys(k => keys.contains(k.toLowerCase)).toMap
    }
    var prepared =
      if (rows.columns.contains("discriminator")) rows
      else rows.withColumn("discriminator", typedLit(Map.empty[String, String]))
    prepared = timeCol match {
      case Some(c) => prepared.withColumn("__ts", col(c).cast("long"))
      case None => prepared.withColumn("__ts", lit(nowMs))
    }
    if (requireNew && exists(eventsPath)) {
      // semi-join needs no distinct on the (corpus-sized) log side
      val clash = prepared.select(col("aggregate_id")).distinct()
        .join(events.select(col("aggregate_id")), Seq("aggregate_id"), "left_semi")
        .limit(1).as[String].collect()
      if (clash.nonEmpty) throw new ConcurrentModificationException(
        s"bulkImport: stream ${clash.head} already exists in the log")
    }
    val minted = prepared
      .repartition(col("aggregate_id"))
      .sortWithinPartitions(col("aggregate_id"), col(seqCol))
      .select(col("aggregate_id"), col("aggregate_kind"), col("kind"),
        col("body"), col("discriminator"), col("__ts"))
      .as[(String, String, String, String, Map[String, String], Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // One monotonic generator per STREAM (created on stream change; all
        // rows of a stream are contiguous after the sort): per-stream id
        // order follows the per-row times without one stream's clock
        // bumping another's, matching live appends' per-stream monotonicity.
        var cur: String = null
        var gen: Ulid.Generator = null
        var v = 0
        it.map { case (aggId, aggKind, kind, body, disc, ts) =>
          if (aggId != cur) {
            cur = aggId
            v = 0
            gen = new Ulid.Generator(seed = seedBase.map(s =>
              s * 2654435761L + pid * 1000003L +
                (Fnv1a32.hashString(aggId).toLong << 16) +
                scala.util.hashing.MurmurHash3.stringHash(aggId)))
          }
          v += 1
          val d = if (disc == null) Map.empty[String, String] else disc
          EventRow(gen.next(ts), aggId, Fnv1a32.hashString(aggId), v, aggKind,
            kind, body, discFn(d), new Timestamp(ts), 0, false)
        }
      }
    // the batch row count rides an `observe` tap on the checkpoint pass —
    // the former separate count() was a second full pass over the minted
    // batch (cached, but a pass and a job per import nonetheless; r16 opt)
    val obsN = org.apache.spark.sql.Observation()
    val imported = phase("import: checkpoint rows")(
      minted.observe(obsN, count(lit(1)).as("n")).checkpointOwned())
    val n = phase("import: count")(obsN.get("n").asInstanceOf[Long])
    if (n > 0) commitMode match {
      case CommitMode.Lock => writeEventsDF(imported.toDF())
      case CommitMode.Manifest =>
        // versions are assigned 1..k per stream, so the claim reserves
        // (0, max version) — one aggregation over the materialized rows.
        // Up to the inline threshold the reservations ride the claim TSV;
        // beyond it they go to a parquet SIDECAR and the stream set NEVER
        // touches the driver — the mechanism that keeps a 10⁸-stream
        // backfill's claim file and driver memory flat.
        val headsDF = imported.toDF()
          .groupBy(col("aggregate_id"))
          .agg(max(col("aggregate_version")).as("head"))
          .select(col("aggregate_id"), lit(0).as("base"), col("head"))
        // bounded decision probe: collect at most inlineMax+1 heads — the
        // common (inline) import pays ONE job and no checkpoint; only a
        // sidecar-scale import re-evaluates the aggregation for the parquet
        // write, over the already-checkpointed `imported`, so the recompute
        // is one in-memory pass
        val probe = phase("import: heads probe")(
          headsDF.limit(ManifestCommitLog.inlineClaimMaxStreams + 1).collect())
        val useSidecar = probe.length > ManifestCommitLog.inlineClaimMaxStreams
        val inlineStreams =
          if (useSidecar) Map.empty[String, (Int, Int)]
          else probe.map(r => r.getString(0) -> (0, r.getInt(2))).toMap
        val sidecar =
          if (useSidecar) Some(phase("import: sidecar write")(manifest.writeSidecar(headsDF)))
          else None
        var attempts = 0
        var committed = false
        while (!committed && attempts < 100) {
          val tip = manifest.refresh()
          // a reservation on ANY imported stream means it is not new — the
          // chain-time twin of the parquet probe above (claims precede data,
          // so the chain is authoritative for in-flight writers). Driver
          // fold for small inline-vs-inline checks; one distributed
          // semi-join when either side is sidecar-scaled.
          if (requireNew) {
            val chainHasSidecars = manifest.cachedClaims().exists(_.streamsRef.isDefined)
            if (useSidecar || chainHasSidecars)
              phase("import: chain clash join")(manifest.reservationsDF().foreach { resv =>
                val clash = headsDF.select(col("aggregate_id"))
                  .join(resv.select(col("aggregate_id")), Seq("aggregate_id"), "left_semi")
                  .limit(1).collect()
                if (clash.nonEmpty) throw new ConcurrentModificationException(
                  s"bulkImport: stream ${clash.head.getString(0)} already reserved in the commit chain")
              })
            else
              manifest.reservedHeads(inlineStreams.keys.toSeq).find(_._2 > 0)
                .foreach { case (s, _) => throw new ConcurrentModificationException(
                  s"bulkImport: stream $s already reserved in the commit chain") }
          }
          val claim = CommitClaim(tip + 1, inlineStreams, Seq.empty, writerId,
            System.currentTimeMillis(), done = false,
            streamsRef = sidecar.map(_._1),
            refCount = sidecar.map(_._2).getOrElse(0L),
            refMaxHead = sidecar.map(_._3).getOrElse(0))
          if (manifest.tryClaim(claim)) {
            phase("import: bucketed write")(
              writeEventsDFIsolated(imported.toDF(), s"c${claim.n}"))
            phase("import: markDone")(manifest.markDone(claim.n))
            committed = true
          } else attempts += 1
        }
        if (!committed) throw new IllegalStateException(
          s"bulkImport lost $attempts claim races — giving up")
    }
    n
  }

  /** Distributed append-at-head: like [[bulkImport]] but for streams that
    * may already EXIST — versions continue from each stream's current head
    * (one bucket-colocated aggregation over just the touched streams, never
    * a driver map). This is the continuous-ingest primitive: the source is
    * authoritative and rows append in `seqCol` order per stream, so there
    * is no optimistic expectedVersion — concurrent interactive writers are
    * excluded by the commit section, exactly the CDC-consumer contract.
    * `ledgerId`/`batchId` make redelivery idempotent: a batch at or below
    * the ledger's committed id is skipped whole (the streaming
    * exactly-once handshake — see [[graft.streaming.StreamAggs.ingestStream]]).
    * In Manifest mode the ledger mark ALSO rides the commit claim, so the
    * dedup check and the data commit share the chain's single atomic
    * done-flip — a crash anywhere leaves the redelivered batch either
    * skipped (done landed) or the only visible copy (pending claims' files
    * stay hidden): exactly-once with no window. Lock mode keeps the
    * file-ledger-after-write ordering and its inherent
    * crashed-between-write-and-ledger duplicate window.
    * Returns rows appended (0 on a skipped redelivery).
    *
    * Concurrency: Lock mode relies on the lock section. Manifest mode is
    * claim-fenced: heads are computed as `max(parquet head, reserved head)`
    * from a fresh chain read, the batch claims `(base, newHead)` per touched
    * stream, and a lost claim race RETRIES from fresh heads (there is no
    * `expectedVersion` to violate — concurrent appenders serialize and
    * versions continue, the CDC-consumer contract), while interactive
    * `append`s racing the same streams fail their optimistic check against
    * our reservation.
    */
  def appendBulk(rows: DataFrame, nowMs: Long = System.currentTimeMillis(),
      seqCol: String = "seq", ledgerId: Option[String] = None,
      batchId: Long = -1L): Long = withBulkWriteGuard {
    val hconf = spark.sessionState.newHadoopConf()
    val ledger = ledgerId.map(id => new org.apache.hadoop.fs.Path(s"$path/_ingest/$id"))
    def ledgerFs = ledger.map(_.getFileSystem(hconf))
    // a torn/garbage ledger file (crash mid-write) reads as absent rather
    // than wedging every subsequent batch on a parse error; in manifest mode
    // the chain mark below still dedups, in lock mode the batch re-appends
    // (at-least-once, the pre-ledger contract)
    def readLedger(): Option[Long] = ledger.zip(ledgerFs).collect {
      case (p, f) if f.exists(p) =>
        val in = f.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLongOption
        finally in.close()
    }.flatten
    val committed = readLedger()
    def commitLedger(): Unit = ledger.zip(ledgerFs).foreach { case (p, f) =>
      // NEVER regress: a failover rival may have committed a HIGHER batch
      // while this delivery was stalled — overwriting its mark would re-open
      // the dedup hole the moment the rival's claim is pruned off the chain
      if (!readLedger().exists(_ >= batchId)) {
        // write-temp + swap: the ledger is never observable half-written
        val tmp = new org.apache.hadoop.fs.Path(p.getParent,
          s".${p.getName}.tmp.${java.util.UUID.randomUUID()}")
        val out = f.create(tmp, true)
        try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
        f.delete(p, false)
        if (!f.rename(tmp, p)) { f.delete(tmp, false); throw new java.io.IOException(
          s"could not commit ingest ledger $p") }
      }
    }
    // Manifest mode also consults the chain: a done claim carrying this
    // ledger's mark proves the batch committed even if the crash hit between
    // the done-flip and the ledger-file write — dedup check and commit share
    // ONE atomic switch, so redelivery is exactly-once with no window (a
    // crash BEFORE done leaves the staged files permanently hidden, so the
    // redelivered append is the only visible copy)
    val chainCommitted =
      if (commitMode == CommitMode.Manifest && ledgerId.isDefined && batchId >= 0)
        manifest.claims().filter(c => c.done && c.ledgerId == ledgerId)
          .map(_.ledgerBatch).maxOption
      else None
    if (batchId >= 0 &&
        (committed.exists(batchId <= _) || chainCommitted.exists(batchId <= _))) 0L
    else {
      import spark.implicits._
      val t = nowMs
      val seedBase = ulidSeed
      val discFn: Map[String, String] => Map[String, String] = discriminatorPolicy match {
        case Some(p) => d => p.merge(d, DiscriminatorPolicy.OnPersist)
        case None =>
          val keys = discriminatorKeys
          d => if (keys.isEmpty) d
            else d.view.filterKeys(k => keys.contains(k.toLowerCase)).toMap
      }
      val withDisc =
        if (rows.columns.contains("discriminator")) rows
        else rows.withColumn("discriminator", typedLit(Map.empty[String, String]))
      // assign ids/versions continuing from the per-stream heads frame
      // (aggregate_id, __head); materialized once per attempt
      def buildRows(heads: DataFrame): DataFrame = withDisc
        .join(heads, Seq("aggregate_id"), "left")
        .repartition(col("aggregate_id"))
        .sortWithinPartitions(col("aggregate_id"), col(seqCol))
        .select(col("aggregate_id"), col("aggregate_kind"), col("kind"),
          col("body"), col("discriminator"),
          coalesce(col("__head"), lit(0)).as("__head"))
        .as[(String, String, String, String, Map[String, String], Int)]
        .mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var cur: String = null
          var gen: Ulid.Generator = null
          var v = 0
          it.map { case (aggId, aggKind, kind, body, disc, head) =>
            if (aggId != cur) {
              cur = aggId
              v = head
              gen = new Ulid.Generator(seed = seedBase.map(s =>
                s * 6364136223846793005L + pid * 1000003L + batchId * 31L +
                  (Fnv1a32.hashString(aggId).toLong << 16) +
                  scala.util.hashing.MurmurHash3.stringHash(aggId)))
            }
            v += 1
            val d = if (disc == null) Map.empty[String, String] else disc
            EventRow(gen.next(t), aggId, Fnv1a32.hashString(aggId), v, aggKind,
              kind, body, discFn(d), new Timestamp(t), 0, false)
          }
        }
        .checkpointOwned()
        .toDF()
      commitMode match {
        case CommitMode.Lock =>
          // current head per TOUCHED stream (semi-join prune, then one agg;
          // stays fully distributed — no driver map of the stream set)
          val heads =
            if (!exists(eventsPath)) spark.emptyDataFrame
              .withColumn("aggregate_id", lit("")).withColumn("__head", lit(0))
              .limit(0).select(col("aggregate_id"), col("__head"))
            else events
              .join(withDisc.select(col("aggregate_id")).distinct(),
                Seq("aggregate_id"), "left_semi")
              .groupBy(col("aggregate_id"))
              .agg(max(col("aggregate_version")).as("__head"))
          val appended = buildRows(heads)
          val n = appended.count()
          if (n > 0) writeEventsDF(appended)
          commitLedger()
          n
        case CommitMode.Manifest =>
          // Up to the inline threshold the touched set (a micro-batch of
          // ingest) folds driver-side and reservations ride the claim TSV.
          // Past it — a backfill-scale redelivery — heads resolve
          // DISTRIBUTED and reservations go to a parquet sidecar, so the
          // claim file and driver memory stay flat no matter the batch
          // (the same mechanism bulkImport/migrate/fences use).
          val touchedDF = withDisc.select(col("aggregate_id")).distinct()
          val touchedProbe = touchedDF
            .limit(ManifestCommitLog.inlineClaimMaxStreams + 1).as[String].collect().toSeq
          val useSidecar = touchedProbe.length > ManifestCommitLog.inlineClaimMaxStreams
          val touched = if (useSidecar) Seq.empty else touchedProbe
          var attempts = 0
          var result = -1L
          var rivalDeadline = -1L
          while (result < 0 && attempts < 100) {
            val tip = manifest.refresh()
            // Re-fence the ledger dedup INSIDE the retry loop: the pre-loop
            // check is check-then-act, so two CONCURRENT deliveries of the
            // same (ledgerId, batchId) — a zombie driver racing its failover
            // replacement — would both pass it and both eventually win
            // distinct claims. After each refresh, a rival claim carrying
            // (ledgerId, batch >= batchId) is authoritative: DONE means the
            // batch is committed (skip; also covers committed-then-pruned
            // via the restored ledger file), PENDING means the outcome is
            // undecided — wait for its done-flip or its condemnation rather
            // than racing it to a second append.
            val rivals =
              if (ledgerId.isDefined && batchId >= 0)
                manifest.cachedClaims().filter(c =>
                  c.ledgerId == ledgerId && c.ledgerBatch >= batchId)
              else Seq.empty
            // disk-truth for pending rivals: the cache deliberately remembers
            // PRUNED claims, and a condemned rival (crashed, then pruned) must
            // not wedge this legitimate redelivery — its staged files are
            // gone, so re-appending is exactly the recovery path. status()
            // (not the cached done flag) decides "committed": a rival that
            // won its done fate and crashed before deriving the marker is
            // committed on disk even though no listing shows it — and
            // status() is read-only, so no one heals the marker for us here
            val liveRivals = rivals
              .map(c => if (c.done) (c, Some(true))
                else (c, manifest.status(c.n)))
              .filter { case (_, st) => st.isDefined }
            if (liveRivals.exists(_._2.contains(true)) ||
                readLedger().exists(batchId <= _)) {
              commitLedger(); result = 0
            } else if (liveRivals.nonEmpty) {
              // the rival's commit is mid-flight (claim up, done not yet) —
              // wait it out on its own deadline rather than burning claim-
              // race attempts; a rival that DIED pending stays undecided
              // until prune condemns it, so fail loudly at the deadline
              if (rivalDeadline < 0)
                rivalDeadline = System.currentTimeMillis() + LockAcquireTimeoutMs
              if (System.currentTimeMillis() > rivalDeadline)
                throw new IllegalStateException(
                  s"appendBulk: rival delivery of ($ledgerId, $batchId) still " +
                    "pending — undecided in-flight commit (crashed writer?); " +
                    "retry after it completes or manifest.prune condemns it")
              Thread.sleep(100)
            } else if (!useSidecar) {
              val parquetHeads = maxVersions(touched, refreshed = true)
              val resvHeads = manifest.reservedHeads(touched)
              val merged = touched.map(s => s ->
                math.max(parquetHeads.getOrElse(s, 0), resvHeads.getOrElse(s, 0)))
              val appended = buildRows(merged.toDF("aggregate_id", "__head"))
              val n = appended.count()
              if (n == 0) { commitLedger(); result = 0 }
              else {
                val newHeads = appended.groupBy(col("aggregate_id"))
                  .agg(max(col("aggregate_version")).as("h"))
                  .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
                val base = merged.toMap
                val claim = CommitClaim(tip + 1,
                  newHeads.map { case (s, h) => s -> (base.getOrElse(s, 0), h) },
                  Seq.empty, writerId, System.currentTimeMillis(), done = false,
                  ledgerId = ledgerId.filter(_ => batchId >= 0), ledgerBatch = batchId)
                if (manifest.tryClaim(claim)) {
                  writeEventsDFIsolated(appended, s"c${claim.n}")
                  manifest.markDone(claim.n)
                  commitLedger()
                  result = n
                } else attempts += 1 // heads may have moved: rebuild from fresh
                // chain; the abandoned attempt's localCheckpoint blocks are
                // reclaimed asynchronously by Spark's ContextCleaner once the
                // frame goes unreachable (races are rare — contention is claims,
                // not storage)
              }
            } else {
              // sidecar-scale delivery: heads = parquet ⊔ chain reservations,
              // merged with ONE distributed union+agg — the stream set never
              // touches the driver
              val parquetHeadsDF =
                if (!exists(eventsPath))
                  spark.emptyDataset[(String, Int)].toDF("aggregate_id", "__h")
                else committedView(events, refreshed = true)
                  .join(touchedDF, Seq("aggregate_id"), "left_semi")
                  .groupBy(col("aggregate_id"))
                  .agg(max(col("aggregate_version")).as("__h"))
              val resvHeadsDF = manifest.reservationsDF()
                .map(_.select(col("aggregate_id"), col("head").as("__h")))
              val headsDF = resvHeadsDF.fold(parquetHeadsDF)(parquetHeadsDF.unionByName)
                .groupBy(col("aggregate_id")).agg(max(col("__h")).as("__head"))
              val merged = touchedDF.join(headsDF, Seq("aggregate_id"), "left")
                .select(col("aggregate_id"),
                  coalesce(col("__head"), lit(0)).as("__head"))
              val appended = buildRows(merged)
              val n = appended.count()
              if (n == 0) { commitLedger(); result = 0 }
              else {
                // reservations derive from the CHECKPOINTED rows themselves
                // (base = min version - 1), so the sidecar can never drift
                // from what was actually minted
                val sidecarRows = appended.groupBy(col("aggregate_id"))
                  .agg((min(col("aggregate_version")) - 1).cast("int").as("base"),
                    max(col("aggregate_version")).as("head"))
                val sc = manifest.writeSidecar(sidecarRows)
                val claim = CommitClaim(tip + 1, Map.empty, Seq.empty, writerId,
                  System.currentTimeMillis(), done = false,
                  ledgerId = ledgerId.filter(_ => batchId >= 0), ledgerBatch = batchId,
                  streamsRef = Some(sc._1), refCount = sc._2, refMaxHead = sc._3)
                if (manifest.tryClaim(claim)) {
                  writeEventsDFIsolated(appended, s"c${claim.n}")
                  manifest.markDone(claim.n)
                  commitLedger()
                  result = n
                } else { manifest.dropSidecar(sc._1); attempts += 1 }
              }
            }
          }
          if (result < 0) throw new IllegalStateException(
            s"appendBulk lost $attempts claim races — giving up")
          result
      }
    }
  }

  /** The commit chain (lazily materialized; also usable for inspection in
    * Lock mode, where it simply stays empty).
    */
  lazy val manifest = new ManifestCommitLog(spark, path)

  private val writerId =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName // pid@host

  def saveSnapshot(snap: SnapshotRow): Unit = {
    import spark.implicits._
    saveSnapshots(Seq(snap).toDS().toDF())
  }

  /** Distributed snapshot append (same layout contract as [[saveSnapshot]];
    * one bucketed write for any number of streams' snapshots).
    */
  def saveSnapshots(snaps: DataFrame): Unit = {
    ensureDiscCols(snaps)
      .withColumn("bucket", pmod(graft.functions.fnv1a32(col("aggregate_id")), lit(numBuckets)))
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(snapshotsPath)
    graft.sources.GraftMeta.write(spark, snapshotsPath, numBuckets)
  }

  // ── batch rewrites (M1/M2) ───────────────────────────────────────────────

  /** M1 Forget/GDPR: scrub event bodies (and snapshot bodies) of one stream
    * for the given kinds, via a user JSON-rewrite function. Copy-on-write of
    * only the stream's bucket partition (eventstore.go:405-432).
    */
  def forget(aggregateId: String, eventKinds: Set[String],
      scrubEvent: String => String, scrubSnapshot: String => String): Unit =
    withLogLock(path) {
      val b = bucketOf(aggregateId)
      val scrubE = udf(scrubEvent)
      rewriteBucket(eventsPath, evSchema, b) { df =>
        df.withColumn("body",
          when(col("aggregate_id") === aggregateId && col("kind").isin(eventKinds.toSeq: _*),
            scrubE(col("body"))).otherwise(col("body")))
      }
      if (exists(snapshotsPath)) {
        val scrubS = udf(scrubSnapshot)
        rewriteBucket(snapshotsPath, snSchema, b) { df =>
          df.withColumn("body",
            when(col("aggregate_id") === aggregateId, scrubS(col("body")))
              .otherwise(col("body")))
        }
      }
    }

  /** M2 MigrateInPlaceCopyReplace: for every active stream containing one of
    * `targetKinds`, run the user handler over its full event sequence; if it
    * rewrites anything, flag the old rows `migration = revision`, drop the
    * stream's snapshots, and append an `Invalidated` fence plus the migrated
    * copies (`migrated = true`) — exactly the reference's 9-row golden shape
    * (store/postgresql/events_migration.go:18-206).
    *
    * The handler maps the ordered active events of one stream to the new
    * event list (kind/body pairs), or None to leave the stream untouched.
    *
    * Fully distributed, unlike the reference's per-stream transactions
    * (store/postgresql/events_migration.go:90-206): the handler runs on
    * executors inside a sorted-group fold, replacement rows get their ULIDs
    * from per-partition monotonic generators, invalidation is ONE
    * copy-on-write rewrite per affected bucket (a join against the migrated
    * stream set — never an `isin` list or a per-stream job), and all
    * fences+copies land in ONE append. Job count is bounded by the bucket
    * count, not the stream count (MigrationScaleSpec pins this).
    */
  def migrate(revision: Int, targetKinds: Set[String],
      handler: Seq[EventRow] => Option[Seq[EventDetail]],
      nowMs: => Long = System.currentTimeMillis(),
      dense: Boolean = false): Seq[MigratedStream] = {
    import spark.implicits._
    val migrated = migrateDistributed(revision, targetKinds, handler, nowMs, dense)
    // compat guard, same contract as EventStore.migrate: this API returns a
    // driver-side Seq, so the COLLECT (never the committed migration) aborts
    // past graft.migrate.collectMax — a 10⁷-stream kind must use
    // migrateDistributed and keep the outcome frame distributed
    val cap = spark.conf.get("graft.migrate.collectMax", "100000").toInt
    val out = migrated.limit(cap + 1).collect()
    if (out.length > cap) throw new IllegalStateException(
      s"EventLog.migrate touched more than graft.migrate.collectMax=$cap " +
        "streams — this compat API collects every per-stream outcome to the " +
        "driver; the migration itself committed, but for backfill-scale runs " +
        "use migrateDistributed and keep the outcome frame distributed")
    out.toSeq.sortBy(_.aggregateId)
  }

  /** Distributed M2: as [[migrate]] but returns the per-stream outcome as a
    * Dataset, so a migration touching 10⁸ streams never materializes its
    * result on the driver (callers aggregate or write it out instead).
    *
    * `dense = true` declares that the target kinds touch most streams (the
    * kind-wide copy-replace shape): the plan fold then runs as one scan +
    * one shuffle with candidate detection inside the fold, instead of the
    * default candidates-distinct + semi-join shape that keeps a SELECTIVE
    * migration's shuffle bounded by the candidate sliver. Wrong-direction
    * hints are never incorrect, only slower.
    */
  def migrateDistributed(revision: Int, targetKinds: Set[String],
      handler: Seq[EventRow] => Option[Seq[EventDetail]],
      nowMs: => Long = System.currentTimeMillis(),
      dense: Boolean = false): Dataset[MigratedStream] =
    withLogLock(path) {
      import spark.implicits._
      require(revision > 0, "migration revision must be > 0")
      val t = nowMs
      val seedBase = ulidSeed
      val h = handler
      val tk = targetKinds
      val nb = numBuckets
      val fenceKind = KindInvalidated

      var planAttempts = 0
      var result: Option[Dataset[MigratedStream]] = None
      while (result.isEmpty) {
        planAttempts += 1

        // 1+2. per-stream sorted fold over the candidate streams, two plan
        // shapes by declared selectivity:
        //  - dense = false (default): candidate ids first (scan + small
        //    distinct), then a semi-join restricts the fold's shuffle to
        //    candidate events only — right when the target kinds are rare
        //    (the fold shuffle carries the sliver, and AQE's runtime filters
        //    prune the probe side);
        //  - dense = true: ONE scan + ONE shuffle of the log, candidates
        //    detected inside the fold — right for the reference's
        //    kind-wide copy-replace shape (events_migration.go walks every
        //    aggregate of a kind) where "candidates" ≈ all streams and the
        //    semi-join would shuffle the same volume plus an extra scan +
        //    distinct.
        // Both run the handler on the stream's version-ordered active
        // events and yield identical plans.
        val folded: Dataset[MigrationPlan] =
          if (dense)
            activeEvents.as[EventRow]
              .repartition(col("aggregate_id"))
              .sortWithinPartitions(col("aggregate_id"), col("aggregate_version"))
              .mapPartitions { it =>
                val buf = it.buffered
                new Iterator[MigrationPlan] {
                  private var nextPlan: MigrationPlan = _
                  private var done = false
                  private def advance(): Unit = {
                    nextPlan = null
                    while (nextPlan == null && buf.hasNext) {
                      val id = buf.head.aggregate_id
                      val evs = scala.collection.mutable.ArrayBuffer.empty[EventRow]
                      while (buf.hasNext && buf.head.aggregate_id == id)
                        evs += buf.next()
                      if (evs.exists(e => tk.contains(e.kind)))
                        h(evs.toSeq).filter(_.nonEmpty).foreach { details =>
                          nextPlan = MigrationPlan(id, evs.head.aggregate_kind,
                            evs.head.discriminator,
                            evs.map(_.aggregate_version).max, details, Seq.empty)
                        }
                    }
                    if (nextPlan == null) done = true
                  }
                  advance()
                  override def hasNext: Boolean = !done
                  override def next(): MigrationPlan = {
                    val p = nextPlan; advance(); p
                  }
                }
              }
          else {
            val candidates = activeEvents
              .filter(col("kind").isin(targetKinds.toSeq: _*))
              .select("aggregate_id").distinct()
            activeEvents
              .join(candidates, Seq("aggregate_id"), "left_semi")
              .as[EventRow]
              .groupByKey(_.aggregate_id)
              .flatMapSortedGroups(col("aggregate_version")) { (id, it) =>
                val evs = it.toSeq
                h(evs).filter(_.nonEmpty) match {
                  case Some(details) =>
                    Iterator(MigrationPlan(id, evs.head.aggregate_kind,
                      evs.head.discriminator, evs.map(_.aggregate_version).max,
                      details, Seq.empty))
                  case None => Iterator.empty
                }
              }
          }

        // 3. mint fence+copy rows with a per-partition monotonic ULID
        // generator; materialize BEFORE any rewrite below invalidates the
        // lineage's source files.
        val plan: Dataset[MigrationPlan] = phase("migrate: plan fold+checkpoint")(folded
          .mapPartitions { it =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val pgen = new Ulid.Generator(seed = seedBase.map(s => s * 1000003L + pid))
            it.map { p =>
              val hash = Fnv1a32.hashString(p.aggregateId)
              val fence = EventRow(pgen.next(t), p.aggregateId, hash,
                p.maxVersion + 1, p.aggregateKind, fenceKind, "{}",
                p.discriminator, new Timestamp(t), revision, false)
              val copies = p.details.zipWithIndex.map { case (d, i) =>
                EventRow(pgen.next(t), p.aggregateId, hash,
                  p.maxVersion + 2 + i, p.aggregateKind, d.kind, d.body,
                  p.discriminator, new Timestamp(t), 0, true)
              }
              p.copy(rows = fence +: copies)
            }
          }
          .checkpointOwned())

        // emptiness falls out of the bucket-set collect below — no separate
        // isEmpty job
        val ids0 = plan.select(col("aggregateId").as("m_id"),
          col("maxVersion").as("m_maxv"),
          pmod(graft.functions.fnv1a32(col("aggregateId")), lit(nb)).as("m_bucket"))
        val buckets0 = phase("migrate: bucket-set collect")(
          ids0.select("m_bucket").distinct().as[Int].collect().sorted)
        if (buckets0.isEmpty)
          result = Some(spark.emptyDataset[MigratedStream])
        else {
          // 3. ONE invalidation rewrite over the affected bucket SET: flag old
          // rows via a join against the migrated stream ids, BOUNDED by each
          // stream's planned head — rows a concurrent bulk appender lands
          // past our reservation are post-migration events and must never be
          // flagged. Lock mode rewrites all touched buckets in a single
          // dynamic-partition-overwrite job; manifest mode stages the
          // rewrite AND the fence+copy append under ONE rewrite claim whose
          // done-flip swaps the whole migration in atomically (see
          // [[migrateCommitManifest]]).
          val ids = ids0
          val buckets = buckets0
          val invalidate: DataFrame => DataFrame = { df =>
            val allIds = ids.select("m_id", "m_maxv")
            df.join(allIds, df("aggregate_id") === allIds("m_id"), "left")
              .withColumn("migration",
                when(col("m_id").isNotNull && col("migration") === 0 &&
                  col("aggregate_version") <= col("m_maxv"), lit(revision))
                  .otherwise(col("migration")))
              .drop("m_id", "m_maxv")
          }
          val dropSnapshots: DataFrame => DataFrame = { df =>
            val allIds = ids.select("m_id")
            df.join(allIds, df("aggregate_id") === allIds("m_id"), "left_anti")
          }
          val done =
            if (commitMode == CommitMode.Lock) {
              rewriteBucketsOverwrite(eventsPath, evSchema, buckets.toSeq)(invalidate)
              if (exists(snapshotsPath))
                rewriteBucketsOverwrite(snapshotsPath, snSchema, buckets.toSeq)(dropSnapshots)
              // ONE append of every fence + migrated copy
              writeEventsDF(plan.select(explode(col("rows")).as("r")).select("r.*"))
              true
            } else migrateCommitManifest(plan, buckets.toSeq, invalidate, dropSnapshots)
          if (done)
            result = Some(plan.map(p => MigratedStream(p.aggregateId,
              p.maxVersion + 1 + p.details.size, p.rows.last.id, p.details,
              p.discriminator)))
          else if (planAttempts >= 5)
            throw new ConcurrentModificationException(
              s"migration revision $revision: stream heads kept moving under " +
                s"concurrent appends across $planAttempts plan attempts — giving up")
          // else: an append slipped in after the plan read its streams —
          // recompute the plan from the NEW committed state (the handler then
          // sees the interleaved events too: no write is ever lost)
        }
      }
      result.get
    }

  /** Manifest-mode migration commit: the entire migration — invalidation
    * rewrite of the affected buckets, snapshot drops AND the fence+copy
    * append — rides ONE rewrite claim, so its `done` marker is the single
    * atomic visibility switch. Readers never observe the intermediate state
    * the reference's per-stream transactions also forbid (history flagged
    * away, copies not yet visible; store/postgresql/events_migration.go:90-206).
    *
    * Concurrent-append fencing (the all-writers unique-index parity):
    *  - the claim RESERVES `(head, head+1+copies)` for every migrated
    *    stream, so interactive `append`s lose their optimistic check and
    *    `appendBulk` continues past the fence — never a version collision;
    *  - before claiming, the plan is validated against fresh committed heads
    *    and chain reservations; any stream whose head moved since the plan
    *    was computed makes this return false and the caller RE-PLANS from
    *    the new state (claim-number density closes the validate→claim gap:
    *    a writer claiming in between takes our claim number and we loop);
    *  - appends landing DURING the staged write keep their files — they are
    *    not in the claim's `replaced` set, and the bounded invalidation
    *    never flags rows past each stream's planned head.
    *
    * Reservations ride the claim TSV up to
    * [[ManifestCommitLog.inlineClaimMaxStreams]] streams; beyond that they
    * go to the range-sorted parquet sidecar (the bulkImport mechanism) and
    * the migrated stream set never touches the driver — a 10⁸-stream
    * migration costs the same driver memory as 10.
    */
  private def migrateCommitManifest(plan: Dataset[MigrationPlan], buckets: Seq[Int],
      invalidate: DataFrame => DataFrame,
      dropSnapshots: DataFrame => DataFrame): Boolean = {
    // (aggregate_id, base = head at plan time, head = base + 1 fence + copies)
    val headsDF = plan.select(col("aggregateId").as("aggregate_id"),
      col("maxVersion").as("base"),
      (col("maxVersion") + lit(1) + size(col("details"))).cast("int").as("head"))
    // bounded decision probe (bulkImport's): collect at most inlineMax+1 rows
    val probe = phase("migrate: heads probe")(
      headsDF.limit(ManifestCommitLog.inlineClaimMaxStreams + 1).collect())
    val useSidecar = probe.length > ManifestCommitLog.inlineClaimMaxStreams
    val resv: Map[String, (Int, Int)] =
      if (useSidecar) Map.empty
      else probe.map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    val sidecar =
      if (useSidecar) Some(phase("migrate: sidecar write")(manifest.writeSidecar(headsDF)))
      else None
    // every no-commit exit reclaims the staged sidecar (else it would sit as
    // an orphan until prune's staleness sweep)
    def abandon(): Boolean = { sidecar.foreach(s => manifest.dropSidecar(s._1)); false }
    val conf = spark.sessionState.newHadoopConf()

    // live bucket files (committed, not replaced, not pending) — the same
    // input rules as rewriteBucketManifest, across the affected bucket set
    def liveFiles(tablePath: String): Seq[String] = {
      val tableName = tablePath.substring(tablePath.lastIndexOf('/') + 1)
      val claims = manifest.cachedClaims()
      val staleNames = manifest.replacedRelnames()
      val pendingTokens = claims.filterNot(_.done).map(c => s"c${c.n}-")
      buckets.flatMap { b =>
        val bdir = new org.apache.hadoop.fs.Path(s"$tablePath/bucket=$b")
        val hfs = bdir.getFileSystem(conf)
        if (!hfs.exists(bdir)) Seq.empty[String]
        else hfs.listStatus(bdir)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .filterNot(f => staleNames.contains(s"$tableName/bucket=$b/" + f.getPath.getName) ||
            pendingTokens.exists(f.getPath.getName.startsWith))
          .map(_.getPath.toString).toSeq
      }
    }

    var claimed: Option[CommitClaim] = None
    var eventInputs: Seq[String] = Nil
    var snapInputs: Seq[String] = Nil
    // each planned stream's (id, head-at-plan) — shared by both distributed
    // staleness probes below
    val planned = plan.select(col("aggregateId").as("m_id"),
      col("maxVersion").as("m_v"))
    var attempts = 0
    while (claimed.isEmpty && attempts < 100) {
      val tip = manifest.refresh()
      // chain staleness: any reservation past a planned stream's base means
      // an append committed (or is in flight) beyond the plan's snapshot.
      // An inline-scale plan folds inline chain lines driver-side; a
      // sidecar-scale plan (or a chain carrying sidecars) is compared in
      // ONE distributed join — reservationsDF covers both line kinds, so
      // the migrated stream set never rides an isin list or a driver map.
      val chainStaleInline = !useSidecar &&
        manifest.cachedClaims().exists(_.streams.exists {
          case (s, (_, head)) => resv.get(s).exists(_._1 < head)
        })
      if (chainStaleInline) return abandon()
      // chain + parquet staleness in ONE distributed job: any observed head
      // (a chain reservation's, or a committed row's version in the affected
      // buckets) past a planned stream's plan-time head means an append
      // committed or is in flight beyond the plan's snapshot. Existence of
      // ANY such row is the predicate, so no per-stream aggregation is
      // needed, and the migrated stream set never rides an isin list or a
      // driver map — reservationsDF covers inline and sidecar lines alike.
      val chainHeads =
        if (useSidecar || manifest.cachedClaims().exists(_.streamsRef.isDefined))
          manifest.reservationsDF().map(_.select(col("aggregate_id"),
            col("head").cast("int").as("observed")))
        else None
      // refreshed = true: the loop top just paid manifest.refresh(), skip
      // the repeat chain listing inside the read filter
      val parquetHeads = committedView(eventsWithBucket, refreshed = true)
        .filter(col("bucket").isin(buckets: _*))
        .select(col("aggregate_id"), col("aggregate_version").as("observed"))
      val stale = phase("migrate: staleness probe")(
        chainHeads.fold(parquetHeads)(parquetHeads.unionByName(_))
          .join(planned, col("aggregate_id") === col("m_id"))
          .filter(col("observed") > col("m_v"))
          .limit(1).count() > 0)
      if (stale) return abandon()
      eventInputs = liveFiles(eventsPath)
      snapInputs = if (exists(snapshotsPath)) liveFiles(snapshotsPath) else Nil
      val c = CommitClaim(tip + 1, resv, Seq.empty, writerId,
        System.currentTimeMillis(), done = false, CommitClaim.KindRewrite,
        eventInputs ++ snapInputs,
        streamsRef = sidecar.map(_._1),
        refCount = sidecar.map(_._2).getOrElse(0L),
        refMaxHead = sidecar.map(_._3).getOrElse(0))
      if (manifest.tryClaim(c)) claimed = Some(c) else attempts += 1
    }
    val claim = claimed.getOrElse {
      abandon(): Unit
      throw new IllegalStateException(
        s"migration rewrite lost $attempts claim races — giving up")
    }
    val token = s"c${claim.n}"
    if (eventInputs.nonEmpty)
      phase("migrate: stage events rewrite")(
        stageRewrite(eventsPath, evSchema, eventInputs, token)(invalidate))
    if (snapInputs.nonEmpty)
      phase("migrate: stage snapshot rewrite")(
        stageRewrite(snapshotsPath, snSchema, snapInputs, token)(dropSnapshots))
    phase("migrate: fence+copy append")(
      writeEventsDFIsolated(plan.select(explode(col("rows")).as("r")).select("r.*"), token))
    phase("migrate: markDone")(
      manifest.markDone(claim.n)) // the atomic swap: old files out, rewrite + fences in
    true
  }

  /** Rewrite a set of live bucket files under a claim token in ONE job:
    * read with basePath (keeps the bucket partition column), transform, one
    * sorted file per bucket (the live-projector ordering invariant), move
    * into the bucket directories token-prefixed. Staging lives under the
    * claim's `.commit-tmp/c{N}/` so a condemned claim's prune sweeps it.
    */
  private def stageRewrite(tablePath: String,
      schema: org.apache.spark.sql.types.StructType, inputs: Seq[String],
      token: String)(f: DataFrame => DataFrame): Unit = {
    val cur = spark.read.option("basePath", tablePath)
      .schema(addBucket(schema)).parquet(inputs: _*)
    val out = f(cur.drop("bucket"))
      .withColumn("bucket", pmod(graft.functions.fnv1a32(col("aggregate_id")), lit(numBuckets)))
    val tmpDir = s"$tablePath/.commit-tmp/$token/rw"
    out.repartition(col("bucket"))
      .sortWithinPartitions("bucket", "id")
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .option("compression", EventLog.Compression)
      .parquet(tmpDir)
    val tmp = new org.apache.hadoop.fs.Path(tmpDir)
    val fs = tmp.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(tmp).filter(_.isDirectory).foreach { bdir =>
      val dest = new org.apache.hadoop.fs.Path(tablePath, bdir.getPath.getName)
      fs.mkdirs(dest)
      fs.listStatus(bdir.getPath).filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { fi =>
          fs.rename(fi.getPath,
            new org.apache.hadoop.fs.Path(dest, s"$token-${fi.getPath.getName}")): Unit
        }
    }
    fs.delete(tmp.getParent, true): Unit
  }

  /** M4 support: append a `NoOp` fence event to EVERY active stream of one
    * aggregate kind, in a single distributed write: one shuffle to compute
    * per-stream max versions, fences minted by per-partition monotonic ULID
    * generators — nothing per-stream ever touches the driver, so 10⁹ streams
    * cost the same driver memory as 10 (unlike the reference's paged
    * iteration, store/postgresql/projection_migration.go). Fences bump each
    * stream's version so concurrent writers started before the rebuild lose
    * their optimistic check (eventstore.go:123-131).
    */
  def appendNoOpFences(aggregateKind: String, nowMs: => Long = System.currentTimeMillis()): Long =
    withLogLock(path) {
      import spark.implicits._
      val t = nowMs
      val seedBase = ulidSeed
      val kind = aggregateKind
      val noOp = KindNoOp
      // Heads merge chain reservations with committed parquet maxima in
      // manifest mode (DISTRIBUTED — the reservation table is chain-sized,
      // broadcast by Spark; the stream set never touches the driver here),
      // so a fence can't collide with an in-flight append's reserved slot.
      def computeFences(): Dataset[EventRow] = {
        val parquetHeads = activeEvents
          .filter(col("aggregate_kind") === aggregateKind)
          .groupBy(col("aggregate_id"))
          .agg(max(col("aggregate_version")).as("v"),
            first(col("discriminator")).as("disc"))
        val merged =
          if (commitMode == CommitMode.Lock) parquetHeads
          else manifest.reservationsDF() match {
            case None => parquetHeads
            case Some(resv) => parquetHeads
              .join(resv.select(col("aggregate_id").as("r_id"), col("head"))
                .groupBy(col("r_id")).agg(max(col("head")).as("r_v")),
                col("aggregate_id") === col("r_id"), "left")
              .select(col("aggregate_id"),
                greatest(col("v"), coalesce(col("r_v"), lit(0))).as("v"),
                col("disc"))
          }
        merged
          .as[(String, Int, Map[String, String])]
          .mapPartitions { it =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val pgen = new Ulid.Generator(seed = seedBase.map(s => s * 7368787L + pid))
            it.map { case (aggId, v, disc) =>
              EventRow(pgen.next(t), aggId, Fnv1a32.hashString(aggId), v + 1,
                kind, noOp, "{}", disc, new Timestamp(t), 0, false)
            }
          }
          .checkpointOwned() // cut lineage off the files the append lands next to
      }
      commitMode match {
        case CommitMode.Lock =>
          val fences = computeFences()
          val n = fences.count()
          if (n > 0) writeEventsDF(fences.toDF())
          n
        case CommitMode.Manifest =>
          // claim-fenced like every other manifest writer: reserve each
          // fenced stream's next version so concurrent appends either see
          // the reservation or lose the claim race; a lost race recomputes
          // heads from the fresh chain. Reservations ride the claim TSV up
          // to [[ManifestCommitLog.inlineClaimMaxStreams]] streams; beyond
          // that they go to a parquet sidecar (the bulkImport mechanism) —
          // a kind-wide fence pass over 10⁸ streams never folds its stream
          // set into driver memory.
          var attempts = 0
          var res = -1L
          while (res < 0 && attempts < 100) {
            val tip = manifest.refresh()
            val fences = phase("fences: compute+checkpoint")(computeFences())
            // bounded decision probe (bulkImport's): at most inlineMax+1
            // fence rows decide inline-vs-sidecar AND become the inline
            // claim lines — no full count job, no second inline collect; a
            // sidecar-scale pass gets its exact n from the sidecar write's
            // own summary
            val probe = phase("fences: bounded probe")(
              fences.limit(ManifestCommitLog.inlineClaimMaxStreams + 1).collect())
            if (probe.isEmpty) res = 0
            else {
              val useSidecar = probe.length > ManifestCommitLog.inlineClaimMaxStreams
              val lines =
                if (useSidecar) Map.empty[String, (Int, Int)]
                else probe.map(e =>
                  e.aggregate_id -> (e.aggregate_version - 1, e.aggregate_version)).toMap
              val sidecar =
                if (useSidecar) Some(phase("fences: sidecar write")(manifest.writeSidecar(
                  fences.toDF().select(col("aggregate_id"),
                    (col("aggregate_version") - 1).as("base"),
                    col("aggregate_version").as("head")))))
                else None
              val n = sidecar.map(_._2).getOrElse(probe.length.toLong)
              val c = CommitClaim(tip + 1, lines, Seq.empty, writerId,
                System.currentTimeMillis(), done = false,
                streamsRef = sidecar.map(_._1),
                refCount = sidecar.map(_._2).getOrElse(0L),
                refMaxHead = sidecar.map(_._3).getOrElse(0))
              if (manifest.tryClaim(c)) {
                phase("fences: bucketed write")(
                  writeEventsDFIsolated(fences.toDF(), s"c${c.n}"))
                phase("fences: markDone")(manifest.markDone(c.n))
                res = n
              } else {
                // lost the race: the next lap recomputes fences from the
                // fresh chain — reclaim this attempt's staged sidecar
                sidecar.foreach(s0 => manifest.dropSidecar(s0._1))
                attempts += 1
              }
            }
          }
          if (res < 0) throw new IllegalStateException(
            s"appendNoOpFences lost $attempts claim races — giving up")
          res
      }
    }

  /** Compaction: every append writes new files, so a hot log accumulates
    * small files (the classic small-files problem — fatal at 100 TB where
    * scan cost is dominated by file opens). Rewrites the given buckets (or
    * all) into one sorted file per bucket: restores the ULID sort order that
    * makes parquet min/max skipping effective on time-range scans. On a real
    * deployment this runs incrementally, a bucket subset per maintenance
    * window — which is why `buckets` is a parameter.
    *
    * `layout` picks the output clustering: [[CompactionLayout.IdSort]]
    * (default, id-range-scan-optimal) or [[CompactionLayout.ZOrder]] for
    * mixed time×attribute workloads — each rewritten bucket's files then
    * cover compact Morton intervals, so both dimensions prune at once. In
    * Manifest mode the layout runs UNDER the same per-bucket rewrite claims
    * as plain compaction: appends racing the re-layout commit safely either
    * side of it (CompactionSpec pins committed-view equality through a
    * claim-fenced z-order compact).
    */
  def compact(buckets: Option[Seq[Int]] = None,
      maxRecordsPerFile: Long = 0L,
      layout: CompactionLayout = CompactionLayout.IdSort): Unit = withLogLock(path) {
    if (!exists(eventsPath)) return
    if (commitMode == CommitMode.Manifest) {
      // incremental, append-safe form: file-level rewrite claims — a
      // single-bucket call keeps the per-bucket maintenance cadence a
      // 100 TB log schedules (and the rival-compactor no-op semantics);
      // a multi-bucket call batches the set under ONE claim / read /
      // partitioned write instead of numBuckets independent
      // read-rewrite-commit cycles (r16 opt: a full compact was ~3 jobs
      // × numBuckets, now ~3 total)
      val bs = buckets.getOrElse((0 until numBuckets).toSeq)
      if (bs.size == 1)
        rewriteBucketManifest(eventsPath, evSchema, bs.head, layout)(df => df)
      else rewriteBucketsManifest(eventsPath, evSchema, bs, layout)(df => df)
      return
    }
    val scoped = buckets match {
      case Some(bs) => eventsWithBucket.filter(col("bucket").isin(bs: _*))
      case None => eventsWithBucket
    }
    val all = scoped.checkpointOwned() // materialize before overwriting source files
    val arranged = layout match {
      case CompactionLayout.IdSort =>
        all.repartition(numBuckets, col("bucket"))
          .sortWithinPartitions(col("bucket"), col("id"))
      case CompactionLayout.ZOrder(dims, bits, files) =>
        // range-partition on (bucket, zkey): the write's partitionBy splits
        // by bucket anyway, so each bucket lands as z-interval files
        all.withColumn("__zkey", graft.ops.Layout.zorderKey(dims, bits))
          .repartitionByRange(numBuckets * files, col("bucket"), col("__zkey"))
          .sortWithinPartitions(col("bucket"), col("__zkey"))
          .drop("__zkey")
    }
    arranged
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .option("compression", EventLog.Compression)
      // bound file sizes so a hot bucket still compacts into scannable units
      .option("maxRecordsPerFile", if (maxRecordsPerFile > 0) maxRecordsPerFile.toString else "0")
      .parquet(eventsPath)
    Checkpoints.release(all) // rewrite landed; drop the materialized blocks now
    // full-table Overwrite deletes the directory, marker included — restore it
    graft.sources.GraftMeta.invalidate(eventsPath)
    graft.sources.GraftMeta.write(spark, eventsPath, numBuckets)
  }

  /** Retention: prune events that are BOTH older than `beforeMs` (by ULID
    * time) AND covered by their stream's latest snapshot (version ≤ the
    * snapshot's) — the only form of event-log TTL that keeps every fold
    * reproducible: `retrieve` and the stitched rehydration
    * ([[graft.store.EventStore.rehydrateAllStitched]]) read snapshot + tail
    * and never miss pruned prefixes. Un-snapshotted streams are untouched.
    * One multi-bucket copy-on-write rewrite (join against the snapshot
    * heads), scoped to the buckets that actually shrink; invalidated audit
    * rows below the covered version age out under the same rule — that is
    * what retention means. Returns rows dropped (counted by one
    * parquet-pruned scan of the `id < bound` sliver, not by bracketing
    * full-table counts).
    *
    * The reference has no retention op at all — logs grow forever or get
    * truncated by hand; at 100 TB this plus [[compact]] IS the storage
    * lifecycle.
    */
  def pruneSnapshotted(beforeMs: Long): Long = withLogLock(path) {
    if (!exists(eventsPath) || !exists(snapshotsPath)) 0L
    else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("aggregate_id")).orderBy(col("id").desc)
      val heads = snapshots
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("aggregate_id").as("p_id"), col("aggregate_version").as("p_v"))
        .checkpointOwned() // consumed by the rewrite below
      val bound = Ulid.timeOnly(beforeMs)
      val keep: DataFrame => DataFrame = { df =>
        df.join(heads, df("aggregate_id") === heads("p_id"), "left")
          .filter(col("p_id").isNull ||
            col("aggregate_version") > col("p_v") || col("id") >= bound)
          .drop("p_id", "p_v")
      }
      // Count the doomed rows per bucket with ONE scan whose `id < bound`
      // predicate pushes to parquet (min/max skipping prunes every young
      // file — at scale this reads the old sliver, where the former
      // before/after bracketing counted the FULL table twice on top of the
      // rewrite). heads is unique per stream (rn = 1), so the inner join
      // can't fan out; the per-bucket counts then scope the rewrite to the
      // buckets that actually shrink — an incremental prune after a recent
      // one rewrites (almost) nothing.
      val droppedByBucket = committedView(eventsWithBucket)
        .filter(col("id") < bound)
        .join(heads, col("aggregate_id") === col("p_id"))
        .filter(col("aggregate_version") <= col("p_v"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val dropped = droppedByBucket.values.sum
      if (dropped > 0) {
        val affected = droppedByBucket.keys.toSeq.sorted
        if (commitMode == CommitMode.Lock)
          rewriteBucketsOverwrite(eventsPath, evSchema, affected)(keep)
        else if (affected.size == 1)
          rewriteBucketManifest(eventsPath, evSchema, affected.head)(keep)
        else
          rewriteBucketsManifest(eventsPath, evSchema, affected)(keep)
      }
      Checkpoints.release(heads) // every rewrite consuming it has run
      dropped
    }
  }

  /** Maintenance telemetry: per-bucket file counts and bytes for both
    * tables plus commit-chain counters. Pure metadata listing (no data
    * read); `maxFilesPerBucket` crossing a threshold is the trigger for
    * [[compact]], `replacedAwaitingGc > 0` for [[gcReplaced]] — the
    * scheduler loop a 100 TB log runs in its maintenance window.
    */
  def stats(): LogStats = {
    val conf = spark.sessionState.newHadoopConf()
    def table(tablePath: String): Seq[BucketStat] = {
      val root = new org.apache.hadoop.fs.Path(tablePath)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
        .map { d =>
          val files = fs.listStatus(d.getPath).filter(_.getPath.getName.endsWith(".parquet"))
          BucketStat(d.getPath.getName.stripPrefix("bucket=").toInt,
            files.length, files.map(_.getLen).sum)
        }.sortBy(_.bucket).toSeq
    }
    val claims = if (commitMode == CommitMode.Manifest) {
      manifest.refresh(): Unit
      manifest.claims()
    } else Seq.empty
    LogStats(
      events = table(eventsPath),
      snapshots = table(snapshotsPath),
      pendingClaims = claims.count(!_.done),
      doneClaims = claims.count(_.done),
      replacedAwaitingGc = claims
        .filter(c => c.done && c.kind == CommitClaim.KindRewrite)
        .flatMap(_.replaced)
        .count { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(conf).exists(hp)
        })
  }

  /** Re-bucketing maintenance: rewrite the whole log (events AND snapshots)
    * under a new bucket count — the grow-the-cluster operation a log sized
    * at 64 buckets needs when the corpus grows 100×, since bucket count
    * bounds both point-scan parallelism and compaction granularity. One
    * distributed rewrite per table into a temp directory, then a swap; the
    * bucket column is re-derived from `fnv1a32(aggregate_id)`, so ordering,
    * versions and ids are untouched. Returns a NEW EventLog bound to the
    * same path with the new count — the receiving instance MUST be
    * discarded (its `bucketOf` would prune point reads to the wrong
    * directory). Lock mode only: a manifest-mode log re-buckets by parallel
    * copy into a fresh path + reader cutover, which is also the zero-
    * downtime recipe at 100 TB (this in-place form assumes its maintenance
    * window).
    */
  def rebucket(newNumBuckets: Int): EventLog = withLogLock(path) {
    require(newNumBuckets > 0, "newNumBuckets must be positive")
    require(commitMode == CommitMode.Lock,
      "in-place rebucket is lock-mode only; manifest logs re-bucket by copy + cutover")
    val conf = spark.sessionState.newHadoopConf()
    def rewrite(tablePath: String, schema: org.apache.spark.sql.types.StructType): Unit =
      if (exists(tablePath)) {
        val tmpDir = s"$tablePath.rebucket-tmp"
        spark.read.schema(addBucket(schema)).parquet(tablePath)
          .drop("bucket")
          .withColumn("bucket",
            pmod(graft.functions.fnv1a32(col("aggregate_id")), lit(newNumBuckets)))
          .repartition(newNumBuckets, col("bucket"))
          .sortWithinPartitions(col("bucket"), col("id"))
          .write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .option("compression", EventLog.Compression)
          .parquet(tmpDir)
        val src = new org.apache.hadoop.fs.Path(tmpDir)
        val dst = new org.apache.hadoop.fs.Path(tablePath)
        val fs = dst.getFileSystem(conf)
        fs.delete(dst, true)
        fs.rename(src, dst): Unit
        graft.sources.GraftMeta.invalidate(tablePath)
        graft.sources.GraftMeta.write(spark, tablePath, newNumBuckets)
      }
    rewrite(eventsPath, evSchema)
    rewrite(snapshotsPath, snSchema)
    new EventLog(spark, path, newNumBuckets, discriminatorKeys, ulidSeed,
      commitMode, discriminatorPolicy)
  }

  /** The manifest-mode (and 100 TB zero-downtime) re-bucketing recipe the
    * in-place form above points at: parallel COPY of the committed view into
    * a FRESH log path under the new bucket count, then reader cutover. The
    * source log stays fully readable and writable throughout; the copy
    * reads read-committed (pending claims and replaced files excluded), so
    * the new log is a consistent snapshot as of the copy's start. Writers
    * must be quiesced (or their tail re-driven) before cutting over —
    * that's the cutover protocol's job, not this method's; the method
    * returns a log whose content equals the source's committed view at
    * entry, bit-for-bit except the bucket assignment.
    *
    * One distributed rewrite per table, no driver materialization; the new
    * chain starts empty (plain data files are visible to manifest readers —
    * claims only gate files written THROUGH the chain).
    */
  def rebucketCopy(newPath: String, newNumBuckets: Int): EventLog = {
    require(newNumBuckets > 0, "newNumBuckets must be positive")
    require(commitMode == CommitMode.Manifest,
      "rebucketCopy is the manifest-mode recipe; lock-mode logs rebucket in place")
    // An ALIASED destination (trailing slash, relative vs absolute, symlink)
    // must not pass a raw string compare: SaveMode.Overwrite would delete the
    // source events directory while the copy job is still lazily reading it.
    // Compare filesystem-qualified paths instead.
    locally {
      val conf = spark.sessionState.newHadoopConf()
      def qualified(p: String) = {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).makeQualified(hp)
      }
      require(qualified(newPath) != qualified(path),
        s"rebucketCopy needs a fresh destination path (got an alias of the source: $newPath)")
    }
    def copyTable(tablePath: String, destPath: String,
        schema: org.apache.spark.sql.types.StructType): Unit =
      if (exists(tablePath)) {
        committedView(spark.read.schema(addBucket(schema)).parquet(tablePath))
          .drop("bucket")
          .withColumn("bucket",
            pmod(graft.functions.fnv1a32(col("aggregate_id")), lit(newNumBuckets)))
          .repartition(newNumBuckets, col("bucket"))
          .sortWithinPartitions(col("bucket"), col("id"))
          .write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .option("compression", EventLog.Compression)
          .parquet(destPath)
        graft.sources.GraftMeta.write(spark, destPath, newNumBuckets)
      }
    copyTable(eventsPath, s"$newPath/events", evSchema)
    copyTable(snapshotsPath, s"$newPath/snapshots", snSchema)
    new EventLog(spark, newPath, newNumBuckets, discriminatorKeys, ulidSeed,
      commitMode, discriminatorPolicy)
  }

  /** Snapshot compaction: drop superseded snapshots, keeping the latest per
    * stream (the only one `latestSnapshot` ever serves).
    */
  def compactSnapshots(): Unit = withLogLock(path) {
    if (!exists(snapshotsPath)) return
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("aggregate_id")).orderBy(col("id").desc)
    if (commitMode == CommitMode.Manifest) {
      // bucket-local latest-per-key IS global latest-per-key (aggregate_id
      // determines the bucket) — one batched rewrite claim over the bucket
      // set (append-race-safe exactly as the per-bucket form; r16 opt)
      rewriteBucketsManifest(snapshotsPath, snSchema, (0 until numBuckets)) { df =>
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      }
      return
    }
    val latest = spark.read.schema(addBucket(snSchema)).parquet(snapshotsPath)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .checkpointOwned()
    latest
      .repartition(numBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(snapshotsPath)
    Checkpoints.release(latest) // rewrite landed; drop the materialized blocks
    graft.sources.GraftMeta.invalidate(snapshotsPath)
    graft.sources.GraftMeta.write(spark, snapshotsPath, numBuckets)
  }

  // ── internals ────────────────────────────────────────────────────────────

  /** Per-stream version heads from COMMITTED data only. The claim-aware view
    * matters in manifest mode: rows of pending/crashed claims' hidden token
    * files must not feed head computation directly — they are covered by
    * [[ManifestCommitLog.reservedHead]] while their claim lives, and
    * physically deleted before the claim is forgotten. Reading them here
    * would otherwise couple correctness to prune's internal delete ordering.
    */
  private def maxVersions(aggregateIds: Seq[String],
      refreshed: Boolean = false): Map[String, Int] = {
    if (!exists(eventsPath)) return Map.empty
    val buckets = aggregateIds.map(bucketOf).distinct
    committedView(eventsWithBucket, refreshed)
      .filter(col("bucket").isin(buckets: _*) &&
        col("aggregate_id").isin(aggregateIds: _*))
      .groupBy("aggregate_id")
      .agg(max("aggregate_version").as("v"))
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
  }

  private def filterDiscriminator(d: Map[String, String]): Map[String, String] =
    if (discriminatorKeys.isEmpty) d
    else d.view.filterKeys(k => discriminatorKeys.contains(k.toLowerCase)).toMap

  /** Every commit writes EXACTLY ONE id-sorted file per touched bucket (the
    * `repartition(bucket)` below): live projectors read the log as a file
    * stream, and a commit scattered over several files per bucket can have
    * those files straddle micro-batches in arbitrary listing order — the
    * per-partition monotonic dedup then drops the lower-id rows as late.
    * One file per bucket per commit makes arrival order per dedup partition
    * follow id order (files within a commit are disjoint by bucket; across
    * commits ids grow with commit time). It is also the small-files fix: an
    * N-task append no longer writes N tiny files into one bucket. The
    * shuffle this costs carries the BATCH being committed, never the log.
    */
  private def bucketed(df: DataFrame): DataFrame =
    ensureDiscCols(df)
      .withColumn("bucket", pmod(graft.functions.fnv1a32(col("aggregate_id")), lit(numBuckets)))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "id")

  private def writeEvents(rows: Seq[EventRow], mode: SaveMode): Unit = {
    import spark.implicits._
    bucketed(rows.toDS().toDF())
      .write.mode(mode).partitionBy("bucket")
      .option("compression", EventLog.Compression)
      .parquet(eventsPath)
    graft.sources.GraftMeta.write(spark, eventsPath, numBuckets)
  }

  /** Distributed append of an already-distributed row set (same layout
    * contract as [[writeEvents]], without a driver round-trip).
    */
  private def writeEventsDF(df: DataFrame): Unit = {
    bucketed(df)
      .write.mode(SaveMode.Append).partitionBy("bucket")
      .option("compression", EventLog.Compression)
      .parquet(eventsPath)
    graft.sources.GraftMeta.write(spark, eventsPath, numBuckets)
  }

  /** Manifest-mode data write: concurrent `.parquet(eventsPath)` appends are
    * unsafe even with versions reserved — Spark jobs writing one output path
    * share a `_temporary/` staging directory and clobber each other. Each
    * commit therefore writes to its own claim-scoped temp dir (its own
    * staging) and MOVES the finished part files into the bucket directories;
    * renames of finished files never conflict, so data writes stay parallel.
    * Visibility may be out of claim order — harmless, versions are already
    * reserved and readers order by id/version, never by file arrival.
    */
  private def writeEventsIsolated(rows: Seq[EventRow], token: String): Unit = {
    import spark.implicits._
    writeEventsDFIsolated(rows.toDS().toDF(), token)
  }

  /** DataFrame form of [[writeEventsIsolated]] — the bulk writers' manifest
    * path (claim-scoped staging + per-file moves, no shared `_temporary`).
    */
  private def writeEventsDFIsolated(df: DataFrame, token: String): Unit = {
    val tmpDir = s"$eventsPath/.commit-tmp/$token"
    bucketed(df)
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .option("compression", EventLog.Compression)
      .parquet(tmpDir)
    val conf = spark.sessionState.newHadoopConf()
    val tmp = new org.apache.hadoop.fs.Path(tmpDir)
    val fs = tmp.getFileSystem(conf)
    fs.listStatus(tmp).filter(_.isDirectory).foreach { bdir =>
      val dest = new org.apache.hadoop.fs.Path(eventsPath, bdir.getPath.getName)
      fs.mkdirs(dest)
      fs.listStatus(bdir.getPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          fs.rename(f.getPath, new org.apache.hadoop.fs.Path(dest, s"$token-${f.getPath.getName}")): Unit
        }
    }
    fs.delete(tmp, true)
    graft.sources.GraftMeta.write(spark, eventsPath, numBuckets)
  }

  /** Copy-on-write rewrite of one bucket. Lock mode overwrites the partition
    * directory (proven, but unsafe against concurrent appends — which lock
    * mode serializes anyway). Manifest mode rewrites at FILE granularity
    * behind a rewrite claim, so appends moving new files into the same
    * bucket concurrently are never lost. Snapshot-table rewrites always use
    * the directory form: snapshots are a rebuildable cache, and a racing
    * saveSnapshot losing is benign (rehydration falls back to events).
    */
  private def rewriteBucket(tablePath: String, schema: org.apache.spark.sql.types.StructType,
      bucket: Int)(f: DataFrame => DataFrame): Unit =
    if (commitMode == CommitMode.Manifest)
      rewriteBucketManifest(tablePath, schema, bucket)(f)
    else rewriteBucketOverwrite(tablePath, schema, bucket)(f)

  /** Manifest-mode file-level rewrite (the second half of README roadmap #1):
    *  1. list the bucket's current files and claim a `rewrite` slot naming
    *     them — concurrent appends keep committing; their files aren't in
    *     the replaced set and survive untouched;
    *  2. write the transformed rows under the claim token (hidden from
    *     committed readers while the claim is pending);
    *  3. `markDone` — the single atomic create that flips visibility: new
    *     files in, replaced files out;
    *  4. physically delete the replaced files (lazy GC; reads are correct
    *     even if this never runs).
    * A crash at any point leaves exactly one version visible.
    */
  private def rewriteBucketManifest(tablePath: String,
      schema: org.apache.spark.sql.types.StructType, bucket: Int,
      layout: CompactionLayout = CompactionLayout.IdSort)
      (f: DataFrame => DataFrame): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val bdir = new org.apache.hadoop.fs.Path(s"$tablePath/bucket=$bucket")
    val hfs = bdir.getFileSystem(conf)
    if (!hfs.exists(bdir)) return
    // rewrite only LIVE files: skip files a previous (not-yet-GCed) rewrite
    // already replaced — copying them back in would resurrect stale rows —
    // and skip pending claims' files, which are not yet committed. The
    // input list is recomputed on EVERY claim attempt against the freshly
    // refreshed chain, and files a PENDING rewrite lists as replaced are
    // off-limits too: a rival compactor mid-flight (possible after a stale
    // lock break) must not have its inputs re-read — if it completes, they
    // are hidden; if it is condemned, a later pass picks them up. Without
    // both rules a lost race re-reads files the winner just replaced and
    // commits their rows a second time.
    var claimed: Option[CommitClaim] = None
    var attempts = 0
    var inputs: Seq[String] = Seq.empty
    while (claimed.isEmpty && attempts < 100) {
      val tip = manifest.refresh()
      val chain = manifest.cachedClaims()
      val staleNames = manifest.replacedRelnames()
      val pendingRewrites = chain.filterNot(_.done)
      val pendingTokens = pendingRewrites.map(c => s"c${c.n}-")
      val pendingReplaced = pendingRewrites
        .filter(_.kind == CommitClaim.KindRewrite)
        .flatMap(_.replaced).map(ManifestCommitLog.relname).toSet
      inputs = hfs.listStatus(bdir)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .filterNot { f =>
          val rel = ManifestCommitLog.relname(f.getPath.toString)
          staleNames.contains(rel) || pendingReplaced.contains(rel) ||
            pendingTokens.exists(f.getPath.getName.startsWith)
        }
        .map(_.getPath.toString).toSeq.sorted
      if (inputs.isEmpty) return
      val c = CommitClaim(tip + 1, Map.empty, Seq.empty, writerId,
        System.currentTimeMillis(), done = false, CommitClaim.KindRewrite, inputs)
      if (manifest.tryClaim(c)) claimed = Some(c) else attempts += 1
    }
    val claim = claimed.getOrElse(
      throw new IllegalStateException(s"bucket $bucket rewrite lost $attempts claim races"))
    val cur = spark.read.schema(schema).parquet(inputs: _*)
    val out = f(cur).checkpointOwned() // materialize before any deletes
    if (!out.isEmpty) {
      val tmpDir = s"$tablePath/.commit-tmp/c${claim.n}"
      val arranged = layout match {
        case CompactionLayout.IdSort => out.sortWithinPartitions("id")
        case CompactionLayout.ZOrder(dims, bits, files) =>
          graft.ops.Layout.zorderRepartition(out, dims, files, bits)
      }
      arranged
        .write.mode(SaveMode.Overwrite)
        .option("compression", EventLog.Compression).parquet(tmpDir)
      val tmp = new org.apache.hadoop.fs.Path(tmpDir)
      hfs.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet")).foreach { fi =>
        hfs.rename(fi.getPath,
          new org.apache.hadoop.fs.Path(bdir, s"c${claim.n}-${fi.getPath.getName}")): Unit
      }
      hfs.delete(tmp, true)
    }
    manifest.markDone(claim.n) // atomic visibility switch; GC is separate
    Checkpoints.release(out) // rewrite landed; drop the materialized blocks
  }

  /** Multi-bucket manifest rewrite under ONE claim: the same live-file
    * input rules, staged token write and atomic done-flip as
    * [[rewriteBucketManifest]], but one claim / one read / one partitioned
    * write covers the whole bucket set (r16 opt). A full-log compact was
    * previously numBuckets independent claims — numBuckets read-rewrite-
    * commit cycles (3+ jobs each) where one suffices; per-bucket cadence
    * remains available to maintenance schedulers by passing single-bucket
    * sets (the rival-compactor no-op semantics of the single-bucket form
    * are preserved there). The bucket column is re-derived from
    * `aggregate_id` (both tables bucket by its FNV hash), so rows land
    * back in their own directories.
    *
    * OPERATIONAL TRADE-OFF (crash-recovery blast radius): batching widens
    * what one pending claim quarantines. A compactor that dies after
    * `tryClaim` leaves a single claim whose `replaced` set spans EVERY
    * batched bucket's live files; later rewrite passes exclude
    * pendingReplaced inputs, so compaction and retention rewrites stall
    * across the whole batch until the claim is condemned (prune's
    * stale-claim path), where the per-bucket form bounded the stall to one
    * bucket. Readers are never affected (pending claims keep originals
    * visible), and a full-log compact is an operator-scheduled maintenance
    * action, so the wider-but-condemnable window is the deliberate price
    * of the 1-claim batch; schedulers that want a bounded radius pass
    * bucket subsets (any partition of the bucket set composes — each call
    * claims only its slice).
    */
  private def rewriteBucketsManifest(tablePath: String,
      schema: org.apache.spark.sql.types.StructType, buckets: Seq[Int],
      layout: CompactionLayout = CompactionLayout.IdSort)
      (f: DataFrame => DataFrame): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val hfs = new org.apache.hadoop.fs.Path(tablePath).getFileSystem(conf)
    var claimed: Option[CommitClaim] = None
    var attempts = 0
    var inputs: Seq[String] = Seq.empty
    while (claimed.isEmpty && attempts < 100) {
      val tip = manifest.refresh()
      val chain = manifest.cachedClaims()
      val staleNames = manifest.replacedRelnames()
      val pendingRewrites = chain.filterNot(_.done)
      val pendingTokens = pendingRewrites.map(c => s"c${c.n}-")
      val pendingReplaced = pendingRewrites
        .filter(_.kind == CommitClaim.KindRewrite)
        .flatMap(_.replaced).map(ManifestCommitLog.relname).toSet
      inputs = buckets.flatMap { b =>
        val bdir = new org.apache.hadoop.fs.Path(s"$tablePath/bucket=$b")
        if (!hfs.exists(bdir)) Seq.empty
        else hfs.listStatus(bdir)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .filterNot { fi =>
            val rel = ManifestCommitLog.relname(fi.getPath.toString)
            staleNames.contains(rel) || pendingReplaced.contains(rel) ||
              pendingTokens.exists(fi.getPath.getName.startsWith)
          }
          .map(_.getPath.toString)
      }.sorted
      if (inputs.isEmpty) return
      val c = CommitClaim(tip + 1, Map.empty, Seq.empty, writerId,
        System.currentTimeMillis(), done = false, CommitClaim.KindRewrite, inputs)
      if (manifest.tryClaim(c)) claimed = Some(c) else attempts += 1
    }
    val claim = claimed.getOrElse(throw new IllegalStateException(
      s"buckets ${buckets.mkString(",")} rewrite lost $attempts claim races"))
    val cur = spark.read.schema(schema).parquet(inputs: _*)
    val out = f(cur)
      .withColumn("bucket",
        pmod(graft.functions.fnv1a32(col("aggregate_id")), lit(numBuckets)))
      .checkpointOwned() // materialize before any deletes
    if (!out.isEmpty) {
      val tmpDir = s"$tablePath/.commit-tmp/c${claim.n}"
      val arranged = layout match {
        case CompactionLayout.IdSort =>
          out.repartition(numBuckets, col("bucket"))
            .sortWithinPartitions(col("bucket"), col("id"))
        case CompactionLayout.ZOrder(dims, bits, files) =>
          out.withColumn("__zkey", graft.ops.Layout.zorderKey(dims, bits))
            .repartitionByRange(numBuckets * files, col("bucket"), col("__zkey"))
            .sortWithinPartitions(col("bucket"), col("__zkey"))
            .drop("__zkey")
      }
      arranged
        .write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .option("compression", EventLog.Compression).parquet(tmpDir)
      val tmp = new org.apache.hadoop.fs.Path(tmpDir)
      hfs.listStatus(tmp)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
        .foreach { bdirS =>
          val dest = new org.apache.hadoop.fs.Path(
            s"$tablePath/${bdirS.getPath.getName}")
          hfs.mkdirs(dest)
          hfs.listStatus(bdirS.getPath)
            .filter(_.getPath.getName.endsWith(".parquet"))
            .foreach { fi =>
              hfs.rename(fi.getPath, new org.apache.hadoop.fs.Path(dest,
                s"c${claim.n}-${fi.getPath.getName}")): Unit
            }
        }
      hfs.delete(tmp, true)
    }
    manifest.markDone(claim.n) // atomic visibility switch; GC is separate
    Checkpoints.release(out) // rewrite landed; drop the materialized blocks
  }

  /** Multi-bucket copy-on-write rewrite in ONE dynamic-partition-overwrite
    * job (Lock mode): reads only the affected bucket directories, applies
    * `f` to the combined logical frame, re-derives the bucket column, and
    * overwrites exactly the touched partitions. Buckets `f` emptied
    * entirely are deleted explicitly (dynamic overwrite never touches a
    * partition absent from the written data).
    */
  private def rewriteBucketsOverwrite(tablePath: String,
      schema: org.apache.spark.sql.types.StructType, buckets: Seq[Int])
      (f: DataFrame => DataFrame): Unit = if (buckets.nonEmpty) {
    val cur = spark.read.schema(addBucket(schema)).parquet(tablePath)
      .filter(col("bucket").isin(buckets: _*))
      .drop("bucket")
    val out = f(cur)
      .withColumn("bucket", pmod(graft.functions.fnv1a32(col("aggregate_id")), lit(numBuckets)))
      .checkpointOwned() // materialize before overwriting the source files
    val writtenBuckets = out.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    val conf = spark.sessionState.newHadoopConf()
    buckets.filterNot(writtenBuckets).foreach { b =>
      val bp = new org.apache.hadoop.fs.Path(s"$tablePath/bucket=$b")
      bp.getFileSystem(conf).delete(bp, true): Unit
    }
    if (writtenBuckets.nonEmpty) {
      out.sortWithinPartitions(col("bucket"), col("id"))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .option("compression", EventLog.Compression)
        .parquet(tablePath)
    }
    Checkpoints.release(out) // rewrite landed; drop the materialized blocks
  }

  /** Directory-overwrite rewrite via dynamic partition overwrite — the only
    * partitions touched on disk are the ones written.
    */
  private def rewriteBucketOverwrite(tablePath: String, schema: org.apache.spark.sql.types.StructType,
      bucket: Int)(f: DataFrame => DataFrame): Unit = {
    val cur = spark.read.schema(addBucket(schema)).parquet(tablePath)
      .filter(col("bucket") === bucket)
      .drop("bucket")
    val out = f(cur).checkpointOwned() // materialize before overwriting the source files
    if (out.isEmpty) {
      // Dynamic partition overwrite never touches partitions absent from the
      // written data, so an emptied bucket must be removed explicitly.
      val bp = new org.apache.hadoop.fs.Path(s"$tablePath/bucket=$bucket")
      bp.getFileSystem(spark.sessionState.newHadoopConf()).delete(bp, true): Unit
    } else {
      out
        .withColumn("bucket", lit(bucket))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(tablePath)
    }
    Checkpoints.release(out) // rewrite landed; drop the materialized blocks
  }

  private def exists(p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(hp) && fs.listStatus(hp).nonEmpty
  }

  private def withLogLock[A](path: String)(f: => A): A =
    EventLog.withLogLock(path, spark.sessionState.newHadoopConf())(f)

  /** Bulk writers serialize through the lock ONLY in Lock mode. In Manifest
    * mode they are claim-fenced like [[append]] — serializing them through a
    * JVM monitor would hide exactly the cross-driver races (rival
    * redeliveries, concurrent imports) the chain must fence, and the chain,
    * not the lock, is the commit section on object stores.
    */
  private def withBulkWriteGuard[A](f: => A): A =
    if (commitMode == CommitMode.Lock) withLogLock(path)(f) else f

  private def addBucket(s: org.apache.spark.sql.types.StructType) =
    s.add("bucket", org.apache.spark.sql.types.IntegerType, nullable = true)

  private def emptyEvents(withBucket: Boolean): DataFrame = {
    val schema = if (withBucket) addBucket(evSchema) else evSchema
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  private def emptySnapshots: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], snSchema)
}

object EventLog {
  /** zstd: best scan-speed/size trade-off for a log that is written once and
    * range-scanned many times (catchup replays at 100 TB are IO-bound).
    */
  val Compression = "zstd"

  /** See [[EventLog.phase]] — read once so the hot path costs one static. */
  private[log] val phaseTiming: Boolean = sys.props.contains("graft.phaseTiming")

  /** TEST-ONLY crash injection: when set, called with each maintenance
    * phase label BEFORE the phase runs — a hook that throws simulates a
    * writer dying at that exact protocol step (the randomized
    * CrashInjectionSpec kills writers at every step of
    * claim→stage→sidecar→done and asserts recovery invariants). One
    * volatile read per phase when unset; never set in production.
    */
  @volatile var crashHook: Option[String => Unit] = None

  /** Commit lock acquisition timeout / staleness horizon. */
  val LockAcquireTimeoutMs = 60000L
  val StaleLockMs = 120000L

  /** The migration fence kind (reference: eventstore.go:17). */
  val KindInvalidated = "Invalidated"
  /** The projection-migration fence kind (reference: eventstore.go:123-131). */
  val KindNoOp = "NoOp"

  private val locks = new ConcurrentHashMap[String, Object]()

  /** The single-writer commit section. Two layers:
    *  - a JVM-level monitor (writers inside one driver serialize cheaply);
    *  - a filesystem lock file created with atomic create-if-absent, so
    *    writers in SEPARATE drivers on shared storage also exclude each
    *    other. The primitive is scheme-aware: `O_CREAT|O_EXCL` via
    *    `File.createNewFile` on local paths (Hadoop's local
    *    ChecksumFileSystem `create(overwrite=false)` is exists-then-create,
    *    NOT atomic), `FileSystem.create(overwrite=false)` elsewhere (atomic
    *    on HDFS). Stale locks (holder died) are broken after
    *    [[StaleLockMs]]. On object stores without atomic create, use
    *    manifest mode — the claim chain IS the commit section there.
    */
  private[log] def withLogLock[A](path: String,
      conf: org.apache.hadoop.conf.Configuration)(f: => A): A = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    // qualify so two EventLog instances addressing the same directory
    // through different spellings share one commit section
    val qualified = fs.makeQualified(root)
    val lock = locks.computeIfAbsent(qualified.toString, _ => new Object)
    lock.synchronized {
      val lockFile = new org.apache.hadoop.fs.Path(qualified, ".graft.commit.lock")
      fs.mkdirs(qualified)
      val deadline = System.currentTimeMillis() + LockAcquireTimeoutMs
      def tryCreate(): Boolean =
        if (fs.getScheme == "file")
          try new java.io.File(lockFile.toUri.getPath).createNewFile()
          catch { case _: java.io.IOException => false }
        else
          try { fs.create(lockFile, false).close(); true }
          catch { case _: java.io.IOException => false }
      var acquired = false
      while (!acquired) {
        acquired = tryCreate()
        if (!acquired) {
          val age =
            try System.currentTimeMillis() - fs.getFileStatus(lockFile).getModificationTime
            catch { case _: java.io.IOException => Long.MinValue } // gone — retry now
          if (age > StaleLockMs) {
            // Break a stale lock (holder died mid-commit) via exclusive TAKE
            // (rename to a tombstone), never a blind delete: with two
            // waiters, a blind second delete can remove the first waiter's
            // freshly-acquired lock and let both inside the section. Only
            // the rename winner owns the break; it re-checks that what it
            // took really was stale (a fresh lock created in the
            // stat→rename instant is handed back).
            val tomb = new org.apache.hadoop.fs.Path(qualified,
              s".graft.commit.lock.stale.${java.util.UUID.randomUUID()}")
            val took = try fs.rename(lockFile, tomb)
              catch { case _: java.io.IOException => false }
            if (took) {
              val fresh =
                try System.currentTimeMillis() -
                  fs.getFileStatus(tomb).getModificationTime <= StaleLockMs
                catch { case _: java.io.IOException => false }
              if (!fresh) fs.delete(tomb, false): Unit
              else {
                // Took a FRESH lock by mistake (created in the stat→rename
                // instant): hand it back. The rename target may be occupied
                // by another waiter that slipped in — deleting the tomb
                // there would destroy the fresh holder's lock while it is
                // inside its critical section (its exit-delete would then
                // remove the interloper's lock: cascading breakage). Retry
                // until the slot frees; fail LOUDLY if it never does.
                var restored = false
                var linked = false // file://: survives a failed tomb delete
                val restoreDeadline = System.currentTimeMillis() + LockAcquireTimeoutMs
                while (!restored && System.currentTimeMillis() < restoreDeadline) {
                  restored =
                    if (fs.getScheme == "file") {
                      // RawLocalFileSystem.rename is POSIX rename(2), which
                      // REPLACES an existing target — a plain rename-back
                      // would clobber an interloper's lock. link(2) is the
                      // atomic create-if-absent: link the tomb back in only
                      // when the slot is free, then drop the tomb name (same
                      // inode — the holder's lock survives under its path).
                      // `linked` remembers a link that succeeded so a failed
                      // tomb delete retries ONLY the delete — re-linking
                      // would hit our own lock file forever.
                      try {
                        if (!linked) {
                          java.nio.file.Files.createLink(
                            java.nio.file.Paths.get(lockFile.toUri.getPath),
                            java.nio.file.Paths.get(tomb.toUri.getPath))
                          linked = true
                        }
                        java.nio.file.Files.deleteIfExists(
                          java.nio.file.Paths.get(tomb.toUri.getPath)): Unit
                        true
                      } catch { case _: java.io.IOException => false }
                    } else
                      // HDFS rename fails when the destination exists
                      try fs.rename(tomb, lockFile)
                      catch { case _: java.io.IOException => false }
                  if (!restored) Thread.sleep(20)
                }
                if (!restored) {
                  if (linked)
                    // the link DID restore the holder's lock — the tomb is
                    // just a redundant hard-link name for the same inode
                    // that kept resisting deletion. Not a lock-safety
                    // problem: nothing ever treats a `.stale.*` tombstone
                    // as a lock. Leave it for a later sweep, don't tell an
                    // operator to "restore" it over a live lock.
                    System.err.println(
                      s"[graft] stale-break: lock $lockFile handed back via " +
                        s"link, but the tombstone $tomb could not be deleted " +
                        "— harmless leftover, safe to delete manually")
                  else throw new IllegalStateException(
                    s"stale-break race: could not hand back fresh lock $lockFile; " +
                      s"holder's lock is at $tomb — manual cleanup required")
                }
              }
            }
          } else if (System.currentTimeMillis() > deadline) {
            throw new IllegalStateException(
              s"could not acquire commit lock $lockFile within ${LockAcquireTimeoutMs} ms")
          } else Thread.sleep(20)
        }
      }
      try f finally { fs.delete(lockFile, false): Unit }
    }
  }
}
