package graft.tools

import graft.log.{CommitClaim, EventLog}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance-path scale smoke (round-8): proves manifest-mode MIGRATION and
  * kind-wide FENCING stay driver-flat at backfill scale now that their
  * reservations ride parquet sidecars instead of per-stream claim-TSV lines
  * (the bulkImport mechanism, extended to the last two O(streams) collects).
  *
  * Builds a 10⁶-stream log (one event per stream, bulkImport), then runs the
  * full M2 migrate (invalidation rewrite + fence/copy append under ONE
  * sidecar rewrite claim) through `migrateDistributed` — the per-stream
  * outcome stays a Dataset — and an M4 `appendNoOpFences` pass over the same
  * streams. Asserts the claim TSVs carry ZERO stream lines (flat bytes on
  * disk, the direct driver-memory evidence) and that results are complete.
  *
  * MIG_STREAMS scales it; reference semantics: per-stream fencing of
  * store/postgresql/events_migration.go:90-206 at driver-flat cost.
  */
object MigrateScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("MIG_STREAMS", "1000000").toLong
    val dir = Files.createTempDirectory("graftmigsmoke").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 32, ulidSeed = Some(88L),
      commitMode = graft.log.CommitMode.Manifest)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"MIG $name%-50s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def claimBytes(c: CommitClaim): Long = {
      val p = new org.apache.hadoop.fs.Path(
        s"$dir/${graft.log.ManifestCommitLog.CommitDir}/v${c.n}.tsv")
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .getFileStatus(p).getLen
    }

    time(f"bulkImport $n%,d single-event streams") {
      val batch = spark.range(1L, n + 1L).select(
        format_string("mig%012d", col("id")).as("aggregate_id"),
        lit("Doc").as("aggregate_kind"),
        lit("Created").as("kind"),
        lit("""{"v":1}""").as("body"),
        lit(1).as("seq"))
      require(log.bulkImport(batch, nowMs = 1700000000000L) == n, "import count")
    }

    val migrated = time(f"migrateDistributed over $n%,d streams (sidecar rewrite claim)") {
      log.migrateDistributed(1, Set("Created"), evs => Some(evs.map(e =>
        graft.log.EventDetail("CreatedV2", e.body))), nowMs = 1700000100000L,
        dense = true)
        .count()
    }
    require(migrated == n, s"migrated $migrated of $n")
    val rewrite = log.manifest.claims()
      .filter(_.kind == CommitClaim.KindRewrite).last
    require(rewrite.streams.isEmpty && rewrite.streamsRef.isDefined,
      "migration reservations must ride a sidecar at this scale")
    require(rewrite.refCount == n && rewrite.refMaxHead == 3, "sidecar summary")
    val migClaimB = claimBytes(rewrite)
    println(f"MIG migration claim TSV on disk: $migClaimB%,d bytes (flat in streams)")

    val active = time("active view count (copies only)")(log.activeEvents.count())
    require(active == n, s"active $active")

    val fenced = time(f"appendNoOpFences over $n%,d streams (sidecar claim)") {
      log.appendNoOpFences("Doc", nowMs = 1700000200000L)
    }
    require(fenced == n, s"fenced $fenced")
    val fenceClaim = log.manifest.claims().last
    require(fenceClaim.streams.isEmpty && fenceClaim.streamsRef.isDefined,
      "fence reservations must ride a sidecar at this scale")
    val fenceClaimB = claimBytes(fenceClaim)
    println(f"MIG fence claim TSV on disk: $fenceClaimB%,d bytes (flat in streams)")

    // storage lifecycle completes: GC the replaced pre-migration files and
    // prove reads are unchanged — the migrate→fence→gc cadence a 100 TB log
    // runs on a maintenance schedule
    val gced = time("gcReplaced after the migration rewrite") {
      log.gcReplaced(retentionMs = 0L)
    }
    require(gced > 0, "the migration must have superseded files to GC")
    require(log.activeEvents.count() == 2L * n, // copy + fence per stream
      "reads must be unchanged after GC")

    // a fresh writer's view resolves reservations through the sidecars
    val fresh = new EventLog(spark, dir, numBuckets = 32,
      commitMode = graft.log.CommitMode.Manifest)
    val probeIds = (1 to 100).map(i =>
      f"mig${(i.toLong * math.max(1L, n / 101)).min(n)}%012d").distinct
    val heads = time(s"fresh-writer reservedHeads on a ${probeIds.size}-stream batch") {
      fresh.manifest.refresh()
      fresh.manifest.reservedHeads(probeIds)
    }
    // every probed id must RESOLVE (an empty map would pass a bare forall —
    // the vacuous-success trap) and carry the post-fence head
    require(heads.size == probeIds.size && heads.values.forall(_ == 4),
      s"resolved ${heads.size}/${probeIds.size}, heads ${heads.values.toSet}")

    println(s"""{"streams":$n,"migrated":$migrated,"fenced":$fenced,""" +
      s""""mig_claim_bytes":$migClaimB,"fence_claim_bytes":$fenceClaimB,"ok":true}""")
    spark.stop()
  }
}
