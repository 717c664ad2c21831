package graft.tools

import graft.log.{CommitClaim, EventLog, ManifestCommitLog}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commit-chain scale smoke: proves the claim chain stays driver-feasible at
  * backfill scale. Builds a chain of ≥10⁴ interactive append claims plus one
  * bulk claim reserving ≥10⁶ streams via the parquet SIDECAR (the mechanism
  * that replaced per-stream claim-TSV lines), then times the operations every
  * writer pays:
  *  - cold `refresh()` — one LIST + one read per claim file;
  *  - `reservedHeads` on an append-batch-sized stream set (driver fold for
  *    inline lines + ONE pruned parquet probe for sidecars);
  *  - the distributed `reservationsDF` new-stream probe bulkImport runs.
  *
  * CHAIN_CLAIMS / CHAIN_SIDECAR_STREAMS env vars scale it up.
  */
object ChainScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nClaims = sys.env.getOrElse("CHAIN_CLAIMS", "10000").toInt
    val nSidecar = sys.env.getOrElse("CHAIN_SIDECAR_STREAMS", "1000000").toInt
    val dir = Files.createTempDirectory("graftchain").toFile.getAbsolutePath

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CHAIN $name%-46s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // ── build: 10⁴ inline claims (2 streams each), claimed for real ──────
    val writerChain = new ManifestCommitLog(spark, dir)
    time(s"create $nClaims inline claims (tryClaim each)") {
      (1 to nClaims).foreach { i =>
        val ok = writerChain.tryClaim(CommitClaim(i.toLong,
          Map(s"st-${i % 5000}-a" -> (i / 5000, i / 5000 + 1),
            s"st-${i % 5000}-b" -> (i / 5000, i / 5000 + 1)),
          Seq.empty, "smoke", System.currentTimeMillis(), done = false))
        require(ok, s"claim $i lost?")
        if (i % 3 == 0) writerChain.markDone(i.toLong)
      }
    }

    // ── one bulk claim reserving nSidecar streams through the sidecar ────
    val sidecar = time(f"write sidecar for $nSidecar%,d reserved streams") {
      val heads = spark.range(nSidecar.toLong)
        .select(concat(lit("bulk-"), col("id")).as("aggregate_id"),
          lit(0).as("base"), lit(1).as("head"))
      writerChain.writeSidecar(heads)
    }
    writerChain.refresh(): Unit
    require(writerChain.tryClaim(CommitClaim(nClaims + 1L, Map.empty, Seq.empty,
      "smoke-bulk", System.currentTimeMillis(), done = false,
      streamsRef = Some(sidecar._1), refCount = sidecar._2,
      refMaxHead = sidecar._3)))
    writerChain.markDone(nClaims + 1L)

    // ── measure what a FRESH writer pays ─────────────────────────────────
    val cold = new ManifestCommitLog(spark, dir)
    val tip = time(s"cold refresh() over ${nClaims + 1} claims")(cold.refresh())
    require(tip == nClaims + 1L, s"tip $tip")

    val batch = (1 to 50).map(i => s"st-${i * 7}-a") ++
      (1 to 50).map(i => s"bulk-${i.toLong * (nSidecar / 60)}")
    val heads1 = time("reservedHeads on a 100-stream append batch")(
      cold.reservedHeads(batch))
    require(heads1.size == 100, s"resolved ${heads1.size}")
    val heads2 = time("reservedHeads again (warm chain, pruned sidecar probe)")(
      cold.reservedHeads(batch))
    require(heads2 == heads1)

    val probed = time(f"distributed new-stream probe vs $nSidecar%,d reservations") {
      val candidates = spark.range(10000)
        .select(concat(lit("new-"), col("id")).as("aggregate_id"))
      cold.reservationsDF().map(r =>
        candidates.join(r.select(col("aggregate_id")), Seq("aggregate_id"), "left_semi")
          .count()).getOrElse(-1L)
    }
    require(probed == 0L, s"probe found $probed phantom clashes")

    val warm = time("warm refresh() (no new claims)")(cold.refresh())
    require(warm == tip)

    // ── a REAL appendBulk past the inline threshold: the whole path — heads
    //    resolved distributed, reservations to a sidecar, claim TSV lineless
    //    (same contract ManifestCommitSpec proves at threshold 3; here at the
    //    production threshold with a backfill-sized batch) ─────────────────
    val nBulk = sys.env.getOrElse("CHAIN_APPENDBULK_STREAMS", "50000").toInt
    val logDir = Files.createTempDirectory("graftchainlog").toFile.getAbsolutePath
    val log = new EventLog(spark, logDir, numBuckets = 32,
      ulidSeed = Some(7L), commitMode = graft.log.CommitMode.Manifest)
    time(f"appendBulk $nBulk%,d streams (sidecar claim, stream set never on driver)") {
      val rows = spark.range(nBulk.toLong)
        .select(concat(lit("ab-"), col("id")).as("aggregate_id"),
          lit("Account").as("aggregate_kind"), lit("Created").as("kind"),
          lit("{}").as("body"), lit(1).as("seq"))
      require(log.appendBulk(rows) == nBulk.toLong, "appendBulk row count")
    }
    val abClaim = log.manifest.claims().last
    require(abClaim.streams.isEmpty && abClaim.streamsRef.isDefined,
      "appendBulk claim above the threshold must be lineless (sidecar ref)")
    require(abClaim.refCount == nBulk.toLong && abClaim.refMaxHead == 1)
    val abHeads = time("reservedHeads probe against the appendBulk sidecar")(
      log.manifest.reservedHeads(Seq("ab-0", s"ab-${nBulk - 1}")))
    require(abHeads == Map("ab-0" -> 1, s"ab-${nBulk - 1}" -> 1), s"$abHeads")

    println(s"""{"chain_claims":${nClaims + 1},"sidecar_streams":$nSidecar,"appendbulk_streams":$nBulk,"ok":true}""")
    spark.stop()
  }
}
