package graft.tools

import graft.log.{CommitMode, EventLog}
import graft.streaming.Projector
import java.nio.file.Files
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Projection-runtime scale smoke: throughput and exactly-once density of the
  * catchup → switch → live lifecycle on a multi-million-event log, driving
  * the REAL machinery end-to-end — manifest-mode `bulkImport` history, the
  * bounded catchup replay, then live micro-batches over appendBulk waves
  * through the foreachBatch watermark dedup (the round-7 rework).
  *
  * Exactly-once is asserted structurally: delivered counts match appended
  * counts stage by stage, and the per-partition bus sequences saved in the
  * checkpoint table must sum to the live-delivered total — dense sequences
  * mean no duplicate ever advanced a watermark and no survivor was skipped.
  *
  * PROJ_HISTORY / PROJ_LIVE_WAVES / PROJ_WAVE_EVENTS scale it.
  */
object ProjectorScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nHistory = sys.env.getOrElse("PROJ_HISTORY", "2000000").toInt
    val nWaves = sys.env.getOrElse("PROJ_LIVE_WAVES", "5").toInt
    val nWave = sys.env.getOrElse("PROJ_WAVE_EVENTS", "200000").toInt
    def time[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROJ $name%-46s $s%.2f s"); (r, s)
    }

    val dir = Files.createTempDirectory("graftproj").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 32, ulidSeed = Some(11L),
      commitMode = CommitMode.Manifest)
    val tPast = System.currentTimeMillis() - 3600 * 1000L // history: 1h ago

    def wave(tag: String, n: Int, streams: Int, nowMs: Long): Long =
      log.appendBulk(
        spark.range(n.toLong).select(
          concat(lit(s"p-"), pmod(col("id"), lit(streams))).as("aggregate_id"),
          lit("Doc").as("aggregate_kind"),
          lit(s"E$tag").as("kind"),
          concat(lit("""{"i":"""), col("id"), lit("}")).as("body"),
          (col("id") / streams + 1).cast("int").as("seq")),
        nowMs = nowMs)

    // ── history: 100k streams × (nHistory/100k) events, ULIDs an hour old
    val (_, tIngest) = time(s"ingest $nHistory history events (bulkImport)") {
      require(log.bulkImport(
        spark.range(nHistory.toLong).select(
          concat(lit("p-"), pmod(col("id"), lit(100000))).as("aggregate_id"),
          lit("Doc").as("aggregate_kind"),
          lit("EHist").as("kind"),
          concat(lit("""{"i":"""), col("id"), lit("}")).as("body"),
          (col("id") / 100000 + 1).cast("int").as("seq")),
        nowMs = tPast) == nHistory.toLong)
    }

    // ── catchup: one bounded replay delivers the full history
    val caught = new LongAdder
    val proj = new Projector(log, "pscale", dir)
    val (_, tCatch) = time(s"catchup replay ($nHistory events)") {
      proj.catchup(ds => caught.add(ds.filter(col("meta_kind") === "catchup").count()))
    }
    require(caught.sum == nHistory.toLong,
      s"catchup delivered ${caught.sum}, expected $nHistory")

    // ── live: waves of appends flow through the watermark dedup
    val lived = new LongAdder
    val q = proj.live(ds => lived.add(ds.count()))
    try {
      val (_, tLive) = time(s"live: $nWaves waves x $nWave events") {
        (1 to nWaves).foreach { k =>
          require(wave(s"W$k", nWave, 50000,
            System.currentTimeMillis()) == nWave.toLong)
          q.processAllAvailable()
        }
      }
      val expectedLive = nWaves.toLong * nWave
      require(lived.sum == expectedLive,
        s"live delivered ${lived.sum}, expected $expectedLive — dup or loss")
      // density: per-partition checkpoint sequences must sum to the total —
      // a duplicate or skip anywhere would break the dense 1..k numbering
      val seqSum = proj.checkpoints.load("pscale")
        .filterNot(_._1 == 0).values.map(_.sequence).sum
      require(seqSum == expectedLive,
        s"bus sequences sum to $seqSum, expected $expectedLive")
      println(f"PROJ throughput: ingest ${nHistory / tIngest}%.0f ev/s, " +
        f"catchup ${nHistory / tCatch}%.0f ev/s, live ${expectedLive / tLive}%.0f ev/s")
      println(s"""{"history":$nHistory,"live":$expectedLive,"ok":true}""")
    } finally q.stop()
    spark.stop()
  }
}
