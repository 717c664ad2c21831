package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-timing probe for the m5/m6/m7 log-machinery roundtrips (bench's
  * slowest queries): where do the seconds go between bulkImport, the
  * migrate/fence pass and the final active-view read? Not part of the
  * driver contract.
  */
object ProbeM6 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.bulkClaim.inlineMax") = "8"
    sys.props("graft.phaseTiming") = "1"

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def batch(): DataFrame = {
      val ev = spark.read.parquet(s"$sf/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
      ev.select(
        concat(lit("u"), col("user_id")).as("aggregate_id"),
        lit("User").as("aggregate_kind"),
        col("event_type").as("kind"),
        col("props").as("body"),
        col("event_id").as("seq"),
        unix_millis(col("ts")).as("tms"))
    }
    def tmpDir(): String = {
      val d = java.nio.file.Files.createTempDirectory("probem6").toFile
      d.deleteOnExit(); d.getAbsolutePath
    }

    time("warmup scan")(batch().write.format("noop").mode("overwrite").save())

    (1 to 2).foreach { round =>
      println(s"── round $round ──")
      val log = time("new EventLog")(new graft.log.EventLog(spark, tmpDir(),
        numBuckets = 8, ulidSeed = Some(66L),
        commitMode = graft.log.CommitMode.Manifest))
      time("bulkImport")(log.bulkImport(batch(), seqCol = "seq", timeCol = Some("tms")))
      time("migrateDistributed")(
        log.migrateDistributed(1, Set("purchase"), evs => Some(evs.map(e =>
          if (e.kind == "purchase") graft.log.EventDetail("purchase_v2", e.body)
          else graft.log.EventDetail(e.kind, e.body))), dense = true).count(): Unit)
      time("activeEvents read")(
        log.activeEvents.select(col("aggregate_id"), col("aggregate_version"),
          col("kind"), col("body"))
          .write.format("noop").mode("overwrite").save())
      val log2 = new graft.log.EventLog(spark, tmpDir(), numBuckets = 8,
        ulidSeed = Some(67L), commitMode = graft.log.CommitMode.Manifest)
      time("bulkImport (m7 twin)")(log2.bulkImport(batch(), seqCol = "seq",
        timeCol = Some("tms")))
      time("appendNoOpFences")(log2.appendNoOpFences("User"): Unit)
      time("activeEvents read (m7)")(
        log2.activeEvents.select(col("aggregate_id"), col("aggregate_version"),
          col("kind"))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
