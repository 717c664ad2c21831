package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the m8 compaction roundtrip: inspect claims/files/counts
  * after bulkImport(sidecar) → compact() in manifest mode.
  */
object ProbeM8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    System.setProperty("graft.bulkClaim.inlineMax", "8")
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graftm8probe").toFile.getAbsolutePath
      val log = new graft.log.EventLog(spark, tmp, numBuckets = 8,
        ulidSeed = Some(88L), commitMode = graft.log.CommitMode.Manifest)
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(concat(lit("u"), col("user_id")).as("aggregate_id"),
          lit("User").as("aggregate_kind"),
          col("event_type").as("kind"), col("props").as("body"),
          col("event_id").as("seq"),
          (unix_micros(col("ts").cast("timestamp")) / 1000).cast("long").as("tms"))
      log.bulkImport(ev, seqCol = "seq", timeCol = Some("tms"))
      println(s"after import: active=${log.activeEvents.count()}")
      log.manifest.claims().foreach(c => println(
        s"claim n=${c.n} kind=${c.kind} done=${c.done} refCount=${c.streamsRef} replaced=${c.replaced.size}"))
      log.compact()
      println(s"after compact: active=${log.activeEvents.count()}")
      log.manifest.claims().foreach(c => println(
        s"claim n=${c.n} kind=${c.kind} done=${c.done} replaced=${c.replaced.take(3)}... (${c.replaced.size})"))
      val fs = new java.io.File(s"$tmp/events")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(fs).filter(_.getName.endsWith(".parquet")).take(30)
        .foreach(f => println("  file " + f.getParentFile.getName + "/" + f.getName))
    } finally System.clearProperty("graft.bulkClaim.inlineMax")
    spark.stop()
  }
}
