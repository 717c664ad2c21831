package graft

import graft.ops.{Sampling, TextAnalysis}
import graft.streaming.{ReadModel, StreamAggs}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end training-data ingest pipeline: the capstone composition of the
  * streaming layer and the ops layer — documents arrive as a stream, are
  * deduped AT INGEST (watermark-bounded state), quality-filtered, split-
  * assigned, and upserted into a durable read model, which a batch consumer
  * then reads back. Every stage is an operator tested elsewhere; this spec
  * pins the COMPOSITION: exactly-once-per-fingerprint ingest across
  * micro-batches, filters applied before state, and a read model equal to
  * running the same batch pipeline over the raw corpus.
  */
class TrainingPipelineSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("stream -> dedup-at-ingest -> quality filter -> split -> read model == batch pipeline") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftpipe").toFile.getAbsolutePath

    def row(minute: Int, id: Long, text: String) =
      (java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), id, text)
    // batch 1: a good doc, a low-quality (repetitive) doc, and a near-dup
    // pair that exact dedup keeps (differs beyond whitespace/case)
    val good = "the quick brown fox jumps over the lazy dog near the river bank today"
    val repetitive = (1 to 14).map(_ => "spam spam").mkString(" ")
    val b1 = Seq(row(1, 1L, good), row(2, 2L, repetitive), row(3, 3L, good.toUpperCase))
    // batch 2: an exact dup of doc 1 (dropped by ingest dedup) + a fresh doc
    val fresh = "completely different prose about sailing ships and ocean navigation routes"
    val b2 = Seq(row(4, 4L, good), row(5, 5L, fresh))

    b1.toDF("ts", "doc_id", "text").write.parquet(s"$dir/in")

    val rm = new ReadModel(spark, s"$dir/rm", "doc_id")
    val stream = spark.readStream
      .schema("ts timestamp, doc_id long, text string")
      .parquet(s"$dir/in")

    def stages(df: org.apache.spark.sql.DataFrame) = {
      val deduped = StreamAggs.dedupByFingerprint(df, "ts", "text", lateness = "5 minutes")
      Sampling.assignSplit(
        deduped.filter(TextAnalysis.distinctRatio(col("text")) >= 0.5), // quality gate
        "doc_id", salt = "pipe")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
    }

    val q = stages(stream).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) rm.merge(batch.select("doc_id", "text", "split", "n_tokens"))
      }
      .option("checkpointLocation", s"$dir/chk")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      b2.toDF("ts", "doc_id", "text").write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()

    val ingested = rm.current().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // doc 2 failed quality; docs 1 and 3 share a fingerprint (case/space
    // normalize) so exactly ONE survives — which one is the engine's pick;
    // doc 4 re-sent the same content across batches -> dropped by state
    assert(ingested.keySet == Set(1L, 5L) || ingested.keySet == Set(3L, 5L),
      s"got ${ingested.keySet}")

    // the same stages over the raw corpus in BATCH mode agree on survivors
    // (modulo which dup of a fingerprint survives: batch keeps one too)
    val batchRes = stages((b1 ++ b2).toDF("ts", "doc_id", "text"))
      .select("doc_id", "split").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(batchRes.size == 2 && batchRes.contains(5L))
    // split assignment is hash-of-id, so ids present in both agree exactly
    ingested.keySet.intersect(batchRes.keySet)
      .foreach(id => assert(ingested(id) == batchRes(id)))
  }
}
