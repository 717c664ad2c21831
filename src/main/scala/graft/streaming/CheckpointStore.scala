package graft.streaming

import graft.Checkpoints.Ownable
import graft.core.Ulid
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-(projection, partition) resume/dedup token — the reference's KV
  * checkpoint rows (projection/checkpoints.go, projection/types.go:129-153):
  * `eventId` is the catchup/dedup watermark, `sequence` the live bus
  * sequence, `done` marks a finished catchup split.
  */
case class Checkpoint(
    projection: String,
    partition: Int,
    event_id: String,
    sequence: Long,
    done: Boolean)

/** Tiny append-only parquet KV: the latest row per key wins (ULID-stamped).
  * This is deliberately a *table*, not an opaque offset file, for API parity
  * with the reference's resume tokens — Spark's own streaming checkpoints
  * still handle source offsets; this table carries the projection-level
  * dedup watermarks that must survive engine switches.
  */
class CheckpointStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private val gen = new Ulid.Generator()

  // Hadoop-FS existence check (works on HDFS/S3, not just local disk).
  private def hasData: Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(hp) && fs.listStatus(hp).nonEmpty
  }

  def save(cps: Seq[Checkpoint]): Unit = {
    if (cps.isEmpty) return
    cps.map(c => (c.projection, c.partition, c.event_id, c.sequence, c.done, gen.next()))
      .toDF("projection", "partition", "event_id", "sequence", "done", "saved_at")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Drop superseded token rows (the table is append-only; only the latest
    * row per (projection, partition) is ever read). Same two-phase shape as
    * [[ReadModel.compact]]: re-append the latest rows, then delete
    * superseded files only past the retention horizon (concurrent loads
    * keep resolving from either listing). The re-appended rows keep their
    * ORIGINAL `saved_at` stamps, which makes compaction order-NEUTRAL: it
    * can never promote a stale snapshot over a row a rival writer (zombie
    * instance racing its failover replacement) saved after the snapshot was
    * listed — a fresh stamp would sort the stale copy on top and regress
    * the dedup watermark into redelivery. Equal-stamp duplicates from a
    * load that lists both copies are content-identical, so latest-wins may
    * pick either. Writer scope: the owning projector, between batches; an
    * in-place Overwrite would race concurrent `load`s on any store without
    * atomic directory replacement.
    */
  def compact(gcRetentionMs: Long = 10 * 60 * 1000L): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hp)) return
    val snapshot = fs.listStatus(hp)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (snapshot.isEmpty) return
    val w = Window.partitionBy(col("projection"), col("partition"))
      .orderBy(col("saved_at").desc)
    val latest = spark.read.parquet(snapshot.map(_.getPath.toString).toIndexedSeq: _*)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .checkpointOwned()
    latest.coalesce(1).write.mode(SaveMode.Append).parquet(path)
    val horizon = System.currentTimeMillis() - gcRetentionMs
    snapshot.filter(_.getModificationTime < horizon)
      .foreach(s => fs.delete(s.getPath, false): Unit)
  }

  def load(projection: String): Map[Int, Checkpoint] = {
    if (!hasData) return Map.empty
    val w = Window.partitionBy(col("partition")).orderBy(col("saved_at").desc)
    spark.read.parquet(path)
      .filter(col("projection") === projection)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .as[(String, Int, String, Long, Boolean, String, Int)]
      .collect()
      .map { case (p, part, id, seq, done, _, _) => part -> Checkpoint(p, part, id, seq, done) }
      .toMap
  }
}
