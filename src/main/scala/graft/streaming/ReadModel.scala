package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A durable projection read model over parquet: latest-row-per-key upsert
  * semantics (the reference's `UPDATE read_model SET …` inside the
  * projection handler, test/integration/projection_mock.go:62-106).
  *
  * Writes are append-only versioned rows (ULID-stamped); reads resolve the
  * latest version per key — the same latest-wins pattern as the checkpoint
  * store, so a projection handler inside `foreachBatch` stays idempotent
  * under micro-batch redelivery: re-appending the same batch changes no
  * resolved row. `compact()` rewrites to one row per key. On a table-format
  * deployment the append+resolve pair becomes a MERGE in the same commit as
  * the checkpoint save.
  */
class ReadModel(spark: SparkSession, path: String, keyCol: String) {

  private val gen = new graft.core.Ulid.Generator()

  // Hadoop-FS existence check so read models work off local disk (HDFS/S3) —
  // same pattern as EventLog's side IO; a bare java.io.File would silently
  // report "no data" for any non-local scheme.
  private def hasData: Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(hp) && fs.listStatus(hp).nonEmpty
  }

  /** Upsert a batch: every row in `batch` becomes the key's new state.
    *
    * `version` picks the concurrency contract:
    *  - `Some(v)` (a foreachBatch batchId, or the batch's max event
    *    position — anything monotone in stream order): the stamp is minted
    *    DETERMINISTICALLY from `v`, which makes merges exactly-once-
    *    equivalent under concurrent projector instances of one name —
    *    a redelivered batch re-appends content-identical rows (latest-wins
    *    resolves the same state), and a STALE instance replaying an older
    *    batch can never promote old state over new (stamps sort by `v`,
    *    not by arrival). This is the checkpoint store's order-neutrality
    *    applied to the model itself.
    *  - `None`: wall-clock ULID stamp; last writer wins by arrival. Scope:
    *    a single owning projector (the reference's projection ownership,
    *    worker/balance_workers.go) — two unversioned writers interleaving
    *    can reorder states.
    * One mode per read model: deterministic stamps share the ULID string
    * ordering, but mixing modes makes "latest" depend on wall clock again.
    */
  def merge(batch: DataFrame, version: Option[Long] = None): Unit = {
    require(batch.columns.contains(keyCol), s"batch must carry key column $keyCol")
    val stamp = version match {
      case Some(v) => graft.core.Ulid.timeOnly(v)
      case None => gen.next()
    }
    batch
      .withColumn("__rm_version", concat(lit(stamp), lit("-"), monotonically_increasing_id()))
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Current state: the latest row per key. */
  def current(): DataFrame = {
    if (!hasData)
      throw new IllegalStateException(s"read model at $path has no data yet")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__rm_version").desc)
    spark.read.parquet(path)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__rm_version")
  }

  /** Drop superseded versions (same maintenance story as the log).
    *
    * Object-store-safe two-phase shape, mirroring the log's
    * compact-then-[[graft.log.EventLog.gcReplaced]]: the latest row per key
    * is RE-APPENDED keeping its ORIGINAL `__rm_version` stamp — a
    * concurrent reader that listed the directory before the append still
    * resolves every key from the old files; one that lists after sees both
    * copies, which are content-identical under latest-wins. Preserving the
    * stamp makes compaction order-NEUTRAL: it can never promote a stale
    * snapshot over a `merge` a rival writer landed after the snapshot was
    * listed (a fresh stamp would sort the stale copy on top and silently
    * roll the key back). Superseded files are only deleted once older than
    * `gcRetentionMs` (in-flight readers have drained by then); younger
    * leftovers are swept by the next compact. An in-place Overwrite would
    * instead open a read-after-delete window on any store where directory
    * replacement is not atomic (S3/HDFS).
    *
    * Writer scope: single owner (the owning projector, between its own
    * batches — the reference's projection owns its read model the same
    * way); stamp preservation de-fangs the races a violated scope used to
    * open.
    */
  def compact(gcRetentionMs: Long = 10 * 60 * 1000L): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hp)) return
    val snapshot = fs.listStatus(hp)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (snapshot.isEmpty) return
    val latest = {
      val w = Window.partitionBy(col(keyCol)).orderBy(col("__rm_version").desc)
      spark.read.parquet(snapshot.map(_.getPath.toString).toIndexedSeq: _*)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
        .localCheckpoint()
    }
    latest.write.mode(SaveMode.Append).parquet(path)
    val horizon = System.currentTimeMillis() - gcRetentionMs
    snapshot.filter(_.getModificationTime < horizon)
      .foreach(s => fs.delete(s.getPath, false): Unit)
  }
}
