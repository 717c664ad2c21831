package graft.streaming

import graft.core.{EventSchema, Ulid}
import graft.log.EventLog
import graft.replay.{EventFilter, Player}
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** A projection message: the reference's `projection.Message` envelope —
  * `Meta{name, kind, partition, sequence}` + the event
  * (projection/types.go:165-183), flattened to one row.
  * `meta_kind` ∈ catchup | switch | live; the switch row carries the catchup
  * watermark in `id` and a zero aggregate id (projection/projection.go:220-232).
  */
case class ProjMessage(
    meta_kind: String,
    partition: Int,
    sequence: Long,
    id: String,
    aggregate_id: String,
    aggregate_kind: String,
    kind: String,
    body: String,
    created_at: Timestamp)

private case class DedupState(lastId: String, lastSeq: Long)

/** The projection runtime: catchup → switch → live, with the reference's
  * exactly-once dedup semantics (T1-T6, projection/projection.go +
  * projection/checkpoints.go) restated on Spark:
  *
  *  - **catchup** = ONE bounded batch replay of `(resume, until]` where
  *    `until = now − startOffset` (default 1 min, the overlap window). The
  *    reference's K parallel split workers collapse into Spark tasks — the
  *    `partition` column (`calc_partition(fnv1a32_hash, n)`) is preserved so
  *    checkpoints stay per-partition and bit-compatible.
  *  - **switch** = checkpoint rows `{done, until}` for every partition plus a
  *    control message to the handler.
  *  - **live** = Structured Streaming over the log's file source (new parquet
  *    files appear as the log appends; a broker source mounts behind the same
  *    shape). Late/duplicate rejection (T4): a per-partition
  *    `flatMapGroupsWithState` keeps the last seen id, seeded from the saved
  *    checkpoints — reject `id <= checkpoint.id`, exactly
  *    projection/checkpoints.go:58-92.
  *  - the handler runs inside `foreachBatch` together with the checkpoint
  *    save — the reference's handle+checkpoint-in-one-transaction (T5);
  *    with a transactional table format both writes share one commit.
  */
class Projector(
    val log: EventLog,
    val name: String,
    val statePath: String,
    filter: EventFilter = EventFilter(),
    // one dedup partition per log bucket by default: live dedup state groups
    // by partition, so the old default of 1 funneled every event through a
    // single flatMapGroupsWithState task — correct, but a throughput ceiling
    // the reference's K split workers never had (projection/projection.go)
    partitions: Int = -1,
    untilOffsetMs: Long = 60000L) {

  /** Effective dedup/checkpoint parallelism (−1 = follow the log's buckets). */
  val numPartitions: Int = if (partitions > 0) partitions else log.numBuckets

  val spark: SparkSession = log.spark
  val checkpoints = new CheckpointStore(spark, s"$statePath/checkpoints")
  import spark.implicits._

  private def shaped(df: DataFrame, metaKind: String): Dataset[ProjMessage] =
    df.select(
      lit(metaKind).as("meta_kind"),
      graft.functions.calc_partition(col("aggregate_id_hash"), numPartitions).as("partition"),
      lit(0L).as("sequence"),
      col("id"), col("aggregate_id"), col("aggregate_kind"), col("kind"),
      col("body"), col("created_at"))
      .as[ProjMessage]

  /** Saved checkpoints are keyed by partition — reopening a projector with
    * a DIFFERENT partition count would silently remap every stream to a
    * different dedup state (fresh partitions start empty → historical
    * re-delivery). The count is recorded as a metadata row at partition 0
    * (`calc_partition` is 1-based, so 0 never collides) and enforced here;
    * pre-metadata checkpoint tables skip the check.
    */
  private def loadChecked(): Map[Int, Checkpoint] = {
    val all = checkpoints.load(name)
    all.get(0).foreach { m =>
      require(m.sequence == numPartitions.toLong,
        s"projector '$name' was checkpointed with ${m.sequence} partitions; " +
          s"this instance uses $numPartitions — construct it with partitions = ${m.sequence}")
    }
    all - 0
  }

  /** T1+T2: catchup replay then switch. Returns the switch watermark ULID. */
  def catchup(handle: Dataset[ProjMessage] => Unit,
      nowMs: Long = System.currentTimeMillis()): String = {
    val cps = loadChecked()
    val after = {
      val resumed = cps.values.filterNot(_.done)
      if (cps.isEmpty) ""
      else if (resumed.nonEmpty) resumed.map(_.event_id).min
      else cps.values.map(_.event_id).min
    }
    val until = Ulid.timeMax(nowMs - untilOffsetMs)
    val batch = shaped(new Player(log).replay(after, until, filter), "catchup")
    handle(batch)
    // switch: pin the dedup watermark for every partition (tokens done@until)
    // plus the partition-count metadata row
    checkpoints.save(Checkpoint(name, 0, "", numPartitions.toLong, done = true) +:
      (1 to numPartitions).map(p => Checkpoint(name, p, until, 0L, done = true)))
    val switchMsg = Seq(ProjMessage("switch", 0, 0L, until, "", "", "", "",
      new Timestamp(nowMs))).toDS()
    handle(switchMsg)
    until
  }

  /** T3+T4: live stream with per-partition monotonic dedup. The handler and
    * the checkpoint save share each micro-batch (T5). `trigger` reproduces
    * the reference's poller cadence when set (S13: 200 ms default there);
    * None = as-fast-as-possible micro-batches.
    */
  def live(handle: Dataset[ProjMessage] => Unit,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): StreamingQuery = {
    val initial: Map[Int, (String, Long)] =
      loadChecked().map { case (p, c) => p -> (c.event_id, c.sequence) }

    val src = spark.readStream
      .schema(EventSchema.events)
      .parquet(s"${log.path}/events/bucket=*")
      .filter(col("migration") === 0 && filter.toColumn)

    val deduped = shaped(src, "live")
      .groupByKey(_.partition)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (part: Int, it: Iterator[ProjMessage], state: GroupState[DedupState]) =>
          val init = state.getOption
            .orElse(initial.get(part).map { case (id, seq) => DedupState(id, seq) })
            .getOrElse(DedupState("", 0L))
          var last = init.lastId
          var seq = init.lastSeq
          // micro-batches are small slices; sort by id for in-order handling.
          // Survivors get the per-partition monotonic bus sequence the
          // reference's live consumers carry (projection/checkpoints.go:58-92
          // rejects on BOTH id ≤ checkpoint.id and seq ≤ checkpoint.seq);
          // sequence continuity is restored from the checkpoint on restart.
          val out = it.toSeq.sortBy(_.id).flatMap { m =>
            if (m.id > last) { last = m.id; seq += 1; Some(m.copy(sequence = seq)) }
            else None
          }
          state.update(DedupState(last, seq))
          out.iterator
      }

    val cpStore = checkpoints
    val projName = name
    val writer0 = deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$statePath/stream_checkpoint")
    val writer = trigger.fold(writer0)(writer0.trigger)
    writer
      .foreachBatch { (batch: Dataset[ProjMessage], _: Long) =>
        val b = batch.persist()
        try {
          handle(b)
          val tokens = b.groupBy(col("partition"))
            .agg(max(col("id")).as("event_id"), max(col("sequence")).as("sequence"))
            .collect()
            .map(r => Checkpoint(projName, r.getInt(0), r.getString(1), r.getLong(2), done = true))
          cpStore.save(tokens.toSeq)
        } finally { b.unpersist(); () }
      }
      .start()
  }
}
