package graft.replay

import graft.log.EventLog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F1: the composite pushdown filter (reference: store/store.go:75-139).
  * Semantics preserved exactly:
  *  - `aggregateKinds`: OR list;
  *  - `discriminator`: AND across keys, OR within a key's values
  *    (store/store.go:77-78);
  *  - `splits`/`splitIds`: 0-based hash-split selector
  *    `MOD(aggregate_id_hash, splits) IN splitIds`
  *    (store/postgresql/store.go:536-548);
  *  - `custom`: arbitrary extra predicate (player custom filter, F4).
  * Compiles to one `Column` conjunction so Catalyst pushes everything to the
  * Parquet scan.
  */
case class EventFilter(
    aggregateKinds: Seq[String] = Nil,
    discriminator: Map[String, Seq[String]] = Map.empty,
    splits: Int = 1,
    splitIds: Seq[Int] = Nil,
    custom: Option[Column] = None) {

  def toColumn: Column = {
    val kindsC =
      if (aggregateKinds.isEmpty) lit(true)
      else col("aggregate_kind").isin(aggregateKinds: _*)
    val discC = discriminator.foldLeft(lit(true)) { case (acc, (k, vs)) =>
      acc && col("discriminator").getItem(k).isin(vs: _*)
    }
    val splitC =
      if (splits <= 1 || splitIds.isEmpty) lit(true)
      else pmod(col("aggregate_id_hash"), lit(splits)).isin(splitIds.map(Integer.valueOf): _*)
    kindsC && discC && splitC && custom.getOrElse(lit(true))
  }
}

/** Catchup replay over the log: the bounded `(after, until]` scan with the
  * composite filter (reference: projection/player.go:101-201). In batch mode
  * the reference's 1000-row keyset pagination loop is unnecessary — Spark
  * streams the scan through the pipeline; ordering within a stream is by
  * `id`, global ordering only where the caller asks for it.
  */
class Player(log: EventLog) {

  /** All active events in `(afterId, untilId]` matching the filter. */
  def replay(afterId: String, untilId: String,
      filter: EventFilter = EventFilter()): DataFrame =
    log.range(afterId, untilId).filter(filter.toColumn)

  /** Replay folded forward to the caller in global id order — only for
    * consumers that genuinely need the total order (the reference's player
    * handler contract); distributed consumers should keep the natural
    * per-partition order instead.
    */
  def replayOrdered(afterId: String, untilId: String,
      filter: EventFilter = EventFilter()): DataFrame =
    replay(afterId, untilId, filter).orderBy(col("id"))
}
