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

  def toColumn: Column = toColumnFor(Set.empty)

  /** `declaredKeys` = the log's materialized discriminator keys
    * ([[graft.log.EventLog.declaredDiscKeys]]). For those, the map predicate
    * (source of truth) gets a parquet-pushable twin on the top-level
    * `disc_<key>` column — `disc_k IN vs OR disc_k IS NULL` — so row-group
    * stats skip non-matching data without decoding the map; the IS NULL leg
    * keeps pre-declaration files (column reads null) correct.
    */
  def toColumnFor(declaredKeys: Set[String]): Column = {
    val kindsC =
      if (aggregateKinds.isEmpty) lit(true)
      else col("aggregate_kind").isin(aggregateKinds: _*)
    val discC = discriminator.foldLeft(lit(true)) { case (acc, (k, vs)) =>
      val mapIn = col("discriminator").getItem(k).isin(vs: _*)
      val kc =
        if (declaredKeys.contains(k)) {
          val dc = col(graft.core.EventSchema.discColName(k))
          mapIn && (dc.isin(vs: _*) || dc.isNull)
        } else mapIn
      acc && kc
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

  /** All active events in `(afterId, untilId]` matching the filter. Declared
    * discriminator keys route through their materialized `disc_<key>`
    * columns so the predicate reaches the parquet scan.
    */
  def replay(afterId: String, untilId: String,
      filter: EventFilter = EventFilter()): DataFrame =
    log.range(afterId, untilId).filter(filter.toColumnFor(log.declaredDiscKeys.toSet))

  /** Replay folded forward to the caller in global id order — only for
    * consumers that genuinely need the total order (the reference's player
    * handler contract); distributed consumers should keep the natural
    * per-partition order instead.
    */
  def replayOrdered(afterId: String, untilId: String,
      filter: EventFilter = EventFilter()): DataFrame =
    replay(afterId, untilId, filter).orderBy(col("id"))
}
