package graft.remote

import graft.log.EventLog
import org.apache.spark.sql.connect.service.SparkConnectService

/** S14: the remote events repository (reference: projection/grpc_server.go:
  * 20-50 — a gRPC service answering `GetMaxSeq` / `GetEvents` so a process
  * without database access can rebuild projections; client twin
  * projection/grpc_store.go:30-80).
  *
  * Spark-native restatement: instead of a bespoke two-RPC protobuf schema,
  * the log is served over Spark Connect — Spark's own gRPC protocol.
  * [[serve]] registers the log's SQL surface (`<prefix>_events`,
  * `<prefix>_events_active`, `<prefix>_snapshots`, plus the engine's SQL
  * functions) on the hosting session and starts the Connect endpoint; ANY
  * Spark Connect client (JVM, Python, Go…) then issues the reference
  * client's calls as plain SQL over gRPC with Arrow transport:
  *
  *   - `GetMaxSeq`                  → `SELECT max(id) FROM graft_events_active`
  *   - `GetEvents(after, limit, f)` → `SELECT * FROM graft_events_active
  *                                     WHERE id > '<after>' … ORDER BY id
  *                                     LIMIT n`
  *
  * and is not limited to those two shapes — the remote side gets the whole
  * query surface (filters push down server-side exactly as local reads do).
  * RemoteEventsSpec drives this end to end through the real gRPC channel.
  */
object RemoteEvents {

  /** Register the log's SQL surface and start the Spark Connect gRPC
    * endpoint on `port`. One endpoint per JVM (the service is a singleton);
    * serving another log re-registers views on the same endpoint.
    *
    * Freshness: a registered view pins its file listing, so appends AFTER
    * `serve` are invisible to it until refreshed — remote clients polling
    * the tail (the GetEvents loop) either issue
    * `REFRESH TABLE global_temp.<prefix>_events_active` before a poll
    * (works over the same gRPC channel; tested in RemoteEventsSpec), or the
    * server passes `refreshIntervalMs > 0` and a daemon re-registers the
    * views on that cadence — the reference server reads live by virtue of
    * querying SQL per call (projection/grpc_server.go:27-36).
    */
  def serve(log: EventLog, port: Int, prefix: String = "graft",
      refreshIntervalMs: Long = 0L): Unit = {
    log.registerViews(prefix)
    // Connect sessions are ISOLATED forks of the hosting session — plain
    // temp views don't cross the boundary. Global temp views do (queried as
    // `global_temp.<prefix>_…`), so remote clients see the same surface.
    def register(): Unit = {
      log.events.createOrReplaceGlobalTempView(s"${prefix}_events")
      log.activeEvents.createOrReplaceGlobalTempView(s"${prefix}_events_active")
      log.snapshots.createOrReplaceGlobalTempView(s"${prefix}_snapshots")
    }
    register()
    org.apache.spark.SparkEnv.get.conf
      .set("spark.connect.grpc.binding.port", port.toString)
    SparkConnectService.start(log.spark.sparkContext)
    serving = true
    if (refreshIntervalMs > 0) {
      val t = new Thread(() => {
        try {
          while (serving) {
            Thread.sleep(refreshIntervalMs)
            if (serving) register()
          }
        } catch { case _: InterruptedException => () }
      }, s"graft-remote-refresh-$prefix")
      t.setDaemon(true)
      t.start()
      refresher = Some(t)
    }
  }

  @volatile private var serving = false
  @volatile private var refresher: Option[Thread] = None

  def started: Boolean = serving

  def stop(): Unit = {
    SparkConnectService.stop(None, None)
    serving = false
    refresher.foreach(_.interrupt())
    refresher = None
  }
}
