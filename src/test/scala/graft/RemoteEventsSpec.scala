package graft

import graft.log.EventLog
import graft.remote.RemoteEvents
import java.nio.file.Files
import org.apache.spark.connect.proto
import org.scalatest.funsuite.AnyFunSuite

/** S14 end to end: serve the log over the Spark Connect gRPC endpoint and
  * drive it with a REAL gRPC client (the shaded-in-Spark channel + blocking
  * stub + Arrow-batch row counts) — the reference's remote projection
  * rebuild calls (`GetMaxSeq` / `GetEvents`, projection/grpc_store.go:30-80)
  * expressed as remote SQL.
  */
class RemoteEventsSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("S14: remote gRPC client pages the log and reads the head") {
    val dir = Files.createTempDirectory("graftremote").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(31L))
    val store = new graft.store.EventStore(log, AccountType)
    (1 to 7).foreach { i =>
      store.create(f"01HXREMOTE${i}%016d", Seq(
        AccountType.created(10L * i, s"own$i"), AccountType.deposited(i)))
    }
    val port = 15999
    RemoteEvents.serve(log, port)
    assert(RemoteEvents.started)

    val channel = org.sparkproject.connect.grpc.ManagedChannelBuilder
      .forAddress("localhost", port).usePlaintext().build()
    try {
      val stub = proto.SparkConnectServiceGrpc.newBlockingStub(channel)
      def sqlRows(q: String): Long = {
        val plan = proto.Plan.newBuilder().setRoot(
          proto.Relation.newBuilder().setSql(
            proto.SQL.newBuilder().setQuery(q))).build()
        val req = proto.ExecutePlanRequest.newBuilder()
          .setSessionId(java.util.UUID.randomUUID().toString)
          .setUserContext(proto.UserContext.newBuilder().setUserId("remote-test"))
          .setPlan(plan).build()
        val it = stub.executePlan(req)
        var rows = 0L
        while (it.hasNext) {
          val resp = it.next()
          if (resp.hasArrowBatch) rows += resp.getArrowBatch.getRowCount
        }
        rows
      }
      // GetEvents: an ordered catchup page after a cursor
      assert(sqlRows("SELECT * FROM global_temp.graft_events_active " +
        "WHERE id > '' ORDER BY id LIMIT 5") == 5L)
      // GetMaxSeq: the head of the log
      assert(sqlRows("SELECT max(id) AS max_id FROM global_temp.graft_events_active") == 1L)
      // the full remote surface: all 14 committed events visible
      assert(sqlRows("SELECT id FROM global_temp.graft_events_active") == 14L)
      // liveness: events appended AFTER serve are invisible to the pinned
      // view until the client refreshes it — the documented poll protocol
      store.create("01HXREMOTE0000000000000099", Seq(AccountType.created(1, "x")))
      assert(sqlRows("SELECT id FROM global_temp.graft_events_active") == 14L,
        "view listing is pinned until refresh")
      sqlRows("REFRESH TABLE global_temp.graft_events_active")
      assert(sqlRows("SELECT id FROM global_temp.graft_events_active") == 15L,
        "remote REFRESH makes the append visible")
    } finally {
      channel.shutdownNow()
      RemoteEvents.stop()
    }
  }
}
