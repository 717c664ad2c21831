package graft

import graft.log.EventLog
import graft.store.EventStore
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the properties we tuned for (pushdown, pruning,
  * broadcast) asserted against the executed plans so they can't silently
  * rot. These are the local proxies for the 100 TB behaviors.
  */
class PlanShapeSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("range scan pushes id bounds and event-kind filters into the parquet scan") {
    val p = plan("s3_range_scan")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThan(event_id,100)"), p.take(2000))
    assert(p.contains("LessThanOrEqual(event_id,600)"))
    assert(p.contains("In(event_type,"))
  }

  test("scan reads only the projected columns") {
    val p = plan("s3_range_scan")
    assert(p.contains("ReadSchema: struct<event_id:bigint,user_id:bigint,event_type:string,value:double>"))
  }

  test("dimension joins broadcast (no sort-merge join in q5/j2)") {
    Seq("j2_broadcast_join", "q5_local_supplier").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q should broadcast dims")
    }
    // q5 keeps exactly one non-broadcast (shuffle) join: lineitem ⋈ orders
    val q5 = plan("q5_local_supplier")
    assert(!q5.contains("CartesianProduct"))
  }

  test("aggregations are partial before the exchange (map-side combine)") {
    val p = plan("q1_pricing_summary")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) > firstAgg,
      "expected partial + final aggregate pair")
  }

  test("event-log ULID range scan pushes string id bounds to parquet") {
    val tmp = Files.createTempDirectory("graftplan").toFile.getAbsolutePath
    val log = new EventLog(spark, tmp, numBuckets = 2, ulidSeed = Some(5L))
    val store = new EventStore(log, AccountType)
    store.create("01HXPLANSHAPE000000000001", Seq(AccountType.created(1, "P")))
    val p = log.range(graft.core.Ulid.timeOnly(0L), graft.core.Ulid.timeMax(4102444800000L))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThan(id,"), "ULID lower bound must push down")
    // the PushedFilters list is truncated in toString; the upper bound is
    // visible in the Filter node's condition
    assert(p.contains("<= 03QCPC7P00ZZZZZZZZZZZZZZZZ"), "ULID upper bound must be in the plan")
    assert(p.contains("EqualTo(migration,0)"))
  }
}
