package graft

import graft.log.EventLog
import graft.store.EventStore
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: the log is queryable via spark.sql with the engine's custom
  * functions registered (fnv1a32, ulid_millis).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("spark.sql queries the registered views with custom functions") {
    val dir = Files.createTempDirectory("graftsql").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(51L))
    val store = new EventStore(log, AccountType)
    val id = "01HXSQLSURFACE00000000001"
    store.create(id, Seq(AccountType.created(100, "P"), AccountType.deposited(7)),
      nowMs = 1700000000000L)
    log.registerViews()

    val row = spark.sql(
      """SELECT aggregate_id,
        |       max(aggregate_version) AS v,
        |       fnv1a32(aggregate_id) = any_value(aggregate_id_hash) AS hash_ok,
        |       min(ulid_millis(id)) AS first_ms
        |FROM graft_events_active
        |GROUP BY aggregate_id""".stripMargin).head()
    assert(row.getString(0) == id)
    assert(row.getInt(1) == 2)
    assert(row.getBoolean(2), "stored hash must equal fnv1a32 recomputed in SQL")
    assert(row.getLong(3) == 1700000000000L)

    // per-kind balance in pure SQL over the JSON bodies
    val bal = spark.sql(
      """SELECT sum(CASE WHEN kind IN ('AccountCreated', 'MoneyDeposited')
        |                THEN CAST(get_json_object(body, '$.money') AS DOUBLE)
        |                ELSE 0.0 END) AS balance
        |FROM graft_events_active""".stripMargin).head().getDouble(0)
    assert(bal == 107.0)
  }
}
