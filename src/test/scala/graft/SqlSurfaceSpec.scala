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

  test("text-op SQL macros expand to the Column compositions, not UDFs") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT pii_redact('mail a@b.example.com or 555-123-4567') AS red,
        |       pii_email_count('x a@b.example.org y') AS ne,
        |       pii_ip_count('host 10.1.2.3 up') AS ni,
        |       token_count('one two  three') AS tc,
        |       bpeish_token_count('spark-4.1, yes!') AS bc,
        |       doc_fingerprint('  A  b ') = doc_fingerprint('a b') AS fp_eq,
        |       token_hash32('abc') AS th""".stripMargin).head()
    assert(r.getString(0) == "mail [EMAIL] or [PHONE]")
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L && r.getLong(3) == 3L)
    assert(r.getLong(4) == 4L, "spark / 4 / 1 / yes")
    assert(r.getBoolean(5), "fingerprint normalizes case + whitespace")
    // same value the Scala API computes — one expression tree, two surfaces
    val scalaTh = spark.range(1)
      .select(graft.ops.TextAnalysis.tokenHash32(
        org.apache.spark.sql.functions.lit("abc")).as("h"))
      .head().getLong(0)
    assert(r.getLong(6) == scalaTh)
    // no UDF node in the plan: the macro is pure built-in expression calls
    val plan = spark.sql("SELECT pii_redact('z') AS x").queryExecution
      .executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }

  test("zorder_key SQL macro interleaves like the Scala API") {
    graft.functions.registerAll(spark)
    // 2 dims → 16 bits each; bit b of dim 0 lands at position 2b, of dim 1
    // at 2b+1: (x=0b101, y=0b011) → positions 0,4 from x and 1,3 from y
    // = 0b011011 = 27
    val r = spark.sql("SELECT zorder_key(5, 3) AS z2, zorder_key(7) AS z1").head()
    assert(r.getLong(0) == 27L, "interleave(101, 011) = 011011")
    assert(r.getLong(1) == 7L, "one dim = identity on its low bits")
    val scalaZ = spark.range(1)
      .select(graft.ops.Layout.zorderKey(
        Seq(org.apache.spark.sql.functions.lit(5),
          org.apache.spark.sql.functions.lit(3)), 16).as("z"))
      .head().getLong(0)
    assert(r.getLong(0) == scalaZ, "one expression tree, two surfaces")
    val plan = spark.sql("SELECT zorder_key(1, 2) AS z").queryExecution
      .executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }
}
