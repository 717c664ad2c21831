package graft.tools

import graft.core.Ulid
import graft.log.EventLog
import graft.replay.{EventFilter, Player}
import graft.store.EventStore
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: synthesize a log well beyond the sf0.1 events table (default
  * 200k events / 20k streams; SCALE_STREAMS=100000 → 1M events) DIRECTLY as
  * bucketed parquet (bulk load path), then time the core operations.
  * Demonstrates the design holds as volume grows: bulk ingest is one
  * distributed write, folds are one shuffle, point ops are bucket-pruned,
  * maintenance is partition-scoped.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nStreams = sys.env.getOrElse("SCALE_STREAMS", "20000").toInt
    val perStream = 10
    val dir = Files.createTempDirectory("graftscale").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 64)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // ── bulk ingest through the first-class API: one shuffle + one write ─
    time(s"bulk ingest ${nStreams * perStream} events (bulkImport)") {
      val stream = (col("id") / perStream).cast("long")
      val src = spark.range(nStreams.toLong * perStream).select(
        format_string("01HXSCALE%017d", stream).as("aggregate_id"),
        lit("Account").as("aggregate_kind"),
        when(col("id") % perStream === 0, "AccountCreated")
          .otherwise("MoneyDeposited").as("kind"),
        when(col("id") % perStream === 0,
          format_string("""{"money":%d,"owner":"o%d"}""",
            lit(100) + col("id") % 50, stream))
          .otherwise(format_string("""{"money":%d}""", col("id") % 10)).as("body"),
        (col("id") % perStream).as("seq"),
        (lit(1700000000000L) + col("id")).as("ts"),
        map(lit("tenant"), when(col("id") % 2 === 0, "xyz").otherwise("abc"))
          .as("discriminator"))
      val n = log.bulkImport(src, seqCol = "seq", timeCol = Some("ts"))
      require(n == nStreams.toLong * perStream, s"imported $n")
    }

    val store = new EventStore(log, graft.tools.ScaleAccount)
    time(s"rehydrateAll ($nStreams streams, 1 shuffle)") {
      val n = store.rehydrateAll().count()
      require(n == nStreams, s"expected $nStreams states, got $n")
    }
    time("point retrieve (bucket-pruned)") {
      val r = store.retrieve(f"01HXSCALE${42L}%017d")
      require(r.version == perStream)
    }
    time("range scan last 10% by ULID id") {
      val after = Ulid.timeOnly(1700000000000L + nStreams.toLong * perStream * 9 / 10)
      log.range(after, "").count()
    }
    time("filtered catchup (tenant + split 0/4)") {
      new Player(log).replay("", "", EventFilter(
        discriminator = Map("tenant" -> Seq("xyz")), splits = 4, splitIds = Seq(0))).count()
    }
    time("forget one stream (1 bucket rewritten)") {
      log.forget(f"01HXSCALE${7L}%017d", Set("AccountCreated"), _ => "{}", _ => "{}")
    }
    time("optimistic append + conflict check") {
      log.append(Seq(graft.log.AppendRecord(f"01HXSCALE${99L}%017d", "Account",
        perStream, Map.empty, Seq(graft.log.EventDetail("MoneyDeposited", """{"money":1}""")))))
    }
    time("compact 64 buckets") { log.compact() }
    time("rehydrateAll after compact") {
      require(store.rehydrateAll().count() == nStreams)
    }

    // ── celebrity stream: one key with 300k events (hard part #6), ingested
    // through bulkImport — all 300k rows land in ONE repartition group, so
    // the import's per-stream sort is the spill path under test; downstream,
    // flatMapSortedGroups folds the hot key without materializing it.
    time("ingest 300k-event celebrity stream (bulkImport)") {
      val hot = "01HXSCALECELEBRITY0000001"
      val src = spark.range(300000L).select(
        lit(hot).as("aggregate_id"),
        lit("Account").as("aggregate_kind"),
        lit("MoneyDeposited").as("kind"),
        lit("""{"money":1}""").as("body"),
        col("id").as("seq"),
        (lit(1710000000000L) + col("id")).as("ts"))
      require(log.bulkImport(src, seqCol = "seq", timeCol = Some("ts")) == 300000L)
    }
    time("rehydrateAll incl. celebrity (spillable fold)") {
      require(store.rehydrateAll().count() == nStreams + 1)
    }

    // ── stream-scale maintenance: the distributed M4/M2 paths (driver
    // memory stays flat — per-stream state never leaves the executors) ───
    time(s"M4 NoOp fences: ${nStreams + 1} streams minted distributed") {
      val n = log.appendNoOpFences("Account")
      require(n == nStreams.toLong + 1, s"fenced $n")
    }
    time("M2 migrate 1% of streams (jobs bounded by buckets)") {
      val migrated = log.migrateDistributed(1, Set("AccountCreated"), evs =>
        if (evs.head.aggregate_id.endsWith("00"))
          Some(evs.map(e => graft.log.EventDetail(e.kind, e.body)))
        else None).count()
      require(migrated == nStreams.toLong / 100, s"migrated $migrated")
    }
    time("rehydrateAll after maintenance") {
      require(store.rehydrateAll().count() == nStreams + 1)
    }

    // ── manifest-commit throughput: concurrent writers, no lock service ──
    {
      // Modest size on purpose: every commit is a full round-trip (chain
      // refresh + bucket-pruned validation query + conditional claim + data
      // write), and a lost claim race repeats the validation — the protocol
      // targets coordination safety on object stores, not high-frequency
      // single-row OLTP. Writers needing throughput batch many records per
      // AppendRecord/commit, exactly like the reference's per-transaction
      // batching.
      val mdir = Files.createTempDirectory("graftscalemanifest").toFile.getAbsolutePath
      val writers = 4
      val commitsEach = 3
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      time(s"manifest commits: $writers writers x $commitsEach txns") {
        val futures = (0 until writers).map { wtr =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              val wlog = new EventLog(spark, mdir, numBuckets = 16,
                commitMode = graft.log.CommitMode.Manifest)
              (0 until commitsEach).foreach { v =>
                wlog.append(Seq(graft.log.AppendRecord(s"mstream-$wtr", "Account", v,
                  Map.empty, Seq(graft.log.EventDetail("MoneyDeposited", """{"money":1}""")))))
              }
            }
          })
        }
        // shutdownNow in finally: a throwing writer must not leave non-daemon
        // pool threads pinning the JVM open after main dies
        try futures.foreach(_.get())
        finally { pool.shutdownNow(); () }
        val mlog = new EventLog(spark, mdir, numBuckets = 16,
          commitMode = graft.log.CommitMode.Manifest)
        require(mlog.committedEvents.count() == writers.toLong * commitsEach)
        require(mlog.manifest.claims().size == writers * commitsEach)
      }
    }
    spark.stop()
  }
}

/** Minimal Account fold for the smoke (the test fixture lives in test scope). */
object ScaleAccount extends graft.store.AggregateType[(String, Long)] {
  val kind = "Account"
  val empty = ("", 0L)
  def fold(s: (String, Long), k: String, body: String): (String, Long) = {
    val n = graft.codec.Codec.parse(body)
    // defensive on missing fields: forget (GDPR) may have scrubbed the body
    def str(f: String) = Option(n.get(f)).map(_.asText()).getOrElse("")
    def num(f: String) = Option(n.get(f)).map(_.asLong()).getOrElse(0L)
    k match {
      case "AccountCreated" => (str("owner"), num("money"))
      case "MoneyDeposited" => (s._1, s._2 + num("money"))
      case _ => s
    }
  }
  def encodeState(s: (String, Long)): String = s"""{"owner":"${s._1}","balance":${s._2}}"""
  def decodeState(b: String): (String, Long) = {
    val n = graft.codec.Codec.parse(b)
    (n.get("owner").asText(), n.get("balance").asLong())
  }
}
