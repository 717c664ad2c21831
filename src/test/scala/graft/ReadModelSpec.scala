package graft

import graft.log.EventLog
import graft.replay.EventFilter
import graft.store.EventStore
import graft.streaming.{ProjMessage, Projector, ReadModel}
import java.nio.file.Files
import org.apache.spark.sql.Dataset
import org.scalatest.funsuite.AnyFunSuite

/** A4 end-to-end: projection messages fold into a durable parquet read
  * model with upsert semantics; redelivery leaves the state unchanged.
  */
class ReadModelSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("catchup + live fold into a durable read model; redelivery is idempotent") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftrm").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(71L))
    val store = new EventStore(log, AccountType)
    val t0 = 1700000000000L
    store.create("01HXRMACCTA00000000000001",
      Seq(AccountType.created(100, "Paulo"), AccountType.deposited(30)), nowMs = t0)
    store.create("01HXRMACCTB00000000000002",
      Seq(AccountType.created(50, "Ana")), nowMs = t0)

    val rm = new ReadModel(spark, s"$dir/balances", "aggregate_id")
    // handler: fold the batch's messages per aggregate and upsert
    def apply(ds: Dataset[ProjMessage]): Unit = {
      val msgs = ds.collect().filter(m => m.meta_kind != "switch")
      if (msgs.isEmpty) return
      // batch-local fold on top of current state (read model = prior state)
      val prior: Map[String, (String, Long)] =
        try rm.current().as[(String, String, Long)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        catch { case _: IllegalStateException => Map.empty }
      val folded = msgs.sortBy(_.id).groupBy(_.aggregate_id).map { case (aid, ms) =>
        var acc = prior.get(aid)
          .map { case (o, b) => Account("OPEN", b, o) }
          .getOrElse(AccountType.empty)
        ms.foreach(m => acc = AccountType.fold(acc, m.kind, m.body))
        (aid, acc.owner, acc.balance)
      }.toSeq
      rm.merge(folded.toDF("aggregate_id", "owner", "balance"))
    }

    val proj = new Projector(log, "balances-rm", dir,
      filter = EventFilter(aggregateKinds = Seq("Account")), partitions = 2)
    proj.catchup(apply, nowMs = t0 + 120000L)
    def state(): Map[String, Long] =
      rm.current().select("aggregate_id", "balance").as[(String, Long)].collect().toMap
    assert(state() == Map(
      "01HXRMACCTA00000000000001" -> 130L, "01HXRMACCTB00000000000002" -> 50L))

    val q = proj.live(apply)
    try {
      store.update("01HXRMACCTA00000000000001")(_ => Seq(AccountType.withdrawn(15)),
        nowMs = t0 + 300000L)
      q.processAllAvailable()
      assert(state() == Map(
        "01HXRMACCTA00000000000001" -> 115L, "01HXRMACCTB00000000000002" -> 50L))
    } finally q.stop()

    // redelivering an identical projection batch leaves resolved state unchanged
    rm.merge(Seq(("01HXRMACCTA00000000000001", "Paulo", 115L))
      .toDF("aggregate_id", "owner", "balance"))
    assert(state()("01HXRMACCTA00000000000001") == 115L)

    rm.compact(gcRetentionMs = 0L)
    assert(state() == Map(
      "01HXRMACCTA00000000000001" -> 115L, "01HXRMACCTB00000000000002" -> 50L))
    assert(spark.read.parquet(s"$dir/balances").count() == 2) // one row per key
  }

  test("forget erases every stored version; rebuild from the scrubbed log shows scrubbed state") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftrmf").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 4, ulidSeed = Some(73L))
    val store = new EventStore(log, AccountType)
    val t0 = 1700000000000L
    val (idA, idB) = ("01HXRMFORGETA0000000000001", "01HXRMFORGETB0000000000002")
    store.create(idA, Seq(AccountType.created(100, "Paulo")), nowMs = t0)
    store.create(idB, Seq(AccountType.created(50, "Ana")), nowMs = t0)
    store.update(idA)(_ => Seq(AccountType.deposited(30)), nowMs = t0 + 60000L)

    val rm = new ReadModel(spark, s"$dir/balances", "aggregate_id")
    def project(name: String, filter: EventFilter = EventFilter(aggregateKinds = Seq("Account"))): Unit = {
      def apply(ds: Dataset[ProjMessage]): Unit = {
        val msgs = ds.collect().filter(_.meta_kind != "switch")
        if (msgs.isEmpty) return
        val folded = msgs.sortBy(_.id).groupBy(_.aggregate_id).map { case (aid, ms) =>
          var acc = AccountType.empty
          ms.foreach(m => acc = AccountType.fold(acc, m.kind, m.body))
          (aid, acc.owner, acc.balance)
        }.toSeq
        rm.merge(folded.toDF("aggregate_id", "owner", "balance"))
      }
      new Projector(log, name, dir, filter = filter, partitions = 2)
        .catchup(apply, nowMs = t0 + 120000L)
    }
    project("rm-forget")
    // A has TWO stored versions now (create-batch fold + deposit refold
    // would be one here; force a second version with an explicit merge)
    rm.merge(Seq((idA, "Paulo", 130L)).toDF("aggregate_id", "owner", "balance"))
    assert(spark.read.parquet(s"$dir/balances")
      .filter($"aggregate_id" === idA).count() >= 2, "fixture: multiple versions of A")

    // the GDPR chain: scrub the LOG first (the reference's eventstore
    // forget), then erase the projection's derived rows
    def scrub(body: String): String = {
      val n = graft.codec.Codec.parse(body)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      if (n.has("owner")) n.put("owner", "[GONE]")
      graft.codec.Codec.write(n)
    }
    log.forget(idA, Set("AccountCreated"), scrub, scrub)
    val removed = rm.forget(Seq(idA).toDF("aggregate_id"))
    assert(removed >= 2L, s"every stored version of A must be touched, got $removed")
    // EVERY version is gone — not just the latest-wins winner (superseded
    // rows would otherwise hold the owner until the next compact)
    assert(spark.read.parquet(s"$dir/balances")
      .filter($"aggregate_id" === idA).count() === 0L)
    assert(rm.current().filter($"aggregate_id" === idA).count() === 0L)
    assert(rm.current().filter($"aggregate_id" === idB).count() === 1L,
      "survivor keys untouched")

    // rebuild the key from the (scrubbed) log: a fresh projection replay
    // produces exactly the scrubbed state — the "rebuild" half of
    // rebuild-or-scrub
    project("rm-forget-rebuild", EventFilter(aggregateKinds = Seq("Account"),
      custom = Some(org.apache.spark.sql.functions.col("aggregate_id") === idA)))
    val a = rm.current().filter($"aggregate_id" === idA)
      .select("owner", "balance").as[(String, Long)].head()
    assert(a == ("[GONE]", 130L),
      s"post-forget rebuild must show the scrubbed owner with intact balance, got $a")
  }

  test("forget with scrub rewrites all versions in place and preserves merge continuity") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftrms").toFile.getAbsolutePath
    val rm = new ReadModel(spark, s"$dir/rm", "k")
    rm.merge(Seq(("a", "pii-4", 4L)).toDF("k", "who", "v"), version = Some(4L))
    rm.merge(Seq(("a", "pii-5", 5L), ("b", "ok", 1L)).toDF("k", "who", "v"),
      version = Some(5L))
    val n = rm.forget(Seq("a").toDF("k"), scrub = Some(df =>
      df.withColumn("who", org.apache.spark.sql.functions.lit("[GONE]"))))
    assert(n == 2L, "both stored versions of a scrubbed")
    // the raw table holds NO unscrubbed copy of either version
    val raw = spark.read.parquet(s"$dir/rm").filter($"k" === "a")
      .select("who").as[String].collect()
    assert(raw.length == 2 && raw.forall(_ == "[GONE]"))
    assert(rm.current().filter($"k" === "a").select("v").as[Long].head() == 5L,
      "latest-wins order survives the scrub (stamps preserved)")
    // checkpoint continuity: a later versioned merge still wins, a replayed
    // older batch still loses — forget never touched the stamp order
    rm.merge(Seq(("a", "new", 6L)).toDF("k", "who", "v"), version = Some(6L))
    rm.merge(Seq(("a", "pii-5", 5L)).toDF("k", "who", "v"), version = Some(5L))
    assert(rm.current().filter($"k" === "a").select("who", "v")
      .as[(String, Long)].head() == ("new", 6L))
    // a scrub dropping the stamp refuses (it would break that continuity)
    val e = intercept[IllegalArgumentException](
      rm.forget(Seq("b").toDF("k"), scrub = Some(_.drop("__rm_version"))))
    assert(e.getMessage.contains("__rm_version"))
  }

  test("versioned merges are order-neutral: a stale instance can't roll state back") {
    // two projector instances of one name race; the laggard replays an OLDER
    // batch AFTER the leader merged a newer one — with version-stamped
    // merges the resolved state must stay the newer batch's
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftrmver").toFile.getAbsolutePath
    val rm = new ReadModel(spark, s"$dir/rm", "k")
    rm.merge(Seq(("a", 10L)).toDF("k", "v"), version = Some(4L)) // leader, batch 4
    rm.merge(Seq(("a", 20L)).toDF("k", "v"), version = Some(5L)) // leader, batch 5
    rm.merge(Seq(("a", 10L)).toDF("k", "v"), version = Some(4L)) // laggard replays 4
    def state() = rm.current().select("k", "v").as[(String, Long)].collect().toMap
    assert(state() == Map("a" -> 20L),
      "replayed older batch must never promote older state")
    // duplicate redelivery of the LATEST batch is a no-op on resolved state
    rm.merge(Seq(("a", 20L)).toDF("k", "v"), version = Some(5L))
    assert(state() == Map("a" -> 20L))
    // compaction preserves the version-order invariant
    rm.compact(gcRetentionMs = 0L)
    assert(state() == Map("a" -> 20L))
    // and a later versioned merge still wins over the compacted copy
    rm.merge(Seq(("a", 30L)).toDF("k", "v"), version = Some(6L))
    assert(state() == Map("a" -> 30L))
  }

  test("compact is reader-safe: superseded files survive to the retention horizon") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftrmgc").toFile.getAbsolutePath
    val rm = new ReadModel(spark, s"$dir/rm", "k")
    rm.merge(Seq(("a", 1L), ("b", 1L)).toDF("k", "v"))
    rm.merge(Seq(("a", 2L)).toDF("k", "v"))
    val hp = new org.apache.hadoop.fs.Path(s"$dir/rm")
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    def files() = fs.listStatus(hp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted.toSeq
    val staleListing = files()

    // default retention: compact APPENDS the latest rows and deletes nothing
    rm.compact()
    assert(rm.current().as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 1L))
    assert(staleListing.forall(f => fs.exists(new org.apache.hadoop.fs.Path(f))),
      "superseded files must outlive compact until the retention horizon")
    // a reader that listed BEFORE the compact still resolves the full state
    // from its stale listing (no read-after-delete window)
    val staleView = spark.read.parquet(staleListing: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.functions.col("k"))
      .orderBy(org.apache.spark.sql.functions.col("__rm_version").desc)
    val staleState = staleView
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(org.apache.spark.sql.functions.col("rn") === 1)
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(staleState == Map("a" -> 2L, "b" -> 1L))

    // a merge AFTER compact stamps higher and wins over the compacted copy
    rm.merge(Seq(("b", 9L)).toDF("k", "v"))
    assert(rm.current().as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 9L))

    // past the horizon the superseded files go; resolved state is unchanged
    rm.compact(gcRetentionMs = 0L)
    assert(rm.current().as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 9L))
    assert(spark.read.parquet(s"$dir/rm").count() == 2)
  }

  test("forget refuses a scrub that drops rows (row conservation); the model is untouched") {
    // ADVICE r13: the returned count was the PRE-scrub victim count — a
    // scrub that filters or deduplicates would silently drop stored
    // versions while forget reported them scrubbed
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftrmrc").toFile.getAbsolutePath
    val rm = new ReadModel(spark, s"$dir/rm", "k")
    rm.merge(Seq(("a", 1L), ("b", 1L)).toDF("k", "v"), version = Some(1L))
    rm.merge(Seq(("a", 2L)).toDF("k", "v"), version = Some(2L))
    val before = spark.read.parquet(s"$dir/rm").collect().toSet
    val e = intercept[IllegalStateException](
      rm.forget(Seq("a").toDF("k"), scrub = Some(_.limit(1))))
    assert(e.getMessage.contains("1:1"), s"must name the contract: ${e.getMessage}")
    assert(spark.read.parquet(s"$dir/rm").collect().toSet == before,
      "a refused forget must leave every stored file untouched")
    assert(rm.current().as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 1L))
    // and a conforming scrub on the same model still works
    assert(rm.forget(Seq("a").toDF("k"),
      scrub = Some(_.withColumn("v", org.apache.spark.sql.functions.lit(0L)))) == 2L)
    assert(rm.current().as[(String, Long)].collect().toMap == Map("a" -> 0L, "b" -> 1L))
  }

  test("a forget that crashed mid-swap refuses reads and finishes FORWARD on the next maintenance entry") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftrmcr").toFile.getAbsolutePath
    val rm = new ReadModel(spark, s"$dir/rm", "k")
    rm.merge(Seq(("a", 1L)).toDF("k", "v"), version = Some(1L))
    rm.merge(Seq(("b", 2L)).toDF("k", "v"), version = Some(2L))
    val hp = new org.apache.hadoop.fs.Path(s"$dir/rm")
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val old = fs.listStatus(hp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    assert(old.length >= 2)
    // manufacture the crash state forget() leaves between its old-file
    // deletes: staged post-forget copy complete, marker naming the old
    // files, ONE old file already deleted
    spark.read.parquet(old.map(_.getPath.toString).toIndexedSeq: _*)
      .filter($"k" =!= "a")
      .write.parquet(s"$dir/rm/.staged_rewrite")
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/rm/_forget_swap"), false)
    out.write(old.map(_.getPath.getName).mkString("\n").getBytes("UTF-8")); out.close()
    fs.delete(old.head.getPath, false)
    // readers refuse LOUDLY instead of silently missing keys
    val e = intercept[IllegalStateException](rm.current())
    assert(e.getMessage.contains("mid-swap"), e.getMessage)
    // the next maintenance entry finishes the swap forward deterministically
    rm.compact(gcRetentionMs = 0L)
    assert(rm.current().as[(String, Long)].collect().toMap == Map("b" -> 2L),
      "recovery must adopt the staged post-forget truth, never resurrect victims")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/rm/_forget_swap")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/rm/.staged_rewrite")))
    // and the model keeps working
    rm.merge(Seq(("c", 3L)).toDF("k", "v"), version = Some(3L))
    assert(rm.current().as[(String, Long)].collect().toMap == Map("b" -> 2L, "c" -> 3L))
  }
}
