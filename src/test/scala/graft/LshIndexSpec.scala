package graft

import graft.ops.{Dedup, LshIndex, Similarity}
import graft.streaming.StreamAggs
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted MinHash-LSH signature index: build/append/streaming-ingest/
  * compact lifecycle, screen equivalence with the ad-hoc incremental screen,
  * partition pruning of the signature scan, the shared mutation fence, and
  * the self-growing streaming dedup composite.
  */
class LshIndexSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  // disjoint per-family vocabularies: families never near-dup each other
  private def fam(i: Long, tag: String) =
    s"alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i hotel$i india$i family$i $tag"

  private def corpusDf(n: Long) = {
    val s = spark
    import s.implicits._
    (0L until n).map(i => (i, fam(i, "accepted corpus body here")))
      .toDF("doc_id", "text")
  }

  private def batchDf(ids: Seq[Long]) = {
    val s = spark
    import s.implicits._
    ids.map { i =>
      if (i % 2 == 0) (100L + i, fam(i % 8, "accepted corpus body CHANGED"))
      else (100L + i, s"novel unrelated content number$i with distinct words entirely here now")
    }.toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("doc_id").collect().map(_.toString).toSeq

  test("persisted screen equals the ad-hoc incremental screen; the index scan prunes") {
    val s = spark
    val corpus = corpusDf(30)
    val batch = batchDf(0L until 10L)
    val idx = Files.createTempDirectory("lshidx").toFile.getAbsolutePath
    LshIndex.build(corpus, "doc_id", "text", idx, sigBuckets = 16)

    val got = LshIndex.screen(s, idx, corpus, batch, "doc_id", "text", 0.5)
    val want = Dedup.incrementalDedup(corpus, batch, "doc_id", "text", 0.5)
    assert(rows(got) === rows(want))
    assert(got.filter(!col("is_new")).count() == 5, "5 planted near-dups")

    // physical layout: two-level (band, sig-bucket) partition grid …
    val bandDirs = new java.io.File(s"$idx/sigs").listFiles()
      .filter(_.getName.startsWith("band=")).map(_.getName).toSet
    assert(bandDirs.size == 4, s"expected 4 band partitions, got $bandDirs")
    // … and the candidate join (the screen's internal first stage) pushes
    // the batch's touched (band, sb) set as a STATIC partition filter: the
    // stored scan only reads the buckets the batch's signatures hash into
    val cand = LshIndex.candidates(s, idx, batch, "doc_id", "text")
    assert(cand.count() > 0)
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
        """\(band#\d+ = \d""".r.findFirstIn(plan).isDefined,
      "the candidate join must push a literal (band, sb) partition filter:\n" +
        plan.take(2000))
  }

  test("screenAuto: the census cap drops only the boilerplate class; degenerate corpora refuse") {
    val s = spark
    import s.implicits._
    val boilerText = "terms of service apply to all users of this site always"
    val midText = fam(7, "accepted corpus body here")
    // 30 distinct docs + a 20-copy boilerplate class + a 3-copy dup class
    // (ids 7, 2000, 2001 share midText)
    val corpus = ((0L until 30L).map(i => (i, fam(i, "accepted corpus body here"))) ++
        (0L until 20L).map(j => (1000L + j, boilerText)) ++
        Seq((2000L, midText), (2001L, midText)))
      .toDF("doc_id", "text")
    val idx = Files.createTempDirectory("lshauto").toFile.getAbsolutePath
    LshIndex.build(corpus, "doc_id", "text", idx, sigBuckets = 16)
    // the census: 3-copy classes fit a 2-candidates/probe budget, the
    // 20-copy class cannot — cap lands strictly between
    val cap = LshIndex.safeBucketCap(s, idx, maxCandidatesPerProbe = 2.0)
    assert(cap.exists(c => c >= 3 && c < 20), s"expected cap in [3, 20), got $cap")
    val batch = Seq((5000L, boilerText), (5001L, midText),
      (5002L, "totally novel content unlike anything stored here at all"))
      .toDF("doc_id", "text")
    val got = LshIndex.screenAuto(s, idx, corpus, batch, "doc_id", "text",
        threshold = 0.5, maxCandidatesPerProbe = 2.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.get(2)), r.getInt(3)))).toMap
    assert(got(5000L)._1 === true,
      "the boilerplate probe's candidates were capped away — is_new is the " +
        "documented recall trade (exact-dedup owns that class)")
    assert(got(5001L) === ((false, Some(7L), cap.get)),
      "the small dup class screens normally and the cap rides the row")
    assert(got(5002L)._1 === true)
    // pass-through: on a differentiated corpus the auto screen equals the
    // plain screen row-for-row (the vacuous cap caps nothing)
    val clean = corpusDf(30)
    val idx2 = Files.createTempDirectory("lshauto2").toFile.getAbsolutePath
    LshIndex.build(clean, "doc_id", "text", idx2, sigBuckets = 16)
    val b2 = batchDf(0L until 10L)
    assert(rows(LshIndex.screenAuto(s, idx2, clean, b2, "doc_id", "text", 0.5,
        maxCandidatesPerProbe = 2.0).drop("bucket_cap")) ===
      rows(LshIndex.screen(s, idx2, clean, b2, "doc_id", "text", 0.5)))
    // refusal: a corpus that is ONE near-identical class — even its
    // smallest colliding buckets blow any sane budget; the gate refuses
    // before the quadratic join, naming the upstream remedy
    val dense = (0L until 30L)
      .map(i => (i, "same text every single time forever and ever amen"))
      .toDF("doc_id", "text")
    val idx3 = Files.createTempDirectory("lshauto3").toFile.getAbsolutePath
    LshIndex.build(dense, "doc_id", "text", idx3, sigBuckets = 16)
    assert(LshIndex.safeBucketCap(s, idx3, 2.0).isEmpty)
    val e = intercept[IllegalStateException] {
      LshIndex.screenAuto(s, idx3, dense, batch, "doc_id", "text", 0.5,
        maxCandidatesPerProbe = 2.0)
    }
    assert(e.getMessage.contains("exact-dedup"), e.getMessage)
  }

  test("full lifecycle (build + append + ingest + compact + ingest) screens like a one-shot build") {
    val s = spark
    val corpus = corpusDf(40)
    val batch = batchDf(0L until 10L)

    val oneShot = Files.createTempDirectory("lshone").toFile.getAbsolutePath
    LshIndex.build(corpus, "doc_id", "text", oneShot, sigBuckets = 8)

    val staged = Files.createTempDirectory("lshlife").toFile.getAbsolutePath
    LshIndex.build(corpus.filter(col("doc_id") < 10), "doc_id", "text",
      staged, sigBuckets = 8)
    LshIndex.append(s, staged,
      corpus.filter(col("doc_id") >= 10 && col("doc_id") < 20), "doc_id", "text")
    LshIndex.appendBatch(s, staged,
      corpus.filter(col("doc_id") >= 20 && col("doc_id") < 30), "doc_id", "text", 1L)
    LshIndex.compactIngest(s, staged) // batch 1 folds into sigs/
    LshIndex.appendBatch(s, staged,
      corpus.filter(col("doc_id") >= 30), "doc_id", "text", 2L) // stays in ingest
    assert(new java.io.File(s"$staged/ingest").exists())

    val a = rows(LshIndex.screen(s, oneShot, corpus, batch, "doc_id", "text", 0.5))
    val b = rows(LshIndex.screen(s, staged, corpus, batch, "doc_id", "text", 0.5))
    assert(a === b, "write-path history must be invisible to the screen")
    assert(LshIndex.signatures(s, staged).count() ==
      LshIndex.signatures(s, oneShot).count())
  }

  test("appendBatch is idempotent; a folded batch's replay is skipped, not re-folded") {
    val s = spark
    val corpus = corpusDf(10)
    val idx = Files.createTempDirectory("lshreplay").toFile.getAbsolutePath
    LshIndex.build(corpus, "doc_id", "text", idx, sigBuckets = 8)
    val extra = corpusDf(14).filter(col("doc_id") >= 10)

    LshIndex.appendBatch(s, idx, extra, "doc_id", "text", 7L)
    val n1 = LshIndex.signatures(s, idx).count()
    // pre-compact replay: dynamic overwrite rewrites exactly itself
    LshIndex.appendBatch(s, idx, extra, "doc_id", "text", 7L)
    assert(LshIndex.signatures(s, idx).count() == n1)

    LshIndex.compactIngest(s, idx)
    assert(LshIndex.batchFolded(s, idx, 7L))
    assert(LshIndex.signatures(s, idx).count() == n1)
    // post-compact replay (stream checkpoint was uncommitted at the crash):
    // the folded marker must make it a no-op — without it the rewrite of
    // the now-absent b=7 partitions would duplicate every vector at the
    // NEXT compact
    LshIndex.appendBatch(s, idx, extra, "doc_id", "text", 7L)
    assert(!new java.io.File(s"$idx/ingest").exists(),
      "a folded batch's replay must not resurrect the ingest area")
    LshIndex.compactIngest(s, idx)
    assert(LshIndex.signatures(s, idx).count() == n1,
      "re-compacting after a folded replay must not duplicate signatures")
  }

  test("a batch id above Int.MaxValue survives the ingest read and excludeBatch") {
    // the ingest partition column `b` is written from a Long batch id; the
    // reader must declare it LONG — an INT declaration parses an oversized
    // id's partition value as null, and excludeBatch's `=!=` then silently
    // drops every such ingest row from the signature frame
    val s = spark
    val corpus = corpusDf(10)
    val idx = Files.createTempDirectory("lshbigbatch").toFile.getAbsolutePath
    LshIndex.build(corpus, "doc_id", "text", idx, sigBuckets = 8)
    val big = Int.MaxValue.toLong + 7L
    val extra = corpusDf(14).filter(col("doc_id") >= 10)
    LshIndex.appendBatch(s, idx, extra, "doc_id", "text", big)
    assert(LshIndex.signatures(s, idx).count() == 14L * 4,
      "ingest rows of an oversized batch id must be visible")
    assert(LshIndex.signatures(s, idx, excludeBatch = Some(big)).count() == 10L * 4,
      "excludeBatch must exclude exactly the oversized batch, not everything")
    assert(LshIndex.signatures(s, idx, excludeBatch = Some(1L)).count() == 14L * 4,
      "excluding a different id must keep the oversized batch's rows")
  }

  test("a compact crashed after its moves leaves screens alive (empty ingest tree)") {
    val s = spark
    val corpus = corpusDf(10)
    val idx = Files.createTempDirectory("lshcrash").toFile.getAbsolutePath
    LshIndex.build(corpus, "doc_id", "text", idx, sigBuckets = 8)
    LshIndex.appendBatch(s, idx, corpusDf(14).filter(col("doc_id") >= 10),
      "doc_id", "text", 3L)
    val before = LshIndex.signatures(s, idx).count()
    LshIndex.compactIngest(s, idx)
    // reconstruct the crash window: every file moved, side area not yet
    // deleted — an empty b=/band=/sb= tree left behind
    new java.io.File(s"$idx/ingest/b=3/band=0/sb=0").mkdirs()
    assert(LshIndex.signatures(s, idx).count() == before,
      "an empty crash-leftover ingest tree must read as absent")
    val verd = LshIndex.screen(s, idx, corpus, batchDf(0L until 4L),
      "doc_id", "text", 0.5)
    assert(verd.count() == 4, "screens must survive the crash leftover")
  }

  test("forget scrubs signatures from main and ingest; the index screens like one built on survivors") {
    val s = spark
    val corpus = corpusDf(30)
    val idx = Files.createTempDirectory("lshforget").toFile.getAbsolutePath
    LshIndex.build(corpus.filter(col("doc_id") < 20), "doc_id", "text", idx,
      sigBuckets = 8)
    LshIndex.appendBatch(s, idx, corpus.filter(col("doc_id") >= 20),
      "doc_id", "text", 1L) // victims will straddle sigs/ AND ingest/
    val victims = Seq(5L, 6L, 7L, 8L, 9L, 22L, 23L, 24L)
    val s0 = spark
    import s0.implicits._
    val removed = LshIndex.forget(s, idx, victims.toDF("doc_id"), "doc_id")
    assert(removed == victims.size * 4L, s"4 bands per victim doc: $removed")
    assert(LshIndex.signatures(s, idx).count() == (30L - victims.size) * 4)

    // behavioral equivalence: screen == against an index BUILT on survivors
    val survivors = corpus.filter(!col("doc_id").isin(victims: _*))
    val twin = Files.createTempDirectory("lshforgettwin").toFile.getAbsolutePath
    LshIndex.build(survivors, "doc_id", "text", twin, sigBuckets = 8)
    val batch = batchDf(0L until 10L)
    assert(rows(LshIndex.screen(s, idx, survivors, batch, "doc_id", "text", 0.5))
      === rows(LshIndex.screen(s, twin, survivors, batch, "doc_id", "text", 0.5)))

    // a batch doc near-dupping a FORGOTTEN doc must now be novel
    val probe = Seq((500L, fam(5, "accepted corpus body CHANGED")))
      .toDF("doc_id", "text")
    val v = LshIndex.screen(s, idx, survivors, probe, "doc_id", "text", 0.5)
      .collect()(0)
    assert(v.getBoolean(1), "a forgotten doc must stop matching")
  }

  test("health surfaces heavy buckets; reshard regrows the grid; a half-done reshard refuses loudly") {
    val s = spark
    import s.implicits._
    // 24 FULLY-DISJOINT docs (per-doc vocabulary — a shared tail would
    // mint accidental shared-shingle buckets) + a 6-doc boilerplate class
    // (identical text): the class shares one bucket per band — the skew
    // health must surface exactly it
    val docs = (0L until 24L).map(i => (i, fam(i, s"solo$i tail$i end$i")))
      .toDF("doc_id", "text").unionByName(
        (100L until 106L).map(i => (i, fam(99, "boilerplate body")))
          .toDF("doc_id", "text"))
    val idx = Files.createTempDirectory("lshhealth").toFile.getAbsolutePath
    LshIndex.build(docs, "doc_id", "text", idx, sigBuckets = 4)
    val top = LshIndex.health(s, idx, topK = 4).collect()
    assert(top.forall(_.getLong(2) == 6L),
      s"4 bands x one 6-doc boilerplate bucket must lead: ${top.mkString(",")}")

    val batch = batchDf(0L until 10L)
    val before = rows(LshIndex.screen(s, idx, docs, batch, "doc_id", "text", 0.5))
    LshIndex.reshard(s, idx, newSigBuckets = 16)
    val sbDirs = new java.io.File(s"$idx/sigs/band=0").listFiles()
      .count(_.getName.startsWith("sb="))
    assert(sbDirs > 4, s"grid must regrow: $sbDirs")
    assert(rows(LshIndex.screen(s, idx, docs, batch, "doc_id", "text", 0.5))
      === before, "resharding must be invisible to screens")
    // appends after the reshard derive the NEW grid
    LshIndex.appendBatch(s, idx, corpusDf(30).filter(col("doc_id") >= 24),
      "doc_id", "text", 1L)
    assert(LshIndex.signatures(s, idx).count() == (30L + 6L) * 4)

    // a crashed reshard's half-state (meta flipped, directory not swapped)
    // must REFUSE, not silently prune with the wrong modulus
    Seq((4, 3, 64)).toDF("bands", "shingle_size", "sig_buckets")
      .write.mode("overwrite").parquet(s"$idx/lsh_meta")
    val e = intercept[IllegalArgumentException](
      LshIndex.screen(s, idx, docs, batch, "doc_id", "text", 0.5))
    assert(e.getMessage.contains("re-run LshIndex.reshard"))
    // and reshard IS the documented repair
    LshIndex.reshard(s, idx, newSigBuckets = 64)
    assert(rows(LshIndex.screen(s, idx, docs, batch, "doc_id", "text", 0.5))
      === before)
  }

  test("every mutator routes through the shared index fence") {
    val s = spark
    val corpus = corpusDf(6)
    val idx = Files.createTempDirectory("lshfence").toFile.getAbsolutePath
    LshIndex.build(corpus, "doc_id", "text", idx)
    Similarity.withIndexMutation(s, idx, "holder") {
      def refused(f: => Unit): Unit =
        assertThrows[java.util.ConcurrentModificationException](f)
      refused(LshIndex.build(corpus, "doc_id", "text", idx))
      refused(LshIndex.append(s, idx, corpus, "doc_id", "text"))
      refused(LshIndex.appendBatch(s, idx, corpus, "doc_id", "text", 1L))
      refused(LshIndex.compactIngest(s, idx))
    }
    // fence released: mutations proceed again
    LshIndex.append(s, idx, corpusDf(8).filter(col("doc_id") >= 6),
      "doc_id", "text")
  }

  test("dedupAtIngest: accepted docs screen later batches; a replay never matches a doc against itself") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("lshingest").toFile.getAbsolutePath
    val corpus = corpusDf(10)
    corpus.write.parquet(s"$dir/accepted") // the corpus store the sink feeds
    val idx = s"$dir/idx"
    LshIndex.build(spark.read.parquet(s"$dir/accepted"), "doc_id", "text", idx,
      sigBuckets = 8)

    // one flat parquet file per micro-batch (file stream doesn't recurse)
    def writeBatch(rowsIn: Seq[(Long, String)], name: String): Unit = {
      rowsIn.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/stage/$name")
      val part = new java.io.File(s"$dir/stage/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/in").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/in/$name.parquet")): Unit
    }
    // batch 1: 100 near-dups corpus doc 0; 101 novel
    writeBatch(Seq(
      (100L, fam(0, "accepted corpus body CHANGED")),
      (101L, "novel unrelated first content with distinct words entirely one")), "b1")
    // batch 2: 200 near-dups batch 1's ACCEPTED doc 101 — only the
    // self-growing index can catch it; 201 novel
    writeBatch(Seq(
      (200L, "novel unrelated first content with distinct words entirely two"),
      (201L, "fresh disjoint second content nothing shared with anything else")), "b2")

    val verdicts = scala.collection.mutable.ArrayBuffer[(Long, Boolean, Any)]()
    val q = StreamAggs.dedupAtIngest(
        spark.readStream.schema("doc_id long, text string")
          .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
        idx, () => spark.read.parquet(s"$dir/accepted"),
        "doc_id", "text", threshold = 0.5) { (res, _) =>
        val rs = res.orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getBoolean(1), r.get(2)))
        verdicts.synchronized { verdicts ++= rs; () }
        // the ingest-pipeline contract: accepted docs become corpus
        res.filter(col("is_new")).select(col("doc_id"))
          .join(spark.read.parquet(s"$dir/in"), Seq("doc_id"))
          .select(col("doc_id"), col("text"))
          .write.mode("append").parquet(s"$dir/accepted"); ()
      }
      .option("checkpointLocation", s"$dir/chk").start()
    try {
      q.processAllAvailable()
      val byId = verdicts.synchronized { verdicts.toList }.map(v => v._1 -> v).toMap
      assert(byId(100L)._2 == false && byId(100L)._3 == 0L,
        s"100 near-dups corpus doc 0: $byId")
      assert(byId(101L)._2 == true)
      assert(byId(200L)._2 == false && byId(200L)._3 == 101L,
        s"200 must match batch 1's accepted doc through the index: $byId")
      assert(byId(201L)._2 == true)
    } finally q.stop()

    // crash-replay twin: re-running batch 2's body with its own
    // first-attempt signatures already in the index must yield the SAME
    // verdicts — the screen excludes b=<batchId>, so 201 cannot match its
    // own ghost (is_new would silently flip on every restart otherwise)
    val b2 = spark.read.parquet(s"$dir/in").filter(col("doc_id") >= 200)
    val replay = LshIndex.screen(s, idx, spark.read.parquet(s"$dir/accepted"),
      b2, "doc_id", "text", 0.5, excludeBatch = Some(1L))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(replay === Seq((200L, false), (201L, true)),
      s"replay with first-attempt signatures present must not self-match: $replay")
  }
}
