package graft

import graft.ops.{LshIndex, Multimodal, PhashIndex}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted perceptual-hash index — the image twin of LshIndexSpec:
  * screen equivalence with BRUTE-FORCE Hamming (the banding recall claim),
  * lifecycle write-path invisibility, index-resident verify (no corpus
  * re-read), forget/reshard maintenance, and protocol parity with the
  * other two IndexLifecycle families.
  */
class PhashIndexSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  // > 1152 chars = one full 36×32 raster, so single-byte edits perturb
  // single pixels (the MultimodalSpec fixture)
  private def longText(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    (0 until 260).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
  }

  private def imagesOf(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    Multimodal.synthImages(Multimodal.pack(
        rows.toDF("doc_id", "text"), "doc_id", "text", "image/gray"))
      .select(col("media_id").as("img_id"), col("img"))
  }

  private def corpusRows: Seq[(Long, String)] =
    (0L until 20L).map(i => (i, longText(i.toInt)))

  // batch: exact dups of corpus 0..4 (hamming 0), noise dups of corpus
  // 5..9 ('e'→'f' shifts box means by ≤1 — tiny gradient hamming), and
  // fresh images that should screen as new
  private def batchRows: Seq[(Long, String)] =
    (0L until 5L).map(i => (100L + i, longText(i.toInt))) ++
      (5L until 10L).map(i => (200L + i, longText(i.toInt).replace('e', 'f'))) ++
      (0L until 5L).map(i => (300L + i, longText(900 + i.toInt)))

  /** Brute-force ground truth: hash both sides, exact Hamming in Scala. */
  private def bruteScreen(corpus: Seq[(Long, String)],
      batch: Seq[(Long, String)], maxDist: Int): Map[Long, Option[Long]] = {
    def hashes(rows: Seq[(Long, String)]): Map[Long, Array[Int]] =
      Multimodal.perceptualHash(imagesOf(rows), "img")
        .select("img_id", "dh0", "dh1", "dh2", "dh3").collect()
        .map(r => r.getLong(0) -> Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
        .toMap
    val (ch, bh) = (hashes(corpus), hashes(batch))
    bh.map { case (bId, b) =>
      val matches = ch.filter { case (_, c) =>
        (0 to 3).map(k => Integer.bitCount(b(k) ^ c(k))).sum <= maxDist
      }.keys
      bId -> (if (matches.isEmpty) None else Some(matches.min))
    }
  }

  private def screenMap(df: DataFrame): Map[Long, Option[Long]] =
    df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

  test("persisted screen equals brute-force hamming; verify is index-resident; the scan prunes") {
    val s = spark
    val idx = Files.createTempDirectory("phidx").toFile.getAbsolutePath
    PhashIndex.build(imagesOf(corpusRows), "img_id", "img", idx, sigBuckets = 8)

    val got = PhashIndex.screen(s, idx, imagesOf(batchRows), "img_id", "img",
      maxDist = 3)
    assert(screenMap(got) === bruteScreen(corpusRows, batchRows, 3),
      "banded screen must equal exact hamming (total recall at maxDist 3)")
    val matched = got.filter(!col("is_new")).count()
    assert(matched >= 5, s"the 5 exact dups must match (got $matched)")
    assert(got.filter(col("is_new")).count() >= 5, "fresh images stay new")

    // 4 band partitions on disk; candidates push a literal partition filter
    val bandDirs = new java.io.File(s"$idx/sigs").listFiles()
      .filter(_.getName.startsWith("band=")).map(_.getName).toSet
    assert(bandDirs.size == 4, s"expected 4 band partitions, got $bandDirs")
    // a SMALL probe (pruning's reason to exist); a probe reaching every
    // grid bucket rightly skips the filter (candidatesJoin's full-grid cap)
    val cand = PhashIndex.candidates(s, idx, imagesOf(batchRows.take(3)),
      "img_id", "img", maxDist = 3)
    assert(cand.count() > 0)
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
        """\(band#\d+ = \d""".r.findFirstIn(plan).isDefined,
      "the candidate join must push a literal (band, sb) partition filter:\n" +
        plan.take(2000))
    assert(!plan.contains("img#"),
      "the verify must be index-resident: no image column anywhere in the " +
        "candidate plan (the probe was hashed before the join; the corpus " +
        "is never read at all)")
  }

  test("full lifecycle (build + append + ingest + compact + ingest) screens like a one-shot build") {
    val s = spark
    val all = corpusRows
    val oneShot = Files.createTempDirectory("phone").toFile.getAbsolutePath
    PhashIndex.build(imagesOf(all), "img_id", "img", oneShot, sigBuckets = 8)

    val staged = Files.createTempDirectory("phlife").toFile.getAbsolutePath
    PhashIndex.build(imagesOf(all.take(5)), "img_id", "img", staged, sigBuckets = 8)
    PhashIndex.append(s, staged, imagesOf(all.slice(5, 10)), "img_id", "img")
    PhashIndex.appendBatch(s, staged, imagesOf(all.slice(10, 15)), "img_id",
      "img", 1L)
    PhashIndex.compactIngest(s, staged)
    PhashIndex.appendBatch(s, staged, imagesOf(all.slice(15, 20)), "img_id",
      "img", 2L) // stays in ingest: the screen reads the union
    assert(new java.io.File(s"$staged/ingest").exists())

    val batch = imagesOf(batchRows)
    val a = screenMap(PhashIndex.screen(s, oneShot, batch, "img_id", "img", 3))
    val b = screenMap(PhashIndex.screen(s, staged, batch, "img_id", "img", 3))
    assert(a === b, "write-path history must be invisible to the screen")
    assert(PhashIndex.signatures(s, staged).count() ===
      PhashIndex.signatures(s, oneShot).count())
  }

  test("forget erases hash rows: the screen equals an index built on the survivors") {
    val s = spark
    import s.implicits._
    val idx = Files.createTempDirectory("phforget").toFile.getAbsolutePath
    PhashIndex.build(imagesOf(corpusRows), "img_id", "img", idx, sigBuckets = 8)
    // forget exactly the corpus ids the batch's planted dups point at
    val victims = (0L until 10L).toDF("img_id")
    val removed = PhashIndex.forget(s, idx, victims, "img_id")
    assert(removed === 40L, s"10 images × 4 band rows, got $removed")

    val survivors = corpusRows.filter(_._1 >= 10L)
    val fresh = Files.createTempDirectory("phsurv").toFile.getAbsolutePath
    PhashIndex.build(imagesOf(survivors), "img_id", "img", fresh, sigBuckets = 8)
    val batch = imagesOf(batchRows)
    assert(screenMap(PhashIndex.screen(s, idx, batch, "img_id", "img", 3)) ===
      screenMap(PhashIndex.screen(s, fresh, batch, "img_id", "img", 3)),
      "post-forget the index must behave as if built on the survivors")
    // every planted dup pointed at a forgotten id — all must now be new
    assert(PhashIndex.screen(s, idx, batch, "img_id", "img", 3)
      .filter(!col("is_new")).count() === 0)
  }

  test("reshard regrids without changing screen results; health surfaces the planted hot bucket") {
    val s = spark
    val idx = Files.createTempDirectory("phreshard").toFile.getAbsolutePath
    // plant a hot bucket: 6 copies of one image (same hash, all 4 bands)
    val planted = corpusRows ++ (0L until 6L).map(i => (500L + i, longText(7)))
    PhashIndex.build(imagesOf(planted), "img_id", "img", idx, sigBuckets = 4)
    val batch = imagesOf(batchRows)
    val before = screenMap(PhashIndex.screen(s, idx, batch, "img_id", "img", 3))

    PhashIndex.reshard(s, idx, newSigBuckets = 16)
    assert(screenMap(PhashIndex.screen(s, idx, batch, "img_id", "img", 3)) ===
      before, "sb is a pure function of sig — a regrid must not change results")
    val sbDirs = new java.io.File(s"$idx/sigs/band=0").listFiles()
      .filter(_.getName.startsWith("sb=")).map(_.getName).toSet
    assert(sbDirs.forall(d => d.stripPrefix("sb=").toInt < 16))

    val top = PhashIndex.health(s, idx, topK = 1).collect()(0)
    assert(top.getLong(2) >= 7L,
      s"the planted 7-image class must top the census, got $top")
  }

  test("imageDedupAtIngest: accepted images screen later batches; a replay never self-matches") {
    val s = spark
    import graft.streaming.StreamAggs
    val dir = Files.createTempDirectory("phingest").toFile.getAbsolutePath
    val idx = s"$dir/idx"
    PhashIndex.build(imagesOf(corpusRows.take(10)), "img_id", "img", idx,
      sigBuckets = 8)

    def writeBatch(rowsIn: Seq[(Long, String)], name: String): Unit = {
      imagesOf(rowsIn).coalesce(1).write.parquet(s"$dir/stage/$name")
      val part = new java.io.File(s"$dir/stage/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/in").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/in/$name.parquet")): Unit
    }
    // batch 1: 100 = exact dup of corpus image 0; 101 novel
    writeBatch(Seq((100L, longText(0)), (101L, longText(500))), "b1")
    // batch 2: 200 dups batch 1's ACCEPTED image 101 — only the
    // self-growing index catches it; 201 novel
    writeBatch(Seq((200L, longText(500)), (201L, longText(600))), "b2")

    val verdicts = scala.collection.mutable.ArrayBuffer[(Long, Boolean, Any)]()
    val q = StreamAggs.imageDedupAtIngest(
        s.readStream.schema("img_id long, img binary")
          .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
        idx, "img_id", "img", maxDist = 3) { (res, _) =>
        val rs = res.orderBy("img_id").collect()
          .map(r => (r.getLong(0), r.getBoolean(1), r.get(2)))
        verdicts.synchronized { verdicts ++= rs; () }
      }
      .option("checkpointLocation", s"$dir/chk").start()
    try {
      q.processAllAvailable()
      val byId = verdicts.synchronized { verdicts.toList }.map(v => v._1 -> v).toMap
      assert(byId(100L)._2 == false && byId(100L)._3 == 0L,
        s"100 dups corpus image 0: $byId")
      assert(byId(101L)._2 == true)
      assert(byId(200L)._2 == false && byId(200L)._3 == 101L,
        s"200 must match batch 1's accepted image through the index: $byId")
      assert(byId(201L)._2 == true)
    } finally q.stop()

    // crash-replay twin: re-screening batch 2 with its own first-attempt
    // hashes in the index must yield the SAME verdicts (b=1 excluded)
    val b2 = imagesOf(Seq((200L, longText(500)), (201L, longText(600))))
    val replay = PhashIndex.screen(s, idx, b2, "img_id", "img", 3,
        excludeBatch = Some(1L))
      .orderBy("img_id").collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(replay === Seq((200L, false), (201L, true)),
      s"replay with first-attempt hashes present must not self-match: $replay")
  }

  test("phash family joins the shared lifecycle protocol with byte-identical refusals") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("phproto").toFile.getAbsolutePath

    val ph = s"$dir/ph"
    PhashIndex.build(imagesOf(corpusRows), "img_id", "img", ph, sigBuckets = 8)
    PhashIndex.appendBatch(s, ph, imagesOf(Seq((800L, longText(800)))),
      "img_id", "img", 5L)
    PhashIndex.compactIngest(s, ph)
    PhashIndex.appendBatch(s, ph, imagesOf(Seq((801L, longText(801)))),
      "img_id", "img", 7L)
    PhashIndex.compactIngest(s, ph) // prunes marker 5, retains 7
    assert(!PhashIndex.batchFolded(s, ph, 5L) && PhashIndex.batchFolded(s, ph, 7L))
    val before = PhashIndex.signatures(s, ph).count()
    val ePh = intercept[IllegalStateException] {
      PhashIndex.appendBatch(s, ph, imagesOf(Seq((802L, longText(802)))),
        "img_id", "img", 3L)
    }
    assert(ePh.getMessage.contains("resetIngestFolded"))
    assert(PhashIndex.signatures(s, ph).count() === before,
      "a refused append must leave the index untouched")
    assert(!new java.io.File(s"$ph/_mutating").exists(),
      "the fence must release after a refused append")
    // replay of the RETAINED max marker is the legitimate idempotent skip
    PhashIndex.appendBatch(s, ph, imagesOf(Seq((801L, longText(801)))),
      "img_id", "img", 7L)
    assert(PhashIndex.signatures(s, ph).count() === before)
    // the sanctioned repair, then the restarted id sequence lands
    PhashIndex.resetIngestFolded(s, ph)
    PhashIndex.appendBatch(s, ph, imagesOf(Seq((803L, longText(803)))),
      "img_id", "img", 0L)
    assert(PhashIndex.signatures(s, ph).count() === before + 4)

    // PARITY with the text family: same exception, same message up to path
    val lsh = s"$dir/lsh"
    LshIndex.build((0L until 10L).map(i => (i, longText(i.toInt)))
      .toDF("doc_id", "text"), "doc_id", "text", lsh, sigBuckets = 8)
    LshIndex.appendBatch(s, lsh, Seq((900L, longText(900)))
      .toDF("doc_id", "text"), "doc_id", "text", 7L)
    LshIndex.compactIngest(s, lsh)
    val eLsh = intercept[IllegalStateException] {
      LshIndex.appendBatch(s, lsh, Seq((901L, longText(901)))
        .toDF("doc_id", "text"), "doc_id", "text", 3L)
    }
    def shape(m: String) = m.replaceAll(s"index at \\S+:", "index at <path>:")
    assert(shape(ePh.getMessage) === shape(eLsh.getMessage),
      "one protocol, three tables: the refusals must be identical up to the path")

    // pending-build refusal: a manufactured half-done build refuses reads
    val half = s"$dir/half"
    PhashIndex.build(imagesOf(corpusRows.take(3)), "img_id", "img", half,
      sigBuckets = 4)
    new java.io.File(s"$half/_pending_build").createNewFile()
    val eHalf = intercept[IllegalStateException] {
      PhashIndex.screen(s, half, imagesOf(batchRows.take(2)), "img_id", "img", 3)
    }
    assert(eHalf.getMessage.contains("build"),
      s"half-done build must refuse loudly: ${eHalf.getMessage}")
  }
}
