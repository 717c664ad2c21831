package graft

import graft.ops.{LshIndex, Multimodal, PhashIndex, Similarity, SqlOps}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The index-resident collision-density probes — the r14 postmortem (34%
  * accidental hamming≤2 matches on 4M near-uniform rasters) turned into a
  * BEFORE-the-fact dashboard: a dense corpus must report its danger from
  * the index alone, a differentiated one must read safe, the sampled
  * estimator must be EXACT when the cap covers every bucket and must
  * still recover heavy-bucket pair mass when it doesn't, and operators
  * must be able to LEARN a safe screening radius ([[PhashIndex
  * .safeMaxDist]]) instead of discovering an unsafe one in production.
  */
class IndexDensitySpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

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

  /** Brute-force ground truth from the hashes themselves: per-band bucket
    * census + the exact per-maxDist collision/match masses the estimator
    * claims to recover.
    */
  private def bruteDensity(rows: Seq[(Long, String)])
      : (Map[Int, (Long, Long, Long)], Map[Int, Double], Long) = {
    val hs = Multimodal.perceptualHash(imagesOf(rows), "img")
      .select("img_id", "dh0", "dh1", "dh2", "dh3").collect()
      .map(r => r.getLong(0) ->
        Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val perBand = (0 to 3).map { b =>
      val buckets = hs.values.groupBy(_(b)).map(_._2.size.toLong)
      b -> (hs.size.toLong, buckets.count(_ > 0).toLong,
        buckets.map(n => n * (n - 1) / 2).sum)
    }.toMap
    // matching collision mass per maxDist: for every band-colliding
    // unordered pair, its true 64-bit hamming (pairs colliding in k bands
    // count k times — candidate-join incidence units)
    val ids = hs.keys.toSeq.sorted
    val inc = for {
      i <- ids.indices; j <- (i + 1) until ids.size; b <- 0 to 3
      if hs(ids(i))(b) == hs(ids(j))(b)
    } yield (0 to 3).map(k =>
      Integer.bitCount(hs(ids(i))(k) ^ hs(ids(j))(k))).sum
    val mByDist = (0 to 4).map(d => d -> inc.count(_ <= d).toDouble).toMap
    (perBand, mByDist, hs.size.toLong)
  }

  test("phash densityByDist is exact when the cap covers every bucket; density matches the band census") {
    val s = spark
    // 6-copy flat class (one text, identical rasters) + 14 differentiated
    val rows = (0L until 6L).map(i => (i, longText(7))) ++
      (100L until 114L).map(i => (i, longText(i.toInt)))
    val idx = Files.createTempDirectory("phdens").toFile.getAbsolutePath
    PhashIndex.build(imagesOf(rows), "img_id", "img", idx, sigBuckets = 8)

    val (perBand, mByDist, n) = bruteDensity(rows)
    val bands = PhashIndex.density(s, idx).collect()
    assert(bands.length === 4)
    bands.foreach { r =>
      val (bn, buckets, cp) = perBand(r.getInt(0))
      assert(r.getLong(1) === bn, "n per band = corpus size")
      assert(r.getLong(2) === buckets)
      assert(r.getLong(3) === cp, "collision_pairs must be the exact census")
      assert(math.abs(r.getDouble(4) - 2.0 * cp / (bn * (bn - 1.0))) < 1e-9)
      assert(math.abs(r.getDouble(5) - 2.0 * cp / bn) < 1e-9)
    }

    val totalCp = perBand.values.map(_._3).sum
    val byDist = PhashIndex.densityByDist(s, idx, perBucketCap = 64,
      maxDist = 4).collect()
    assert(byDist.length === 5)
    byDist.foreach { r =>
      val k = r.getInt(0)
      assert(r.getLong(1) === totalCp)
      assert(r.getLong(2) === totalCp,
        "cap >= every bucket: all collision pairs measured")
      assert(math.abs(r.getDouble(3) - mByDist(k) / totalCp) < 1e-8,
        s"p_match_given_collision exact at d=$k")
      assert(math.abs(r.getDouble(4) - 2.0 * mByDist(k) / n) < 1e-8,
        s"implied_matches_per_probe exact at d=$k")
    }
    // the 6-copy flat class alone contributes 4·C(6,2)=60 d=0 incidences:
    // the dashboard must read DANGEROUS on this corpus at every radius
    assert(byDist.head.getDouble(4) >= 2.0 * 60 / n,
      "the flat class's quadratic pair mass must surface at d=0")
  }

  test("capped sampling recovers heavy-bucket pair mass; dense reads dangerous, differentiated reads safe; safeMaxDist learns the radius") {
    val s = spark
    // DENSE: one 12-copy flat class + 8 differentiated
    val dense = (0L until 12L).map(i => (i, longText(3))) ++
      (100L until 108L).map(i => (i, longText(i.toInt)))
    val dIdx = Files.createTempDirectory("phdense").toFile.getAbsolutePath
    PhashIndex.build(imagesOf(dense), "img_id", "img", dIdx, sigBuckets = 8)
    // cap 4 < the 12-row flat buckets: sampled_pairs < collision_pairs,
    // but the weighted estimate still recovers the full d=0 mass (every
    // flat-bucket pair is hamming 0, so the weight telescopes exactly)
    val est = PhashIndex.densityByDist(s, dIdx, perBucketCap = 4,
      maxDist = 0).collect()(0)
    assert(est.getLong(2) < est.getLong(1),
      "cap below bucket size must actually sample")
    assert(est.getDouble(4) >= 2.0 * 4 * (12 * 11 / 2) / 20.0 - 1e-6,
      "weighting must keep the flat class's quadratic mass in the estimate")
    assert(PhashIndex.safeMaxDist(s, dIdx, maxImpliedPerProbe = 1.0).isEmpty,
      "a corpus whose flat class floods even d=0 has NO safe radius")

    // DIFFERENTIATED: 20 distinct rasters — near-zero accidental mass
    val diff = (0L until 20L).map(i => (i, longText(i.toInt)))
    val sIdx = Files.createTempDirectory("phsafe").toFile.getAbsolutePath
    PhashIndex.build(imagesOf(diff), "img_id", "img", sIdx, sigBuckets = 8)
    val safe = PhashIndex.densityByDist(s, sIdx, perBucketCap = 64,
      maxDist = 3).collect()
    assert(safe.map(_.getDouble(4)).max <= 0.5,
      "a differentiated corpus must read safe at every radius <= 3")
    assert(PhashIndex.safeMaxDist(s, sIdx, maxImpliedPerProbe = 0.5)
      === Some(3), "the full banding-recall radius is safe here")
    assert(safe.map(_.getDouble(3)).toSeq === safe.map(_.getDouble(3))
      .toSeq.sorted, "rates are cumulative in d")
  }

  test("screenAuto learns the radius and refuses an unsafe corpus loudly; SQL leg identical") {
    val s = spark
    import s.implicits._
    // safe corpus: differentiated rasters → learned radius = 3
    val corpus = (0L until 20L).map(i => (i, longText(i.toInt)))
    val idx = Files.createTempDirectory("phauto").toFile.getAbsolutePath
    PhashIndex.build(imagesOf(corpus), "img_id", "img", idx, sigBuckets = 8)
    val batch = (0L until 3L).map(i => (100L + i, longText(i.toInt))) ++
      (0L until 3L).map(i => (200L + i, longText(500 + i.toInt)))
    val auto = PhashIndex.screenAuto(s, idx, imagesOf(batch), "img_id", "img",
      maxImpliedPerProbe = 0.5, perBucketCap = 64)
    assert(auto.select("max_dist").distinct().collect().map(_.getInt(0))
      .toSeq === Seq(3), "a differentiated corpus earns the full radius")
    val manual = PhashIndex.screen(s, idx, imagesOf(batch), "img_id", "img",
      maxDist = 3).withColumn("max_dist", lit(3))
    assert(auto.collect().sortBy(_.getLong(0)).toSeq ===
      manual.collect().sortBy(_.getLong(0)).toSeq,
      "screenAuto IS screen at the learned radius")
    // SQL leg: same verdicts through the TVF
    SqlOps.register(s)
    imagesOf(batch).createOrReplaceTempView("auto_batch")
    assert(s.sql(s"SELECT * FROM phash_screen_auto('$idx', 'auto_batch', " +
        "'img_id', 'img', 0.5D)").collect().sortBy(_.getLong(0)).toSeq ===
      auto.collect().sortBy(_.getLong(0)).toSeq)

    // unsafe corpus: a 12-copy flat class floods even d=0 at budget 0.1
    val flat = (0L until 12L).map(i => (i, longText(3))) ++
      (100L until 104L).map(i => (i, longText(i.toInt)))
    val fIdx = Files.createTempDirectory("phautoflat").toFile.getAbsolutePath
    PhashIndex.build(imagesOf(flat), "img_id", "img", fIdx, sigBuckets = 8)
    val e = intercept[IllegalStateException] {
      PhashIndex.screenAuto(s, fIdx, imagesOf(batch), "img_id", "img",
        maxImpliedPerProbe = 0.1, perBucketCap = 64)
    }
    assert(e.getMessage.contains("exact-dedup or cap it upstream"),
      s"the refusal must name the remedy, got: ${e.getMessage}")
  }

  test("lsh family density: a planted duplicate class dominates collision mass; unique texts read near zero") {
    val s = spark
    import s.implicits._
    val docs = ((0L until 10L).map(i => (i, longText(42))) ++
      (100L until 130L).map(i => (i, longText(i.toInt))))
      .toDF("doc_id", "text")
    val idx = Files.createTempDirectory("lshdens").toFile.getAbsolutePath
    LshIndex.build(docs, "doc_id", "text", idx, sigBuckets = 8)
    val d = LshIndex.density(s, idx).collect()
    assert(d.length === 4)
    d.foreach { r =>
      assert(r.getLong(1) === 40L, "n per band = corpus size")
      assert(r.getLong(3) >= 45L,
        "the 10-copy class is >= C(10,2) pairs in every band")
      assert(math.abs(r.getDouble(5) - 2.0 * r.getLong(3) / 40.0) < 1e-9)
    }
    // wide vocabulary → near-disjoint shingle sets (longText's 6-word
    // vocab makes every doc share most shingles, and minhash RIGHTLY
    // reports that corpus as dense — which is the other test's point)
    def wideText(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      (0 until 80).map(_ => s"t${rnd.nextInt(100000)}").mkString(" ")
    }
    val unique = (200L until 240L).map(i => (i, wideText(i.toInt)))
      .toDF("doc_id", "text")
    val uIdx = Files.createTempDirectory("lshuniq").toFile.getAbsolutePath
    LshIndex.build(unique, "doc_id", "text", uIdx, sigBuckets = 8)
    assert(LshIndex.density(s, uIdx).collect().map(_.getLong(3)).max <= 2L,
      "distinct texts must carry near-zero collision mass")
  }

  test("density is fingerprint-agnostic: an audio-fingerprint index reads through the same dashboard") {
    val s = spark
    import s.implicits._
    // 8-copy audio dup class (identical clips -> identical energy-contour
    // fingerprints) + 8 differentiated clips
    val rows = (0L until 8L).map(i => (i, longText(5))) ++
      (100L until 108L).map(i => (i, longText(i.toInt)))
    val fp = Multimodal.audioFingerprint(Multimodal.synthAudio(
      Multimodal.pack(rows.toDF("doc_id", "text"), "doc_id", "text", "raw")))
    val idx = Files.createTempDirectory("afdens").toFile.getAbsolutePath
    PhashIndex.buildHashed(fp, "media_id", Seq("af0", "af1", "af2", "af3"),
      idx, sigBuckets = 8)
    val bands = PhashIndex.density(s, idx).collect()
    assert(bands.length === 4)
    assert(bands.map(_.getLong(3)).min >= 28L,
      "the 8-copy clip class is >= C(8,2) pairs in every band")
    val d0 = PhashIndex.densityByDist(s, idx, perBucketCap = 64,
      maxDist = 0).collect()(0)
    assert(d0.getDouble(4) >= 2.0 * 4 * 28 / 16.0 - 1e-9,
      "the flat clip class's d=0 mass must surface for audio exactly as for images")
    assert(PhashIndex.safeMaxDist(s, idx, maxImpliedPerProbe = 1.0).isEmpty,
      "a corpus of identical clips has no safe screening radius")
  }

  test("ivf density: collapsed index saturates toward 1, balanced grid sits near 1/nlist; TVFs equal the APIs") {
    val s = spark
    import s.implicits._
    def unit(k: Int): Seq[Double] =
      (0 until 64).map(j => if (j == k) 1.0 else 0.0)
    // balanced: 4 tight clusters of 25 on distinct axes
    val bal = (0L until 100L).map(i => (i, unit((i % 4).toInt)))
      .toDF("vec_id", "embedding")
    val bIdx = Files.createTempDirectory("ivfdbal").toFile.getAbsolutePath
    Similarity.buildIvfIndex(bal, "vec_id", "embedding", bIdx, nlist = 4,
      centroids = Some((0L until 4L).map(i => (i, unit(i.toInt)))
        .toDF("cent_id", "cent")))
    val b = Similarity.ivfIndexDensity(s, bIdx).collect()(0)
    assert(b.getLong(0) === 100L && b.getLong(1) === 4L)
    assert(b.getLong(2) === 4L * (25 * 24 / 2))
    assert(math.abs(b.getDouble(3) - 1200.0 / 4950.0) < 1e-9,
      "balanced 4-cell grid: collision_prob ~ 1/nlist")
    assert(math.abs(b.getDouble(4) - 24.0) < 1e-9,
      "a probe scans its own 25-row cell")
    // collapsed: every vector on ONE axis -> one occupied cell, prob 1
    val col0 = (0L until 50L).map(i => (i, unit(0))).toDF("vec_id", "embedding")
    val cIdx = Files.createTempDirectory("ivfdcol").toFile.getAbsolutePath
    Similarity.buildIvfIndex(col0, "vec_id", "embedding", cIdx, nlist = 4,
      centroids = Some((0L until 4L).map(i => (i, unit(i.toInt)))
        .toDF("cent_id", "cent")))
    val c = Similarity.ivfIndexDensity(s, cIdx).collect()(0)
    assert(c.getLong(1) === 1L && c.getDouble(3) === 1.0,
      "a collapsed index must read collision_prob 1")

    // SQL surface: the three density TVFs are the APIs verbatim
    SqlOps.register(s)
    assert(s.sql(s"SELECT * FROM ivf_index_density('$bIdx')").collect()
      .toSeq === Seq(b))
    val lIdx = Files.createTempDirectory("lshdtvf").toFile.getAbsolutePath
    LshIndex.build((0L until 20L).map(i => (i, longText(i.toInt)))
      .toDF("doc_id", "text"), "doc_id", "text", lIdx, sigBuckets = 8)
    assert(s.sql(s"SELECT * FROM lsh_index_density('$lIdx')").collect()
      .toSeq === LshIndex.density(s, lIdx).collect().toSeq)
    val pIdx = Files.createTempDirectory("phdtvf").toFile.getAbsolutePath
    PhashIndex.build(imagesOf((0L until 10L).map(i => (i, longText(i.toInt)))),
      "img_id", "img", pIdx, sigBuckets = 8)
    assert(s.sql(s"SELECT * FROM phash_index_density('$pIdx', 8, 3)")
      .collect().toSeq === PhashIndex.densityByDist(s, pIdx, 8, 3)
      .collect().toSeq)
    assert(s.sql(s"SELECT * FROM phash_index_density('$pIdx')").collect()
      .toSeq === PhashIndex.density(s, pIdx).collect().toSeq)
  }
}
