package graft.tools

import graft.ops.{Multimodal, PhashIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the persisted perceptual-hash index — the claim
  * under test is the index's 100 TB cost model: a screening batch decodes
  * ONLY ITSELF and reads O(batch × bands) pruned buckets, so screen cost
  * must be a small fraction of (re-)building, independent of how the
  * corpus got into the index (build + append + streaming ingest).
  *
  * Legs, at PH_DOCS images (default 400k) + two 50k ingest batches:
  *  1. build (decode + hash + 4×grid partitioned write)
  *  2. appendBatch b=1 → compact (file moves), appendBatch b=2 (stays in
  *     ingest — the screen must read the union)
  *  3. screen a 5k probe with PLANTED verdicts asserted exactly: ids
  *     ≡ 0 (mod 5) re-emit a corpus text (exact dup, hamming 0, must
  *     match), the rest are novel formulas (must be new)
  *  4. health census (the flat/boilerplate skew dashboard)
  *  5. forget a 10k sliver (staged rewrite + swap), re-screen: probes
  *     whose match was forgotten flip to new
  *
  * Fences: exact verdict counts, exact forget row count (4 rows/image),
  * and screen wall ≤ half the build wall (the O(probe) claim — generous
  * because localized JVM/IO noise shouldn't flake the smoke; the real
  * margin observed is ~10×).
  */
object PhashIndexScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("PH_DOCS", "400000").toInt
    val nIngest = sys.env.getOrElse("PH_INGEST", "50000").toInt
    val nProbe = sys.env.getOrElse("PH_PROBE", "5000").toInt
    val idx = java.nio.file.Files.createTempDirectory("phscale").toFile
      .getAbsolutePath + "/idx"

    def time[A](name: String)(f: => A): (A, Double) = {
      val s0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - s0) / 1e9
      println(f"PHSCALE $name%-44s $sec%.2f s"); (r, sec)
    }
    // the MultimodalScaleSmoke text fixture: 40 seeded-hash tokens padded
    // past one full raster; distinct ids → distinct rasters
    def textOf(idc: org.apache.spark.sql.Column) = {
      val formula40 = concat_ws(" ", (0 until 40).map { j =>
        concat(lit("w"), pmod(xxhash64(idc * 31 + j), lit(5000)))
      }: _*)
      rpad(formula40, lit(1400), formula40)
    }
    def imagesOf(ids: org.apache.spark.sql.DataFrame) =
      Multimodal.synthImages(Multimodal.pack(
          ids.select(col("id").as("doc_id"), textOf(col("content_id")).as("text")),
          "doc_id", "text", "raw"), format = "bmp")
        .select(col("media_id").as("img_id"), col("img"))

    def slab(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id"), col("id").as("content_id"))

    val (_, tBuild) = time(s"build index ($n images)") {
      PhashIndex.build(imagesOf(slab(0, n)), "img_id", "img", idx,
        sigBuckets = 64)
    }
    time(s"appendBatch b=1 ($nIngest images)") {
      PhashIndex.appendBatch(spark, idx,
        imagesOf(slab(n, n + nIngest)), "img_id", "img", 1L)
    }
    time("compactIngest (file moves)") { PhashIndex.compactIngest(spark, idx) }
    time(s"appendBatch b=2 ($nIngest, stays in ingest)") {
      PhashIndex.appendBatch(spark, idx,
        imagesOf(slab(n + nIngest, n + 2L * nIngest)), "img_id", "img", 2L)
    }

    // probe: id ≡ 0 (mod 5) re-emits corpus content (id/5), including some
    // from both ingest batches; the rest are novel high-range formulas
    val probe = spark.range(9000000L, 9000000L + nProbe).select(col("id"),
      when(col("id") % 5 === 0, (col("id") % (n + 2L * nIngest)))
        .otherwise(col("id")).as("content_id"))
    val expDup = (0 until nProbe).count(i => (9000000L + i) % 5 == 0)
    val (verdicts, tScreen) = time(s"screen ($nProbe probes)") {
      val v = PhashIndex.screen(spark, idx, imagesOf(probe), "img_id", "img",
        maxDist = 2).localCheckpoint()
      require(v.count() == nProbe.toLong, "one verdict per probe"); v
    }
    // structural fences only: every PLANTED dup must match (hamming 0 —
    // banding recall is total), and its min-match can never exceed its
    // source id (the source IS a candidate). Novel probes may legitimately
    // catch accidental hamming≤2 neighbors in a 500k random-image corpus
    // (the measured N²/65536 collision term), so their count is REPORTED,
    // not fenced.
    val planted = verdicts.filter(col("img_id") % 5 === 0)
    require(planted.filter(col("is_new")).count() == 0,
      "every planted exact dup must match")
    require(planted.filter(
        col("match_id") > col("img_id") % (n + 2L * nIngest)).count() == 0,
      "a planted probe's min-match cannot exceed its own source image")
    val accidental = verdicts.filter(!col("is_new")).count() - expDup
    println(s"PHSCALE planted dups matched: $expDup; accidental hamming<=2 " +
      s"matches among novel probes: $accidental")
    println(f"PHSCALE screen/build wall ratio: ${tScreen / tBuild}%.3f")
    require(tScreen <= tBuild / 2,
      f"screen must be O(probe), got ${tScreen}%.1f s vs build ${tBuild}%.1f s")

    val (top, _) = time("health census (top 5)") {
      PhashIndex.health(spark, idx, topK = 5).collect().toSeq
    }
    println(s"PHSCALE heaviest buckets: ${top.mkString(", ")}")
    // the accidental-match dashboard at tier scale: the sampled estimator
    // must agree with the measured novel-probe accidental rate (the r14
    // postmortem number, now index-resident) within estimator noise
    val (dens, _) = time("densityByDist (cap 8, d<=2)") {
      PhashIndex.densityByDist(spark, idx, perBucketCap = 8, maxDist = 2)
        .collect().toSeq
    }
    dens.foreach(r => println(f"PHSCALE density d<=${r.getInt(0)}: " +
      f"p|coll=${r.getDouble(3)}%.6f implied/probe=${r.getDouble(4)}%.6f"))
    // different units by design: the probe experiment measures P(>=1
    // match) per novel probe; the index implies E[matched candidates] per
    // probe (clustered dup classes push E far above P(>=1))
    val measuredRate = accidental.toDouble / (nProbe - expDup)
    val implied2 = dens.last.getDouble(4)
    println(f"PHSCALE novel-probe P(>=1 accidental match): $measuredRate%.4f; " +
      f"index-implied E[matches<=d2]/probe: $implied2%.4f")
    val safe = PhashIndex.safeMaxDist(spark, idx, maxImpliedPerProbe = 0.5)
    println(s"PHSCALE safeMaxDist(budget 0.5/probe): $safe")

    import spark.implicits._
    val (removed, _) = time("forget 10k sliver (staged rewrite + swap)") {
      PhashIndex.forget(spark, idx, (0L until 10000L).toDF("img_id"), "img_id")
    }
    require(removed == 40000L, s"10k images × 4 band rows, got $removed")
    val (post, _) = time("re-screen after forget") {
      PhashIndex.screen(spark, idx, imagesOf(probe), "img_id", "img",
        maxDist = 2).localCheckpoint()
    }
    // planted probes whose source SURVIVED must still match (structural);
    // those whose source was forgotten are reported (they may retain an
    // accidental neighbor — erasure semantics are exact-pinned in
    // PhashIndexSpec; the smoke fences the maintenance verbs at tier scale)
    val surviving = post.filter(col("img_id") % 5 === 0 &&
      col("img_id") % (n + 2L * nIngest) >= 10000L)
    require(surviving.filter(col("is_new")).count() == 0,
      "planted dups of surviving images must still match after forget")
    val flipped = post.filter(col("img_id") % 5 === 0 &&
      col("img_id") % (n + 2L * nIngest) < 10000L && col("is_new")).count()
    println(s"PHSCALE forgotten-source probes now new: $flipped")
    println("PHSCALE OK")
    spark.stop()
  }
}
