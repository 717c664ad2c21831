package graft.tools

import graft.ops.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the image family: synthesize → REAL encode (BMP) →
  * REAL decode (javax.imageio) → perceptual hash → banded near-dup pairs,
  * at two corpus sizes, with planted structure asserted exactly:
  *
  *  - near-dup pairs: id ≡ 1 (mod 10) re-emits id−1's text with ONE char
  *    incremented — texts are > 1152 chars (one full 36×32 raster), so
  *    exactly one pixel moves by 1, at most one 4×4 box mean moves by 1,
  *    and the pair's dHash hamming is ≤ 2: banding recall is TOTAL at
  *    maxDist 3, so EVERY planted pair must surface.
  *  - a flat class: id ≡ 0 (mod 997) is one repeated char — a constant
  *    raster, the all-zero-gradient dHash. All flat images share every
  *    band word, so they form ONE hot bucket per band and exactly
  *    C(nFlat, 2) pairs at dist 0 — the boilerplate-skew shape
  *    (blank/template images) measured, not hidden: candidate expansion
  *    is quadratic IN THE BUCKET, which is why a production corpus caps
  *    or exact-dedups the flat class upstream (same remedy as text LSH).
  *
  * The fence is on the per-image DECODE+HASH cost (must stay ~linear —
  * that is the 100 TB bottleneck, one kernel call per image); the pair
  * join's candidate volume is reported, not fenced: with 16-bit bands it
  * carries an N²/65536-per-band random-collision term by construction
  * (the documented banding trade, same as d10's simhash analysis).
  */
object MultimodalScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nBig = sys.env.getOrElse("MM_DOCS", "500000").toInt
    val nBase = sys.env.getOrElse("MM_BASE_DOCS", "100000").toInt

    def scenario(n: Int, tag: String): Double = {
      def time[A](name: String)(f: => A): (A, Double) = {
        val s0 = System.nanoTime(); val r = f
        val sec = (System.nanoTime() - s0) / 1e9
        println(f"MMSCALE[$tag] $name%-40s $sec%.2f s"); (r, sec)
      }
      // 40 seeded-hash tokens cyclically padded past one full raster
      // (> 1152 chars — the one-pixel property). 200 inline terms blew the
      // codegen 64 KB method limit into interpreted mode; 40 + rpad stays
      // whole-stage-compiled.
      val formula40 = concat_ws(" ", (0 until 40).map { j =>
        val base = when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id"))
        concat(lit("w"), pmod(xxhash64(base * 31 + j), lit(5000)))
      }: _*)
      val formula = rpad(formula40, lit(1400), formula40)
      val oneOff = concat(substring(formula, 1, 599),
        // char 600 incremented: one raster pixel moves by exactly 1
        chr(ascii(substring(formula, 600, 1)) + 1),
        substring(formula, 601, 2000))
      val flat = repeat(lit("x"), 1200)
      val text = when(col("id") % 997 === 0, flat)
        .when(col("id") % 10 === 1, oneOff)
        .otherwise(formula)
      // materialize the synthetic corpus OFF the measured path: the text
      // expression duplicates the formula subtree ~5× (substring edits),
      // which overflows one codegen method into interpreted mode — fixture
      // cost, not engine cost, so it must not pollute the kernel fence
      val docs = spark.range(n.toLong)
        .select(col("id").as("doc_id"), text.as("text")).localCheckpoint()

      var expPlanted = 0L; var nFlat = 0L
      var i = 0L
      while (i < n) {
        if (i % 997 == 0) nFlat += 1
        else if (i % 10 == 1 && (i - 1) % 997 != 0) expPlanted += 1
        i += 1
      }

      val (_, _) = time(s"synthesize corpus ($n texts, fixture)") {
        require(docs.count() == n.toLong, "corpus count")
      }
      val (hashed, tHash) = time(s"REAL encode/decode + phash ($n imgs)") {
        val h = Multimodal.perceptualHash(Multimodal.synthImages(
            Multimodal.pack(docs, "doc_id", "text", "image/gray"),
            format = "bmp"))
          .select("media_id", "dh0", "dh1", "dh2", "dh3").localCheckpoint()
        require(h.count() == n.toLong, "hash count"); h
      }
      val (pairs, _) = time("banded near-dup pairs (maxDist 2)") {
        val p = Multimodal.phashNearDupPairs(hashed, maxDist = 2).localCheckpoint()
        println(s"MMSCALE[$tag]   pair count: ${p.count()}"); p
      }
      val (_, _) = time("planted assertions") {
        // every planted (base, base+1) pair surfaces — total recall
        val planted = pairs.filter(col("id_b") === col("id_a") + 1 &&
          col("id_b") % 10 === 1)
        val got = planted.count()
        // the exact count IS the hamming bound: a planted pair past
        // hamming 2 would be absent from the maxDist=2 output and break it
        require(got == expPlanted,
          s"planted pairs found $got, expected $expPlanted (total recall, " +
            "one-pixel edits within hamming 2)")
        // the flat class is ONE hot bucket: exactly C(nFlat, 2) dist-0 pairs
        val flatPairs = pairs.filter(col("id_a") % 997 === 0 &&
          col("id_b") % 997 === 0)
        require(flatPairs.count() == nFlat * (nFlat - 1) / 2,
          "flat class must pair completely at dist 0")
        require(flatPairs.filter(col("dist") =!= 0).isEmpty, "flat pairs dist 0")
      }
      tHash / n * 1e6 // decode+hash µs per image
    }

    val base = scenario(nBase, "base")
    val big = scenario(nBig, "big")
    val ratio = big / base
    println(f"MMSCALE per-image decode+hash: base $base%.1f µs, big $big%.1f µs, ratio $ratio%.2f")
    require(ratio <= 1.6,
      f"per-image decode+hash cost must stay ~linear, got $ratio%.2f")
    println("MMSCALE OK")
    spark.stop()
  }
}
