package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` content
  * plus a typed metadata struct, with decode / feature-extraction / resize /
  * frame-sampling as partition-parallel batched transforms.
  *
  * Two tiers of "decode" live here:
  *
  *  - REAL image decode via the JDK's own `javax.imageio` (PNG and BMP
  *    readers ship with every JRE — no external codec needed):
  *    [[synthImages]] encodes, [[perceptualHash]] decodes and derives
  *    integer dHash/aHash fingerprints, [[phashNearDupPairs]] finds image
  *    near-duplicates by the same 4×16-bit pigeonhole banding the text
  *    side uses ([[Dedup.simhashPairs]]). Every arithmetic step after the
  *    decode is exact-integer, so a DuckDB oracle re-derives the hashes
  *    from the source bytes without decoding anything — the decode legs
  *    are verified by ROUND-TRIP equality (mm5/mm6).
  *  - Deterministic STUB kernels for the codecs that genuinely are not in
  *    this container (video frame extraction, audio): the Spark-side
  *    plumbing — binary columns riding Parquet untouched, metadata
  *    predicates pruning without touching bytes, batched `mapPartitions`
  *    exactly where a JNI/Python codec slots in — is real and tested.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = false)))

  /** Pack an id + payload column into the multimodal shape. Width/height are
    * derived deterministically from the payload bytes (STUB for real header
    * parsing).
    */
  def pack(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame = {
    val content = col(payloadCol).cast("binary")
    df.select(
      col(idCol).cast("long").as("media_id"),
      content.as("content"),
      struct(
        lit(format).as("format"),
        length(content).cast("long").as("n_bytes"),
        (pmod(crc32(content), lit(1024)) + 1).cast("int").as("width"), // STUB: header parse
        (pmod(crc32(content), lit(768)) + 1).cast("int").as("height") // STUB: header parse
      ).as("meta"))
  }

  /** Deterministic first-k-bytes "frame sample" (STUB for real frame
    * extraction — the slicing/batching plumbing is the real part).
    */
  def frameSample(df: DataFrame, frameBytes: Int = 16): DataFrame =
    df.withColumn("frame", substring(col("content"), 1, frameBytes))
      .withColumn("frame_fp", md5(col("frame")))

  /** Every complete fixed-size frame of the payload, one row per frame
    * (video → frame table). Real frame extraction is a codec call; the STUB
    * treats the payload as raw concatenated frames, which is exactly the
    * shape uncompressed formats (YUV, PCM audio blocks) have. The explode is
    * codegen'd and the per-frame fingerprint lets downstream dedup/sampling
    * operate per frame without re-reading the media column.
    */
  def frameSampleAll(df: DataFrame, frameBytes: Int = 16): DataFrame = {
    val nFrames = (length(col("content")) / frameBytes).cast("long")
    df.withColumn("frame_no",
        explode(when(nFrames >= 1, sequence(lit(0L), nFrames - 1))
          .otherwise(array().cast("array<long>"))))
      .withColumn("frame",
        col("content").substr((col("frame_no") * frameBytes).cast("int") + lit(1), lit(frameBytes)))
      // fingerprint via md5(hex(bytes)): engines disagree on md5-of-blob
      // support, every engine md5s the (uppercase) hex string identically
      .withColumn("frame_fp", md5(hex(col("frame"))))
  }

  /** Resize STUB: stride-sample every `factor`-th byte of the payload (a
    * real implementation decodes, scales, re-encodes — the data-movement
    * shape is identical: binary in, smaller binary out, metadata updated).
    * Pure codegen'd SQL functions (hex → stride-slice → unhex), no UDF; the
    * width/height metadata divides by the same factor.
    */
  def resize(df: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    // ONE linear regex pass over the hex form keeps byte 0 of every
    // factor-byte group (trailing partial group included). A per-index
    // `transform` + `substr(hx, i*2k+1, 2)` formulation is O(len²) per row:
    // string substr char-counts from the start of the string each call
    // (measured 4× slower on sf0.1 documents at factor 2).
    val outBytes = ((length(col("content")) + factor - 1) / factor).cast("long")
    df.withColumn("resized",
        unhex(regexp_replace(hex(col("content")),
          s"(..)(.{0,${2 * (factor - 1)}})", "$1")))
      .withColumn("resized_meta", struct(
        col("meta.format").as("format"),
        outBytes.as("n_bytes"),
        ((col("meta.width") + factor - 1) / factor).cast("int").as("width"),
        ((col("meta.height") + factor - 1) / factor).cast("int").as("height")))
  }

  /** Batched feature extraction over partitions: iterates rows in fixed-size
    * batches exactly like an Arrow/mapInPandas kernel would, calling
    * `decodeBatch` once per batch. The decode itself is a STUB (bytes →
    * deterministic pseudo-embedding); swap `decodeBatch` for a real codec
    * binding without touching the plumbing.
    */
  def extractFeatures(df: DataFrame, dim: Int = 8, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val out = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val features = decodeBatch(batch.map(_.getAs[Array[Byte]](contentIdx)), dim)
        batch.iterator.zip(features.iterator).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f)
        }
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Same batched-partition plumbing as `extractFeatures`, but the kernel
    * emits the raw per-bucket byte SUMS as longs — exact integers, so the
    * whole decode path is cross-engine verifiable (`mm4_features` checks it
    * against a DuckDB byte-loop oracle bit-for-bit). A real codec binding
    * would return floats; this is the correctness harness for the plumbing.
    */
  def extractFeatureSums(df: DataFrame, dim: Int = 8, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("feature_sums", ArrayType(LongType), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val out = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val sums = sumBatch(batch.map(_.getAs[Array[Byte]](contentIdx)), dim)
        batch.iterator.zip(sums.iterator).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f)
        }
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** STUB decode kernel: a real implementation binds an image/audio library
    * here (one call per batch, vectorized). This fake is deterministic in the
    * bytes so tests and oracles are stable.
    */
  private def decodeBatch(contents: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
    contents.map { bytes =>
      val f = new Array[Float](dim)
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) {
          f(i % dim) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
      }
      f
    }

  /** Integer twin of `decodeBatch`: bucket-sum of byte values (exact). */
  private def sumBatch(contents: Seq[Array[Byte]], dim: Int): Seq[Array[Long]] =
    contents.map { bytes =>
      val f = new Array[Long](dim)
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) {
          f(i % dim) += (bytes(i) & 0xff).toLong
          i += 1
        }
      }
      f
    }

  // ── REAL image decode: javax.imageio (JDK-builtin PNG/BMP codecs) ───────

  // no ImageIO disk-cache temp files on executors — streams are in-memory
  javax.imageio.ImageIO.setUseCache(false)

  /** Rasterize the content bytes into a REAL encoded image (`img` binary):
    * a `w × h` grayscale raster whose pixel (r, c) is the content byte at
    * index `(r·w + c) mod n` (cyclic), written through the JDK's own PNG or
    * BMP encoder. `format = "mixed"` alternates by media_id parity — both
    * decoders then exercise in one pass, and since both codecs are lossless
    * for this raster the downstream hashes are format-invariant (spec'd).
    *
    * The pixel rule is deliberately a pure integer function of the source
    * bytes: everything downstream of the DECODE is then re-derivable by an
    * oracle that never decodes — round-trip equality IS the decode test
    * (the mm5/mm6 gates). Same batched mapPartitions shape as
    * [[extractFeatures]]; the codec call sits exactly where a JNI binding
    * would.
    */
  def synthImages(df: DataFrame, w: Int = 36, h: Int = 32,
      format: String = "mixed", batchSize: Int = 64): DataFrame = {
    require(w > 0 && h > 0, "image dims must be positive")
    val schema = StructType(df.schema.fields :+
      StructField("img", BinaryType, nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val idIdx = df.schema.fieldIndex("media_id")
    val out = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val fmt = format match {
            case "mixed" => if (r.getLong(idIdx) % 2 == 0) "png" else "bmp"
            case f => f
          }
          val bytes = r.getAs[Array[Byte]](contentIdx)
          Row.fromSeq(r.toSeq :+ encodeGray(rasterOf(bytes, w, h), w, h, fmt))
        }
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** The cyclic grayscale raster (row-major, one int per pixel, 0–255). */
  private def rasterOf(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
    val n = if (bytes == null) 0 else bytes.length
    Array.tabulate(w * h)(i => if (n == 0) 0 else bytes(i % n) & 0xff)
  }

  private def encodeGray(pix: Array[Int], w: Int, h: Int,
      fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pix(y * w + x) * 0x010101); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, baos), s"no ImageIO writer: $fmt")
    baos.toByteArray
  }

  /** REAL decode: parse the encoded image (format sniffed from the bytes —
    * PNG and BMP readers ship with the JDK) and return (width, height,
    * integer luma raster). Luma is the ITU-R 601 integer form
    * `(299·R + 587·G + 114·B) / 1000` — exact for grayscale rasters
    * (R = G = B = v ⟹ luma = v), correct for color ones.
    */
  private[graft] def decodeLuma(img: Array[Byte]): (Int, Int, Array[Int]) = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img))
    require(bi != null, "undecodable image bytes")
    val (w, h) = (bi.getWidth, bi.getHeight)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = bi.getRGB(x, y)
        out(y * w + x) = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** Perceptual hashes of REAL decoded images — the image near-dup
    * fingerprint (public dHash/aHash designs, e.g. the pHash family):
    *
    *  1. decode via `javax.imageio` (header parse, bottom-up BMP rows, PNG
    *     inflate — the real thing), luma per pixel;
    *  2. box-average down to the canonical 9×8 grid (boxes of
    *     `(w/9) × (h/8)` pixels, integer mean with floor — `w`, `h` must
    *     divide evenly; the fixed-size "resize" step of the standard
    *     algorithm, exact-integer so the oracle can mirror it);
    *  3. dHash: bit (r, c) = grid(r, c) > grid(r, c+1) — 64 gradient bits;
    *     aHash: bit (r, c) = grid(r, c) > mean(left 8×8 sub-grid), with the
    *     mean floored — 64 brightness bits.
    *
    * Bits pack MSB-first into FOUR 16-bit band words per hash (`dh0..dh3`,
    * `ah0..ah3`) — the banding [[phashNearDupPairs]] pigeonholes on, and
    * small enough integers that the DuckDB twin never touches 64-bit sign
    * (the d10 HUGEINT contortion). `dhash`/`ahash` are the packed 16-hex
    * forms. Everything after the decode is exact integer arithmetic: the
    * oracle re-derives the hashes from the SOURCE bytes (never decoding),
    * so a hash match end-to-end proves the encode→decode legs lossless.
    */
  def perceptualHash(df: DataFrame, imgCol: String = "img",
      batchSize: Int = 64): DataFrame = {
    val added = Seq(
      StructField("img_w", IntegerType, nullable = true),
      StructField("img_h", IntegerType, nullable = true)) ++
      (0 to 3).map(k => StructField(s"dh$k", IntegerType, nullable = true)) ++
      (0 to 3).map(k => StructField(s"ah$k", IntegerType, nullable = true)) ++
      Seq(StructField("dhash", StringType, nullable = true),
        StructField("ahash", StringType, nullable = true))
    val schema = StructType(df.schema.fields ++ added)
    val imgIdx = df.schema.fieldIndex(imgCol)
    val out = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (w, h, lum) = decodeLuma(r.getAs[Array[Byte]](imgIdx))
          require(w % 9 == 0 && h % 8 == 0,
            s"phash needs dims divisible by 9x8, got ${w}x$h")
          val (bw, bh) = (w / 9, h / 8)
          val g = Array.tabulate(8, 9) { (gr, gc) =>
            var s = 0; var yy = gr * bh
            while (yy < (gr + 1) * bh) {
              var xx = gc * bw
              while (xx < (gc + 1) * bw) { s += lum(yy * w + xx); xx += 1 }
              yy += 1
            }
            s / (bw * bh)
          }
          val dbits = Array.tabulate(64)(p => if (g(p / 8)(p % 8) > g(p / 8)(p % 8 + 1)) 1 else 0)
          var asum = 0
          var p = 0
          while (p < 64) { asum += g(p / 8)(p % 8); p += 1 }
          val amean = asum / 64
          val abits = Array.tabulate(64)(p => if (g(p / 8)(p % 8) > amean) 1 else 0)
          def bands(bits: Array[Int]): Array[Int] =
            Array.tabulate(4)(k => (0 until 16).map(j => bits(16 * k + j) << (15 - j)).sum)
          val (db, ab) = (bands(dbits), bands(abits))
          def hexOf(bs: Array[Int]) = bs.map(b => f"$b%04x").mkString
          Row.fromSeq(r.toSeq ++ Seq(w, h) ++ db ++ ab :+ hexOf(db) :+ hexOf(ab))
        }
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  // ── REAL audio decode: javax.sound.sampled (JDK-builtin WAV codec) ─────

  /** Rasterize the content bytes into a REAL WAV file (`audio` binary):
    * `nSamples` of unsigned 8-bit mono PCM, sample i = content byte
    * `(i mod n)` (cyclic — the same oracle-transparent rule as
    * [[synthImages]]), written through the JDK's own RIFF/WAVE encoder.
    * Same batched mapPartitions shape; the codec call sits exactly where a
    * JNI binding would.
    */
  def synthAudio(df: DataFrame, nSamples: Int = 2048, sampleRate: Int = 8000,
      batchSize: Int = 64): DataFrame = {
    require(nSamples > 0, "nSamples must be positive")
    val schema = StructType(df.schema.fields :+
      StructField("audio", BinaryType, nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val out = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          val n = if (bytes == null) 0 else bytes.length
          val pcm = Array.tabulate[Byte](nSamples)(i =>
            if (n == 0) 0 else bytes(i % n))
          val fmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
            sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos): Unit
          Row.fromSeq(r.toSeq :+ baos.toByteArray)
        }
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** REAL audio decode + integer frame energies: parse the WAV container
    * with `javax.sound.sampled` (RIFF header, fmt chunk, PCM payload — the
    * real thing) and emit per-frame MEAN ABSOLUTE DEVIATION from the
    * unsigned-8-bit midpoint, `energy_f = Σ_{i∈frame} |s_i − 128|` — the
    * exact-integer loudness contour a pipeline silence-screens and
    * segment-samples on. Adds `(n_samples, sample_rate, energies)`;
    * everything after the decode is integer arithmetic, so the mm8 DuckDB
    * twin re-derives the energies from the SOURCE bytes without decoding —
    * a match proves the RIFF round-trip lossless (the mm5 gate, for audio).
    */
  def audioFeatures(df: DataFrame, audioCol: String = "audio",
      frameSamples: Int = 256, batchSize: Int = 64): DataFrame = {
    require(frameSamples > 0, "frameSamples must be positive")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("n_samples", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("energies", ArrayType(LongType), nullable = true)))
    val audioIdx = df.schema.fieldIndex(audioCol)
    val out = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](audioIdx)))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
            s"audioFeatures expects 8-bit mono PCM, got $fmt")
          val pcm = try ais.readAllBytes() finally ais.close()
          val frames = pcm.length / frameSamples
          val energies = Array.tabulate(frames) { f =>
            var s = 0L; var i = f * frameSamples
            while (i < (f + 1) * frameSamples) {
              s += math.abs((pcm(i) & 0xff) - 128); i += 1
            }
            s
          }
          Row.fromSeq(r.toSeq ++ Seq(pcm.length, fmt.getSampleRate.toInt,
            energies))
        }
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Image near-duplicate pairs by pigeonhole banding on the dHash's four
    * 16-bit words — [[Dedup.simhashPairs]]'s machinery pointed at decoded
    * pixels: two hashes within Hamming distance 3 must collide in at least
    * one word (recall TOTAL for `maxDist ≤ 3`), candidates are an equi-join
    * on `(band, word)` — never all-pairs — and the `bit_count(xor)` verify
    * runs map-side before the pair-dedup shuffle. Input is
    * [[perceptualHash]] output; emits `(id_a, id_b, dist)`.
    *
    * Scale shape: identical to the text side — candidate volume is
    * ~4·N²/65536 per homogeneous corpus, and a pathological band value
    * (e.g. flat images hashing to all-zero gradients) is the same
    * heavy-bucket skew [[LshIndex.health]] surfaces for text; cap or
    * exact-dedup the flat class upstream.
    */
  def phashNearDupPairs(hashed: DataFrame, maxDist: Int = 2,
      maxBucketSize: Option[Int] = None): DataFrame = {
    require(maxDist <= 3, "4x16-bit banding guarantees recall only to hamming 3")
    // checkpoint the (16-byte-per-row) hash frame BEFORE the self-join —
    // simhashPairs' shape, for the same reason: both join sides (and the
    // cap's bucket census) would otherwise re-execute the full
    // decode+hash lineage, silently doubling the one-decode-per-image
    // cost model this API exists for
    val h = hashed.select(col("media_id"), col("dh0"), col("dh1"),
      col("dh2"), col("dh3")).localCheckpoint()
    // maxBucketSize: the flat-image/boilerplate skew guard — see
    // Dedup.capWordBuckets (one blank-image class is a single bucket
    // pairing completely, quadratic in the class size; opt-in, loud)
    val bands = Dedup.capWordBuckets(h
      .select(col("media_id"), col("dh0"), col("dh1"), col("dh2"), col("dh3"),
        posexplode(array(col("dh0"), col("dh1"), col("dh2"), col("dh3"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "word"),
      maxBucketSize, "phashNearDupPairs")
    def side(tag: String) = bands.select(col("band"), col("word"),
      col("media_id").as(s"id_$tag"), col("dh0").as(s"h0$tag"),
      col("dh1").as(s"h1$tag"), col("dh2").as(s"h2$tag"), col("dh3").as(s"h3$tag"))
    side("a").join(side("b"), Seq("band", "word"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist",
        (bit_count(col("h0a").bitwiseXOR(col("h0b"))) +
          bit_count(col("h1a").bitwiseXOR(col("h1b"))) +
          bit_count(col("h2a").bitwiseXOR(col("h2b"))) +
          bit_count(col("h3a").bitwiseXOR(col("h3b")))).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .distinct()
  }
}
