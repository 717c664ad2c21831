package graft

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact dedup groups duplicates regardless of whitespace/case") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "something else"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(groups.length == 2)
    val dup = groups.find(_.getAs[Long]("n_dups") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds near-duplicates, jaccard verifies, unrelated docs don't collide") {
    val base = "the quick brown fox jumps over the lazy dog again and again every day"
    val nearDup = base.replace("lazy", "sleepy")
    val other = "completely different content about spark query engines and parquet files here"
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val cands = Dedup.lshCandidatePairs(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)) && !cands.contains((2L, 3L)))
    val verified = Dedup.jaccardVerify(df, Dedup.lshCandidatePairs(df, "doc_id", "text"),
      "doc_id", "text", threshold = 0.3).collect()
    assert(verified.length == 1 && verified.head.getAs[Double]("jaccard") > 0.3)
  }

  test("dedup survivors: transitive near-dup chain collapses to one component") {
    val base = "the quick brown fox jumps over the lazy dog again and again every single day"
    val df = Seq(
      (1L, base),
      (2L, base.replace("lazy", "sleepy")),   // ~ 1
      (3L, base.replace("lazy", "sleepy").replace("quick", "rapid")), // ~ 2, maybe not ~ 1
      (4L, "entirely different words about query engines and columnar storage here today"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSurvivors(df, "doc_id", "text", threshold = 0.3, rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // 1,2,3 share one component labeled by the min id; 4 is its own
    assert(out(1L) == (1L, true))
    assert(out(2L)._1 == 1L && !out(2L)._2)
    assert(out(3L)._1 == 1L && !out(3L)._2)
    assert(out(4L) == (4L, true))
  }

  test("simhash: identical docs equal, near-dups close in hamming distance") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val near = base.replace("kappa", "sigma")
    val far = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("doc_id", "text")
    val hs = Dedup.simhash32(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(1L), hs(3L)) < hamming(hs(1L), hs(4L)))
  }

  test("cosine top-k: exact ranking on known vectors") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(df, df.filter($"vec_id" === 0), "vec_id", "embedding", 3)
      .orderBy("rn").collect()
    assert(top.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 3L))
    assert(top.head.getAs[Double]("sim") > 0.99)
  }

  test("centroid outlier screen flags only vectors no cluster claims") {
    // centroids = first 2 by id (nlist = 2): the x-axis and y-axis vectors;
    // 10/11 sit near them, 12 is near-orthogonal to both
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)),
      (10L, Array(0.95f, 0.05f, 0.0f)), (11L, Array(0.1f, 0.9f, 0.0f)),
      (12L, Array(0.05f, 0.05f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(df, "vec_id", "embedding",
        simFloor = 0.5, nlist = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(0L) == (0L, false) && out(1L) == (1L, false), "centroids claim themselves")
    assert(out(10L) == (0L, false), "near-x assigns to the x centroid, inlier")
    assert(out(11L) == (1L, false), "near-y assigns to the y centroid, inlier")
    assert(out(12L)._2, "the off-axis vector is below the floor everywhere")
  }

  test("sign-LSH ANN recalls same-bucket neighbours") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.cosineTopK(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding", 3)
    val ann = Similarity.signLshTopK(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding", 3, bits = 4)
    // ANN returns rows for every query; every ANN hit must appear in the
    // exact full ranking with identical sim, and can never beat exact top-1
    // (the candidate set is a subset of the corpus).
    assert(ann.groupBy("qid").count().count() == 10)
    val exactTop1 = exact.filter($"rn" === 1).select("qid", "sim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exactSims = exact.select("qid", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ann.collect().foreach { r =>
      val (q, v, s) = (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))
      assert(s <= exactTop1(q) + 1e-9)
      exactSims.get((q, v)).foreach(es => assert(math.abs(es - s) < 1e-9))
    }
  }

  test("multimodal: pack → frame sample → batched feature extraction plumbing") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val packed = Multimodal.pack(docs, "doc_id", "text", "text/plain")
    assert(packed.schema("content").dataType.typeName == "binary")
    assert(packed.schema("meta").dataType.typeName == "struct")

    val framed = Multimodal.frameSample(packed, 16)
    val f = framed.select("frame").head().getAs[Array[Byte]](0)
    assert(f.length == 16)

    val feats = Multimodal.extractFeatures(framed, dim = 8, batchSize = 16)
    assert(feats.schema("features").dataType.typeName == "array")
    val rows = feats.select("media_id", "features").collect()
    assert(rows.length == 100)
    rows.foreach(r => assert(r.getSeq[Float](1).length == 8))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(framed, dim = 8, batchSize = 32)
      .select("media_id", "features").collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toMap ==
      again.map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toMap)
  }

  test("multimodal: frameSampleAll covers every complete frame, resize strides bytes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val packed = Multimodal.pack(docs, "doc_id", "text", "video/raw")

    val frames = Multimodal.frameSampleAll(packed, frameBytes = 16)
    // per media: n_frames == n_bytes / 16, frame_no dense from 0
    frames.groupBy("media_id")
      .agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.max("frame_no").as("mx"),
        org.apache.spark.sql.functions.min("frame_no").as("mn"),
        org.apache.spark.sql.functions.first($"meta.n_bytes").as("nb"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("n") == r.getAs[Long]("nb") / 16)
        assert(r.getAs[Long]("mn") == 0L && r.getAs[Long]("mx") == r.getAs[Long]("n") - 1)
      }
    // every frame is exactly frameBytes and matches a direct slice
    val one = frames.filter($"media_id" === 1 && $"frame_no" === 1)
      .select("frame").head().getAs[Array[Byte]](0)
    val raw = packed.filter($"media_id" === 1).select("content").head().getAs[Array[Byte]](0)
    assert(one.toSeq == raw.slice(16, 32).toSeq)

    val resized = Multimodal.resize(packed, factor = 3)
    resized.select($"media_id", $"content", $"resized", $"resized_meta.n_bytes")
      .collect().foreach { r =>
        val full = r.getAs[Array[Byte]]("content")
        val out = r.getAs[Array[Byte]]("resized")
        assert(out.length == (full.length + 2) / 3)
        assert(r.getAs[Long]("n_bytes") == out.length.toLong)
        out.zipWithIndex.foreach { case (b, i) => assert(b == full(i * 3)) }
      }

    // exact-integer kernel agrees with a driver-side byte loop
    val sums = Multimodal.extractFeatureSums(packed, dim = 4, batchSize = 8)
      .select("media_id", "content", "feature_sums").collect()
    sums.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      val expect = new Array[Long](4)
      bytes.zipWithIndex.foreach { case (b, i) => expect(i % 4) += (b & 0xff).toLong }
      assert(r.getSeq[Long](2).toList == expect.toList)
    }
  }

  test("language id picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "el perro y la casa de un gato"))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.langId($"text").getField("lang").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es"))
  }

  test("matryoshkaRecall: full-depth truncation is the identity (recall 1), census is exact") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val emb = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val out = Similarity.matryoshkaRecall(emb, emb.filter($"vec_id" < 6),
        "vec_id", "embedding", k = 4, dims = Seq(2, 16))
      .orderBy("dims").collect()
    assert(out.length == 2)
    // census arithmetic: k * nq candidates per depth, hits bounded by it
    out.foreach { r =>
      assert(r.getLong(2) === 24L, "n_candidates must be k * n_queries")
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 24L)
      assert(math.abs(r.getDouble(3) - r.getLong(1).toDouble / 24.0) < 5e-7,
        "recall is the exact ratio, rounded to 6 decimals by contract")
    }
    // truncating at the FULL dimension is the identity: recall exactly 1
    assert(out(1).getInt(0) === 16 && out(1).getDouble(3) === 1.0,
      "full-depth truncation must reproduce the full-dim top-k exactly")
    // a 2-of-16 prefix throws away information on a gaussian corpus
    assert(out(0).getDouble(3) < 1.0,
      "a tiny prefix must not accidentally be the identity on this fixture")
  }
}
