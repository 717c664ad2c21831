package graft.tools

import graft.ops.{IndexLifecycle, LshIndex, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exercise the shared index-lifecycle protocol AT TIER SCALE (r13 verdict
  * task 6's second half): the specs prove the refusals on toy corpora;
  * this proves the guard reads stay O(markers) — metadata-cheap — when the
  * index itself holds a scale tier's corpus, and that every refusal fires
  * identically there.
  *
  *   runMain graft.tools.IndexProtocolSmoke data/sf10
  *
  * Steps, each timed: LSH build over the tier's documents (owner
  * registered), owned append, wrong-owner refusal, unowned-append
  * warn-once, batch-id-below-max refusal after a compact, pending-build
  * refusal + repair by completing the build, rebind handover. Same story
  * for the IVF family over the tier's embeddings.
  */
object IndexProtocolSmoke {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: IndexProtocolSmoke <sfDir>")
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("idxproto").toFile.getAbsolutePath
    def time[A](name: String)(f: => A): A = {
      val s0 = System.nanoTime(); val r = f
      println(f"PROTO $name%-34s ${(System.nanoTime() - s0) / 1e9}%.2f s"); r
    }
    def refusal(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val msg = try { f; sys.error(s"$name: expected a refusal") }
      catch { case e: IllegalStateException => e.getMessage }
      println(f"PROTO $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s [$msg]")
    }

    // ── LSH family over the tier's documents ──
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val lsh = s"$dir/lsh"
    time(s"lsh build (${docs.count()} docs)") {
      LshIndex.build(docs, "doc_id", "text", lsh, sigBuckets = 64)
    }
    val batch = Seq((900000001L, "entirely novel content with distinct vocabulary"))
      .toDF("doc_id", "text")
    time("lsh owned append b=0") {
      LshIndex.appendBatch(spark, lsh, batch, "doc_id", "text", 0L,
        owner = Some("chk://owner-a"))
    }
    refusal("lsh wrong-owner refusal") {
      LshIndex.appendBatch(spark, lsh, batch, "doc_id", "text", 1L,
        owner = Some("chk://intruder"))
    }
    val w0 = IndexLifecycle.unownedAppendWarnings.get()
    time("lsh unowned append (warns once)") {
      LshIndex.appendBatch(spark, lsh, batch, "doc_id", "text", 1L)
    }
    require(IndexLifecycle.unownedAppendWarnings.get() == w0 + 1,
      "unowned append onto an owned tier index must warn")
    time("lsh compact")(LshIndex.compactIngest(spark, lsh))
    refusal("lsh stale-batch-id refusal") {
      LshIndex.appendBatch(spark, lsh, batch, "doc_id", "text", 0L,
        owner = Some("chk://owner-a"))
    }
    time("lsh rebind handover") {
      LshIndex.rebindIngestOwner(spark, lsh, "chk://owner-b")
    }
    IndexLifecycle.beginBuild(spark, lsh)
    refusal("lsh pending-build refusal") {
      LshIndex.signatures(spark, lsh).count()
    }
    time("lsh repair: re-run build") {
      LshIndex.build(docs, "doc_id", "text", lsh, sigBuckets = 64)
    }
    require(LshIndex.signatures(spark, lsh).count() > 0)

    // ── IVF family over the tier's embeddings ──
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val ivf = s"$dir/ivf"
    time(s"ivf-sq build (${emb.count()} vecs)") {
      Similarity.buildIvfSqIndex(emb, "vec_id", "embedding", ivf, nlist = 16)
    }
    val vbatch = Seq((900000001L, Array.fill(64)(0.1f))).toDF("vec_id", "embedding")
    time("ivf owned append b=0") {
      Similarity.appendBatchToIvfSqIndex(spark, ivf, vbatch, "vec_id",
        "embedding", 0L, owner = Some("chk://owner-a"))
    }
    refusal("ivf wrong-owner refusal") {
      Similarity.appendBatchToIvfSqIndex(spark, ivf, vbatch, "vec_id",
        "embedding", 1L, owner = Some("chk://intruder"))
    }
    time("ivf owned append b=1") {
      // land a second batch so b=0 falls BELOW the retained max marker
      // after the fold (replaying the max itself is the legitimate skip)
      Similarity.appendBatchToIvfSqIndex(spark, ivf, vbatch, "vec_id",
        "embedding", 1L, owner = Some("chk://owner-a"))
    }
    time("ivf compact")(Similarity.compactIvfIngest(spark, ivf))
    refusal("ivf stale-batch-id refusal") {
      Similarity.appendBatchToIvfSqIndex(spark, ivf, vbatch, "vec_id",
        "embedding", 0L, owner = Some("chk://owner-a"))
    }
    IndexLifecycle.beginBuild(spark, ivf)
    refusal("ivf pending-build refusal") {
      Similarity.ivfSqTopKIndexed(spark, ivf, vbatch, "vec_id", "embedding",
        k = 1, nprobe = 2, rerank = 4).count()
    }
    time("ivf repair: re-run build") {
      Similarity.buildIvfSqIndex(emb, "vec_id", "embedding", ivf, nlist = 16)
    }

    // ── phash family: a tier-sized image corpus through the SAME protocol ──
    // (images synthesized from the tier's documents through the REAL codec)
    val ph = s"$dir/ph"
    def imgs(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Multimodal.synthImages(graft.ops.Multimodal.pack(
          df, "doc_id", "text", "raw"), format = "bmp")
        .select(col("media_id").as("img_id"), col("img"))
    time(s"phash build (tier docs as images)") {
      graft.ops.PhashIndex.build(imgs(docs), "img_id", "img", ph,
        sigBuckets = 64)
    }
    val pbatch = imgs(batch)
    time("phash owned append b=0") {
      graft.ops.PhashIndex.appendBatch(spark, ph, pbatch, "img_id", "img", 0L,
        owner = Some("chk://owner-a"))
    }
    refusal("phash wrong-owner refusal") {
      graft.ops.PhashIndex.appendBatch(spark, ph, pbatch, "img_id", "img", 1L,
        owner = Some("chk://intruder"))
    }
    time("phash owned append b=1") {
      // a second batch so b=0 falls BELOW the retained max after the fold
      // (replaying the max itself is the legitimate idempotent skip)
      graft.ops.PhashIndex.appendBatch(spark, ph, pbatch, "img_id", "img", 1L,
        owner = Some("chk://owner-a"))
    }
    time("phash compact")(graft.ops.PhashIndex.compactIngest(spark, ph))
    refusal("phash stale-batch-id refusal") {
      graft.ops.PhashIndex.appendBatch(spark, ph, pbatch, "img_id", "img", 0L,
        owner = Some("chk://owner-a"))
    }
    IndexLifecycle.beginBuild(spark, ph)
    refusal("phash pending-build refusal") {
      graft.ops.PhashIndex.signatures(spark, ph).count()
    }
    time("phash repair: re-run build") {
      graft.ops.PhashIndex.build(imgs(docs), "img_id", "img", ph,
        sigBuckets = 64)
    }
    println("PROTO OK: all three families' protocol holds at tier scale")
    spark.stop()
  }
}
