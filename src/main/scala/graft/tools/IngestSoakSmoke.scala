package graft.tools

import graft.ops.{LshIndex, Multimodal}
import graft.streaming.StreamAggs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-lived-driver SOAK for the streaming ingest paths (VERDICT r15 #8):
  * CheckpointLifetimeSpec proves each lifecycle phase is block-clean once;
  * a production projector runs for WEEKS, so the same proof must hold over
  * many micro-batches with no `System.gc()` anywhere — a per-batch leak of
  * one scratch block set is invisible at 5 batches and an OOM at 50k.
  *
  * Two paths soak, each `SOAK_BATCHES` (default 500) micro-batches through
  * a real `foreachBatch` streaming query over a MemoryStream source:
  *
  *  1. `dedupAtIngest` — the heaviest per-batch machinery: minhash screen
  *     against the persisted LSH index (`screenWithScratch`'s interior
  *     checkpoints + the verdicts frame), accepted-row append, periodic
  *     `compactIngest` every 100 batches (the maintenance cadence a real
  *     stream runs).
  *  2. `routeAtIngest` — the intake router (stateless, but its sniff
  *     kernel crosses the RDD boundary every batch).
  *
  * After EVERY batch, `sc.getPersistentRDDs` and `sc.getRDDStorageInfo`
  * must sit EXACTLY at their pre-stream baseline (unpersist is
  * synchronous — a pass means every release was explicit, never GC luck).
  * Executor storage `memUsed` additionally holds BROADCAST blocks, which
  * are ContextCleaner-owned by design (they free on a collection, and a
  * long-lived driver relies on Spark's periodic-GC cadence for them) — so
  * the honest assertion there is BOUNDED end-to-end (a leaked per-batch
  * data frame would blow the cap in hundreds of batches; a few KB of
  * broadcast bookkeeping per batch does not), with the raw series in the
  * committed artifact. Any violated gauge fails loudly WITH the batch
  * number.
  */
object IngestSoakSmoke {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .appName("graft-ingest-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val nBatches = sys.env.getOrElse("SOAK_BATCHES", "500").toInt
    val root = java.nio.file.Files.createTempDirectory("graftsoak")
      .toFile.getAbsolutePath

    // broadcast bookkeeping is cleaner-owned; a real per-batch DATA leak
    // reaches hundreds of MB over the soak — 256 MB separates the two
    val MemCap = 256L << 20
    def blocks(): Int = spark.sparkContext.getPersistentRDDs.size
    def storageRdds(): Int = spark.sparkContext.getRDDStorageInfo.length
    def storageMem(): Long = spark.sparkContext.getExecutorMemoryStatus
      .values.map { case (max, remaining) => max - remaining }.sum

    def fam(i: Long, tag: String) =
      s"tango$i uniform$i victor$i whiskey$i xray$i yankee$i zulu$i word$i clan$i $tag"

    // ── path 1: dedupAtIngest over a persisted LSH index ────────────────
    val idx = s"$root/lsh"
    val corpus = (0L until 50L).map(i => (i, fam(i, "accepted corpus body")))
      .toDF("doc_id", "text")
    LshIndex.build(corpus, "doc_id", "text", idx, sigBuckets = 8)
    val corpusThunk = () => corpus

    val textStream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val verdictCounts = new java.util.concurrent.atomic.AtomicLong
    val q1 = StreamAggs.dedupAtIngest(
        textStream.toDF().toDF("doc_id", "text"), idx, corpusThunk,
        "doc_id", "text", threshold = 0.5) { (v, _) =>
        verdictCounts.addAndGet(v.count()): Unit
      }
      .option("checkpointLocation", s"$root/ck1").start()

    val baseB = blocks(); val baseS = storageRdds(); val baseM = storageMem()
    println(s"SOAK baseline blocks=$baseB storageRdds=$baseS memUsed=$baseM")

    val t0 = System.nanoTime()
    val series = new scala.collection.mutable.ArrayBuffer[(Int, Int, Long)]
    (0 until nBatches).foreach { b =>
      // each batch: 4 fresh docs + 1 near-dup of the accepted corpus
      val base = 1000L + b * 5L
      textStream.addData((0 until 4).map(j =>
        (base + j, fam(base + j, "novel content here"))) :+
        ((base + 4, fam(b % 50L, "accepted corpus body CHANGED"))))
      q1.processAllAvailable()
      if (b % 100 == 99) LshIndex.compactIngest(spark, idx)
      val (nb, ns, m) = (blocks(), storageRdds(), storageMem())
      if (b % 25 == 0 || b == nBatches - 1) series += ((b, nb, m))
      require(nb == baseB && ns == baseS,
        s"dedupAtIngest batch $b left blocks=$nb (baseline $baseB), " +
          s"storageRdds=$ns (baseline $baseS) — a per-batch leak")
      require(m <= MemCap,
        s"dedupAtIngest batch $b holds storage mem $m > cap $MemCap — " +
          "per-batch data is accumulating, not just broadcast bookkeeping")
    }
    q1.stop()
    val wall1 = (System.nanoTime() - t0) / 1e9
    println(f"SOAK dedupAtIngest: $nBatches%d batches, ${verdictCounts.get}%d verdicts, $wall1%.1f s, flat at baseline")

    // ── path 2: routeAtIngest (sniff kernel per batch) ──────────────────
    val blobStream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val routed = new java.util.concurrent.atomic.AtomicLong
    val q2 = StreamAggs.routeAtIngest(
        Multimodal.pack(
          blobStream.toDF().toDF("media_id", "seed")
            .withColumn("text", concat_ws(" ",
              (0 until 8).map(j => concat(lit("w"), pmod(col("seed") + j, lit(999)))): _*))
            .drop("seed"),
          "media_id", "text", "raw")
          .select(col("media_id"), col("content"))) { (r, _) =>
        routed.addAndGet(r.count()): Unit
      }
      .option("checkpointLocation", s"$root/ck2").start()
    val t1 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      blobStream.addData((0 until 5).map(j => (b * 5L + j, b * 31L + j)))
      q2.processAllAvailable()
      val (nb, ns, m) = (blocks(), storageRdds(), storageMem())
      require(nb == baseB && ns == baseS && m <= MemCap,
        s"routeAtIngest batch $b off baseline: blocks=$nb storageRdds=$ns mem=$m")
    }
    q2.stop()
    val wall2 = (System.nanoTime() - t1) / 1e9
    println(f"SOAK routeAtIngest: $nBatches%d batches, ${routed.get}%d routed, $wall2%.1f s, flat at baseline")

    def r1(v: Double): Double = math.rint(v * 10) / 10
    println("SOAK " + series.map { case (b, nb, m) =>
      s""""b$b":{"blocks":$nb,"mem_used":$m}"""
    }.mkString("{", ",",
      s""","n_batches":$nBatches,"baseline_blocks":$baseB,"baseline_mem":$baseM,"dedup_wall_sec":${r1(wall1)},"route_wall_sec":${r1(wall2)},"dedup_verdicts":${verdictCounts.get},"routed_rows":${routed.get}}"""))
    println("SOAK OK — no System.gc() anywhere; every gauge read at baseline")
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(s"file://$root"),
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true): Unit
    spark.stop()
  }
}
