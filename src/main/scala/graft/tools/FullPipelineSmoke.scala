package graft.tools

import graft.log.{CommitMode, EventLog}
import graft.ops.{Dedup, LshIndex, Sampling, TextAnalysis}
import graft.streaming.ReadModel
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100× rehearsal: ONE composed pipeline — ingest → dedup (minhash LSH +
  * simhash64 bands + span-level) → quality screen → PII redact → persisted
  * LSH index build + 10k-batch incoming screen → per-source
  * cap + split assignment → read model — driven end-to-end at two corpus
  * sizes (default 1M and 5M docs), with planted artifacts asserted at every
  * stage and per-million-doc runtime compared across the two runs (the
  * linearity evidence that the composed plan, not just each stage, survives
  * scale-up).
  *
  * Planted structure (disjoint residue classes so expected counts are exact):
  *  - near-dup pairs: id ≡ 1 (mod 10) re-emits id−1 with token 7 changed;
  *  - junk docs: id ≡ 0 (mod 97) is one unique token repeated 40× (distinct
  *    ratio 0.025 — quality-screened, but never a near-dup of anything);
  *  - PII: id ≡ 3 (mod 100) carries one unique planted email address.
  *
  * Ingest goes through the REAL manifest machinery: `bulkImport` with one
  * stream per document, which at these sizes rides the round-7 parquet
  * reservation SIDECAR (inline threshold 10⁴), so the rehearsal also proves
  * the claim chain stays flat with millions of reserved streams.
  *
  * FULL_DOCS / FULL_BASE_DOCS scale the two runs.
  */
object FullPipelineSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nBig = sys.env.getOrElse("FULL_DOCS", "5000000").toInt
    val nBase = sys.env.getOrElse("FULL_BASE_DOCS", "1000000").toInt

    def scenario(n: Int, tag: String): Double = {
      val t0 = System.nanoTime()
      def time[A](name: String)(f: => A): A = {
        val s0 = System.nanoTime(); val r = f
        println(f"FPIPE[$tag] $name%-44s ${(System.nanoTime() - s0) / 1e9}%.2f s"); r
      }

      // exact expected counts for the planted residue classes
      var expPairs = 0L; var expJunk = 0L; var expPII = 0L
      var i = 0L
      while (i < n) {
        if (i % 97 == 0) expJunk += 1
        else if (i % 100 == 3) expPII += 1
        if (i % 10 == 1 && i % 97 != 0 && (i - 1) % 97 != 0) expPairs += 1
        i += 1
      }

      // ── synthesize: same deterministic xxhash64 token formula as
      // PipelineScaleSmoke (a linear multiplier would collapse the corpus)
      val formula = concat_ws(" ", (0 until 40).map { j =>
        val base = when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id"))
        val idx = if (j == 7) col("id") * 31 + j else base * 31 + j
        concat(lit("w"), pmod(xxhash64(idx), lit(5000)))
      }: _*)
      val junkText = concat_ws(" ",
        array_repeat(concat(lit("junk"), col("id")), 40))
      val text = when(col("id") % 97 === 0, junkText)
        .when(col("id") % 100 === 3,
          concat(formula, lit(" u"), col("id"), lit("@x.example.com")))
        .otherwise(formula)
      val rows = spark.range(n.toLong).select(
        concat(lit("doc-"), col("id")).as("aggregate_id"),
        lit("Document").as("aggregate_kind"),
        lit("DocAdded").as("kind"),
        text.as("body"),
        lit(1).as("seq"))

      val dir = Files.createTempDirectory(s"graftfull$tag").toFile.getAbsolutePath
      val log = new EventLog(spark, dir, numBuckets = 32, ulidSeed = Some(7L),
        commitMode = CommitMode.Manifest)

      // ── ingest: one stream per doc → sidecar-scale reservation claim
      time(s"ingest $n docs (bulkImport, manifest sidecar claim)") {
        require(log.bulkImport(rows) == n.toLong, "import count")
      }
      val docs = time("read back committed corpus") {
        val d = log.activeEvents
          .select(substring(col("aggregate_id"), 5, 18).cast("long").as("doc_id"),
            col("body").as("text"))
          // hash-derived, NOT doc_id % 20: the pair copies are exactly the
          // ids ≡ 1 (mod 10), so a modulo source would leave two sources
          // almost empty after dedup and the cap could never bind there
          .withColumn("source",
            concat(lit("src"), pmod(xxhash64(col("doc_id")), lit(20))))
        require(d.count() == n.toLong, "read-back count"); d
      }

      // ── dedup 1/3: minhash LSH candidates → Jaccard verify → components.
      // materializeSets = false IS the 100 TB shape this rehearsal claims to
      // rehearse: the default (true) localCheckpoints the WHOLE corpus's
      // shingle-set arrays into block storage — at 5M docs that cache was
      // the smoke's heap peak (OOM at the default 8g; r12 papered over it
      // with a 16g note). With false, signatures run as the zero-shuffle
      // codegen projection and shingle sets are built only for the
      // candidate SLIVER — executor storage stays flat at any corpus size.
      val surv = time("minhash LSH + verify + survivor components") {
        Dedup.dedupSurvivors(docs, "doc_id", "text", threshold = 0.5, rounds = 3,
            materializeSets = false)
          .filter(col("is_survivor")).select(col("doc_id")).localCheckpoint()
      }
      val kept1 = surv.count()
      require(kept1 <= n - expPairs + n / 1000 && kept1 >= n - expPairs - n / 100,
        s"minhash survivors $kept1, expected ≈ ${n - expPairs}")
      val corpus1 = docs.join(surv, Seq("doc_id"), "semi")

      // ── dedup 2/3: simhash64 banded screen over the survivors (planted
      // pairs are gone, so this stage must find ~nothing — it exists to
      // drive the fingerprint+band join at composed scale)
      val simDrops = time("simhash64 banded pair screen") {
        Dedup.simhashPairs(corpus1, "doc_id", "text", maxHamming = 2)
          .select(greatest(col("doc_a"), col("doc_b")).as("doc_id"))
          .distinct().localCheckpoint()
      }
      val nSim = simDrops.count()
      require(nSim <= n / 1000, s"simhash screen flagged $nSim docs after minhash")
      val corpus2 = corpus1.join(simDrops, Seq("doc_id"), "left_anti")
      val c2 = kept1 - nSim

      // ── dedup 3/3: span-level exact-substring dedup (kept_text becomes
      // the working text downstream; no doc is removed, spans are)
      val corpus3 = time("span dedup (10-token windows)") {
        val sd = Dedup.spanDedup(corpus2, "doc_id", "text", spanTokens = 10)
        val out = corpus2.drop("text")
          .join(sd.select(col("doc_id"), col("kept_text").as("text")), Seq("doc_id"))
          .localCheckpoint()
        require(out.count() == c2, "span dedup must preserve doc count")
        out
      }

      // ── quality screen: distinct-token ratio drops exactly the junk docs
      // (junk is never a near-dup, so every junk doc reaches this stage)
      val corpus4 = time("quality screen (distinct-ratio)") {
        val q = corpus3.filter(TextAnalysis.distinctRatio(col("text")) >= 0.5)
        val kept = q.count()
        require(kept == c2 - expJunk,
          s"quality kept $kept, expected ${c2 - expJunk} (junk $expJunk)")
        q
      }

      // ── PII: count planted emails, then redact to zero
      val corpus5 = time("pii screen + redact") {
        val before = corpus4
          .agg(sum(TextAnalysis.piiEmailCount(col("text")))).collect()(0).getLong(0)
        require(before >= expPII - n / 10000 && before <= expPII,
          s"planted emails found $before, expected ≈ $expPII")
        val red = corpus4.withColumn("text", TextAnalysis.piiRedact(col("text")))
        require(red.agg(sum(TextAnalysis.piiEmailCount(col("text"))))
          .collect()(0).getLong(0) == 0L, "redact must clear every email")
        red
      }

      // ── persisted LSH index: sign the accepted corpus ONCE, then screen
      // an incoming 10k-doc batch against it — the continuous-ingest screen
      // at composed scale. Half the batch near-dups accepted docs (the
      // formula text with token 3 swapped), half is novel vocabulary; the
      // verdict counts are exact up to the targets that fell to the junk
      // screen (k ≡ 0 mod 97 never reached the corpus).
      time("lsh index build over accepted corpus") {
        LshIndex.build(corpus5, "doc_id", "text", s"$dir/lshidx",
          sigBuckets = 64)
      }
      time("lsh screen 10k batch (planted dups + novels)") {
        val m = 10000
        val tgt = col("id") * 10 + 5 // ≡5 (mod 10): never a pair copy or PII row
        val dupText = concat_ws(" ", (0 until 40).map { j =>
          if (j == 3) lit("changed")
          else concat(lit("w"), pmod(xxhash64(tgt * 31 + j), lit(5000)))
        }: _*)
        val novelText = concat_ws(" ", (0 until 40).map { j =>
          concat(lit("nov"), col("id"), lit("x"), lit(j))
        }: _*)
        val batch = spark.range(m.toLong).select(
          (col("id") + n.toLong * 2).as("doc_id"),
          when(col("id") % 2 === 0, dupText).otherwise(novelText).as("text"))
        val verd = LshIndex.screen(spark, s"$dir/lshidx", corpus5, batch,
          "doc_id", "text", threshold = 0.5)
        val dup = verd.filter(!col("is_new")).count()
        var expDup = 0L
        var ii = 0L
        while (ii < m) { // even i, target exists and survived the junk screen
          val k = ii * 10 + 5
          if (ii % 2 == 0 && k < n && k % 97 != 0) expDup += 1
          ii += 1
        }
        // banding recall is probabilistic: 4 single-hash bands at the
        // planted J ≈ 0.85 miss a pair with (1−J)⁴ ≈ 5e-4 — allow that
        // tail (0.5%), never an over-count (a false flag would mean the
        // verify threshold leaked)
        require(dup <= expDup && dup >= expDup - (expDup / 200 + 2),
          s"lsh screen flagged $dup, expected ≈ $expDup")
      }

      // ── mixture shaping: per-source cap (binds on all 20 sources) + split
      val cap = n / 100
      val capped = time("per-source cap + split assign") {
        val c = Sampling.capPerKey(corpus5, "doc_id", "source", cap = cap,
          salt = "full")
        val s = Sampling.assignSplit(c, "doc_id", salt = "full")
        val bySplit = s.groupBy("split").count().collect()
        require(bySplit.map(_.getLong(1)).sum == 20L * cap,
          s"cap must bind on all 20 sources: ${bySplit.mkString(",")}")
        s.select(col("doc_id"), col("source"), col("split"), col("text"))
      }

      // ── read model: latest-wins upsert with a VERSIONED stamp (the
      // concurrent-projector-safe mode); replaying the same batch version is
      // a no-op on reads, and a laggard replay can never roll state back
      time("read-model merge + current (and idempotent re-merge)") {
        val rm = new ReadModel(spark, s"$dir/readmodel", "doc_id")
        rm.merge(capped, version = Some(1L))
        require(rm.current().count() == 20L * cap, "read model row count")
        rm.merge(capped, version = Some(1L))
        require(rm.current().count() == 20L * cap, "re-merge must not change reads")
      }

      // reclaim the multi-GB temp log before the next run
      val hp = new org.apache.hadoop.fs.Path(dir)
      hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true): Unit

      val total = (System.nanoTime() - t0) / 1e9
      println(f"FPIPE[$tag] TOTAL ($n docs)                              $total%.2f s")
      total
    }

    val tBase = scenario(nBase, "1x")
    val tBig = scenario(nBig, s"${nBig / nBase}x")
    val perMBase = tBase / (nBase / 1e6)
    val perMBig = tBig / (nBig / 1e6)
    val ratio = perMBig / perMBase
    println(f"FPIPE per-Mdoc: base $perMBase%.1f s, big $perMBig%.1f s, ratio $ratio%.2f")
    require(ratio <= 2.5,
      f"composed pipeline is superlinear: $ratio%.2f s/Mdoc ratio at ${nBig / nBase}×")
    println(s"""{"full_docs":$nBig,"base_docs":$nBase,""" +
      f""""sec_per_mdoc_base":$perMBase%.2f,"sec_per_mdoc_big":$perMBig%.2f,""" +
      f""""ratio":$ratio%.2f,"ok":true}""")
    spark.stop()
  }
}
