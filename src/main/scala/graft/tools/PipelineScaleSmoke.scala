package graft.tools

import graft.ops.{Dedup, Multimodal, Sampling, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Training-pipeline scale smoke: synthesize a corpus well beyond the bench
  * tables (default 200k documents ≈ 40× sf0.1, SCALE_DOCS to override) and
  * time the data-pipeline operators end-to-end — dedup candidate generation
  * and survivor election, sampling/splits, multimodal frame decode plumbing,
  * and LSH/IVF ANN over 200k 64-dim embeddings.
  *
  * Documents and embeddings are derived deterministically from the row index
  * (hash-mixed token picks, no RNG), with planted near-duplicates: every
  * 10th document is re-emitted with one token changed, so the expected
  * survivor structure is known and asserted, not just timed.
  */
object PipelineScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = sys.env.getOrElse("SCALE_DOCS", "200000").toInt
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PSCALE $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // ── deterministic corpus: ~40 tokens/doc from a 5000-word vocabulary;
    // doc 10k+1 duplicates doc 10k with one token swapped (planted near-dup)
    val docs = time(s"synthesize $nDocs docs (planted near-dups)") {
      val d = spark.range(nDocs.toLong).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map { j =>
          // pair 10k/10k+1 share the base index except token 7
          val base = when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id"))
          val idx = if (j == 7) col("id") * 31 + j else base * 31 + j
          // xxhash64, NOT a linear multiplier: (a·idx) mod 5000 factors
          // through idx mod 5000 and collapses the corpus to 5000 texts
          concat(lit("w"), pmod(xxhash64(idx), lit(5000)))
        }: _*).as("text"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
      d.localCheckpoint() // materialize once; every stage below reads this
    }

    // ── exact dedup: the planted pairs differ by one token → not exact dups
    // (save the odd token-hash collision making a pair identical after all)
    time("exact dedup groups (hash groupBy)") {
      val n = Dedup.exactGroups(docs, "doc_id", "text").count()
      require(n <= nDocs && n >= nDocs - nDocs / 2000, s"got $n groups")
    }

    // ── minhash → LSH candidates → Jaccard verify → survivor components
    val survivors = time("near-dup survivors (LSH + verify + components)") {
      Dedup.dedupSurvivors(docs, "doc_id", "text", threshold = 0.5, rounds = 3)
        .localCheckpoint()
    }
    time("assert planted pairs collapsed") {
      val kept = survivors.filter(col("is_survivor")).count()
      val pairs = nDocs / 10 // docs ≡ 1 (mod 10) near-duplicate their base
      // a planted pair shares 35/41 distinct shingles (J ≈ 0.85 > 0.5); with
      // 4 one-hash bands P(no band collides) ≈ 0.15^4, so allow a ~0.1%
      // LSH-miss tail; genuine sub-threshold merges are filtered by the
      // Jaccard verify, so the lower bound only leaves 1% slack for
      // coincidental ≥0.5 overlaps
      require(kept <= nDocs - pairs + nDocs / 1000,
        s"kept $kept, expected <= ${nDocs - pairs} (+0.1% LSH-miss tail)")
      require(kept >= nDocs - pairs - nDocs / 100, s"kept $kept suspiciously low")
    }

    // ── simhash over the full corpus
    time("simhash32 corpus fingerprints") {
      require(Dedup.simhash32(docs, "doc_id", "text").count() == nDocs)
    }

    // ── simhash64 banded near-dup pairs at 1M docs: 4×16-bit bands. Doc
    // 10k+1 is an EXACT copy of doc 10k (identical token multiset → same
    // fingerprint → hamming 0), so banding recall is provably total for the
    // planted pairs; everything else is hash-derived text whose 64-bit
    // fingerprints collide within hamming 2 with odds ~2e3/2^64 per pair —
    // expected false positives over C(1M,2) pairs: ~5e-5. In-bucket volume
    // stays ~4·N²/65536 expanded map-side — the plan that survives 100×.
    val nSim = sys.env.getOrElse("SCALE_SIMHASH_DOCS", "1000000").toInt
    val simDocs = time(s"synthesize $nSim docs (planted exact dups)") {
      spark.range(nSim.toLong).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map { j =>
          val base = when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id"))
          concat(lit("w"), pmod(xxhash64(base * 31 + j), lit(5000)))
        }: _*).as("text")).localCheckpoint()
    }
    time(s"simhash64 banded pairs ($nSim docs, 4x16-bit bands)") {
      val pairs = Dedup.simhashPairs(simDocs, "doc_id", "text", maxHamming = 2)
        .localCheckpoint()
      val planted = pairs.filter(col("doc_a") % 10 === 0 &&
        col("doc_b") === col("doc_a") + 1 && col("hamming") === 0).count()
      val expected = (nSim.toLong + 8) / 10 // ids ≡ 1 (mod 10), base in range
      require(planted == expected, s"planted dups recovered: $planted of $expected")
      val total = pairs.count()
      require(total <= expected + math.max(1L, expected / 100),
        s"false-positive volume suspicious: $total pairs for $expected planted")
    }

    // ── d12 at corpus scale: the incremental batch↔corpus screen in the
    // PRESIGNED production shape (corpus signatures computed once — the
    // frame you persist at 100 TB — candidate corpus sets rebuilt via
    // semi-join, nothing corpus-sized materialized per batch). Every batch
    // doc (ids ≡ 1 mod 10) is an EXACT copy of its corpus base, so the
    // planted recall is a measured number with a hard floor, not a guess.
    time(s"incremental screen presigned (${nSim / 10} batch vs ${nSim - (nSim + 8) / 10} corpus)") {
      val batch = simDocs.filter(col("doc_id") % 10 === 1)
      val corpus = simDocs.filter(col("doc_id") % 10 =!= 1)
      val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text", bands = 4)
      val out = Dedup.incrementalDedupPresigned(corpus, sigs, batch,
        "doc_id", "text", threshold = 0.5).localCheckpoint()
      val nBatch = out.count()
      val flagged = out.filter(!col("is_new")).count()
      val recall = flagged.toDouble / nBatch
      println(f"PSCALE   d12 planted recall = $recall%.4f ($flagged of $nBatch)")
      require(recall >= 0.999,
        f"incremental screen must flag planted exact dups: recall $recall%.4f")
    }

    // ── span-level exact-substring dedup: planted pairs share every 10-token
    // span except the one containing the swapped token 7
    time("span dedup (10-token windows)") {
      val out = Dedup.spanDedup(docs, "doc_id", "text", spanTokens = 10)
        .agg(sum("n_dropped"), count(lit(1))).collect()(0)
      require(out.getLong(1) == nDocs)
      // each planted dup (10% of docs) drops ≥3 of its 4 spans
      require(out.getLong(0) >= nDocs.toLong / 10 * 3,
        s"expected >=${nDocs / 10 * 3} dropped spans, got ${out.getLong(0)}")
    }

    // ── planted HOT SPAN: every doc gains the same 10-token boilerplate
    // tail → ONE span key with nDocs occurrences. The min-struct
    // first-occurrence aggregation collapses it map-side before the shuffle;
    // the per-span row_number() window it replaced sorted every occurrence
    // in a single task.
    time(s"span dedup with planted hot span ($nDocs occurrences)") {
      val boiler = lit(" " + (0 until 10).map(j => s"hot$j").mkString(" "))
      val hot = docs.select(col("doc_id"), concat(col("text"), boiler).as("text"))
      val keptBoiler = Dedup.spanDedup(hot, "doc_id", "text", spanTokens = 10)
        .filter(col("kept_text").contains("hot0")).count()
      require(keptBoiler == 1L, s"hot span must survive exactly once, kept $keptBoiler")
    }

    // ── substring-level dedup (overlapping windows): the planted pair
    // duplicates every 8-token window not touching swapped token 7, so the
    // duplicate doc loses most of its tokens while the base keeps all.
    time("substring dedup (8-token overlapping windows)") {
      val out = Dedup.substringDedup(docs, "doc_id", "text", windowTokens = 8)
        .agg(sum("n_dropped"), count(lit(1))).collect()(0)
      require(out.getLong(1) == nDocs)
      // each planted dup drops the windows clear of token 7: ≥20 of its 40
      // tokens go; bases keep theirs (first occurrence wins by (id, pos))
      require(out.getLong(0) >= nDocs.toLong / 10 * 20,
        s"expected >=${nDocs / 10 * 20} dropped tokens, got ${out.getLong(0)}")
    }

    // ── incremental screen: the planted near-dups ≡1 (mod 10) as the batch,
    // everything else as the accepted corpus → every batch doc must match
    time(s"incremental dedup (${nDocs / 10} batch vs ${nDocs - nDocs / 10} corpus)") {
      val batch = docs.filter(col("doc_id") % 10 === 1)
      val corpus = docs.filter(col("doc_id") % 10 =!= 1)
      val out = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
        threshold = 0.5).localCheckpoint()
      val dups = out.filter(!col("is_new")).count()
      require(dups >= nDocs.toLong / 10 * 99 / 100,
        s"planted batch dups must be flagged (≥99%%): got $dups of ${nDocs / 10}")
    }

    // ── exact connected components at graph scale: a synthetic pair graph
    // with an ADVERSARIAL diameter (one chain of nDocs/10 nodes — the shape
    // fixed-round propagation cannot close) plus nDocs/10 disjoint triangles.
    // Expected structure is exact: one chain component + nDocs/10 triangle
    // components, every label the component minimum.
    time(s"connected components (chain diameter ${nDocs / 10} + ${nDocs / 10} triangles)") {
      val chainN = nDocs.toLong / 10
      val (nodes, pairs) = GraphFixtures.chainAndTriangles(spark, chainN, chainN)
      val labels = Dedup.connectedComponents(nodes, pairs).localCheckpoint()
      GraphFixtures.assertExactLabels(labels, chainN, chainN)
    }

    // ── per-domain cap: 20 sources, cap far below rows/source
    time("per-domain cap (1000/source)") {
      val n = Sampling.capPerKey(docs, "doc_id", "source", cap = 1000, salt = "c")
        .count()
      require(n == math.min(nDocs.toLong, 20L * 1000), s"got $n")
    }

    // ── PII scrub over the corpus (regex-only, no shuffle)
    time("pii screen + redact") {
      import graft.ops.TextAnalysis
      val pii = concat(col("text"), lit(" u"), col("doc_id"), lit("@x.example.com"))
      val out = docs.select(
          TextAnalysis.piiEmailCount(pii).as("e"),
          length(TextAnalysis.piiRedact(pii)).as("l"))
        .agg(sum("e"), count(lit(1))).collect()(0)
      require(out.getLong(0) == nDocs.toLong, s"one planted email per doc: ${out.getLong(0)}")
    }

    // ── sampling + split assignment
    time("stratified sample + split assign") {
      val sampled = Sampling.hashSampleBy(docs, "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.1, salt = "mix").count()
      require(sampled > 0)
      val splits = Sampling.assignSplit(docs, "doc_id", salt = "sp")
        .groupBy("split").count().collect()
      require(splits.map(_.getLong(1)).sum == nDocs)
    }

    // ── multimodal: pack → all-frames → batched decode kernel
    time("multimodal pack + frames + feature kernel") {
      val packed = Multimodal.pack(docs, "doc_id", "text", "video/raw")
      val frames = Multimodal.frameSampleAll(packed, frameBytes = 32).count()
      require(frames > nDocs.toLong) // ~240 bytes/doc → ~7 frames each
      require(Multimodal.extractFeatureSums(packed, dim = 8).count() == nDocs)
    }

    // ── tfidf / chunking / packing / contamination at corpus scale
    time("tfidf top-3 terms per doc") {
      require(graft.ops.TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 3)
        .count() > 0)
    }
    time("chunk into 20-token windows (overlap 5)") {
      require(graft.ops.TextAnalysis.chunk(docs, "doc_id", "text",
        chunkTokens = 20, overlap = 5).count() >= nDocs.toLong * 2)
    }
    time("pack into 2048-token bins per source") {
      require(graft.ops.TextAnalysis.packSequences(docs, "doc_id", "text",
        "source", budgetTokens = 2048).count() == nDocs)
    }
    time("contamination: 1k probes vs corpus") {
      // planted dups guarantee hits: probes ≡ 1 (mod 10) are contained in
      // their base docs at ~35/41 shingle containment
      val hits = Dedup.containment(docs,
        docs.filter(col("doc_id") % 10 === 1 && col("doc_id") < 10000),
        "doc_id", "text", threshold = 0.5).count()
      require(hits >= 900, s"expected ~1000 planted containment hits, got $hits")
    }

    // ── ANN at 200k × 64 dims: LSH-bucketed and IVF top-k for 64 queries
    val emb = time("synthesize embeddings (64-dim)") {
      spark.range(nDocs.toLong).select(
        col("id").as("vec_id"),
        array((0 until 64).map(j =>
          (pmod(xxhash64(col("id") * 67 + j), lit(1000)) / 500.0 - 1.0)
            .cast("float")): _*).as("embedding"))
        .localCheckpoint()
    }
    val queries = emb.filter(col("vec_id") < 64)
    time("sign-LSH ANN top-5 (64 queries)") {
      require(Similarity.signLshTopK(emb, queries, "vec_id", "embedding",
        k = 5, bits = 12).count() > 0)
    }
    time("IVF ANN top-5 (64 cells, driver-local farthest-first seeds)") {
      val cents = Similarity.farthestFirstCentroidsLocal(
        Sampling.hashSample(emb, "vec_id", 0.02, salt = "c"),
        "vec_id", "embedding", nlist = 64)
      require(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 64, nprobe = 4, centroids = Some(cents)).count() > 0)
    }

    // ── embedding near-dup pairs at 1M vectors: multi-table SRP banding.
    // Vector 10k+1 copies vector 10k with dim 7 nudged by +0.02 (angle
    // ~0.004 rad, cosine ≈ 0.99999): per-bit flip odds ~0.0014, so a
    // planted pair shares a 16-bit bucket in any one of the 8 tables with
    // P(miss all) ≈ 2e-14 × pairs — every planted pair MUST be recovered,
    // while a random pair collides with odds ~8/2^16 (the join stays an
    // equi-join sliver, never all-pairs).
    val nVecs = sys.env.getOrElse("SCALE_VECS", "1000000").toInt
    val emb1m = time(s"synthesize $nVecs embeddings (planted near-dups)") {
      spark.range(nVecs.toLong).select(
        col("id").as("vec_id"),
        array((0 until 64).map { j =>
          val base = when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id"))
          val x = (pmod(xxhash64(base * 67 + j), lit(1000)) / 500.0 - 1.0)
          (if (j == 7) x + when(col("id") % 10 === 1, 0.02).otherwise(0.0) else x)
            .cast("float")
        }: _*).as("embedding"))
        .localCheckpoint()
    }
    time(s"embedding near-dup pairs ($nVecs vectors, 8×16-bit SRP bands)") {
      val pairs = Similarity.cosinePairs(emb1m, "vec_id", "embedding",
        threshold = 0.9).localCheckpoint()
      val planted = pairs.filter(col("id_a") % 10 === 0 &&
        col("id_b") === col("id_a") + 1).count()
      val expected = ((nVecs.toLong + 8) / 10) // ids ≡ 1 (mod 10), base in range
      require(planted == expected,
        s"planted near-dups recovered: $planted of $expected")
      val total = pairs.count()
      // slack floor of 1 keeps the bound satisfiable when SCALE_VECS is
      // downscaled below ~100 (expected/100 truncates to 0 there)
      require(total <= expected + math.max(1L, expected / 100),
        s"false-positive volume suspicious: $total pairs for $expected planted")
    }

    // ── SQ8 compressed-domain ANN vs exact float scan at 1M vectors: the
    // memory-bandwidth play for 100 TB (int8 corpus is 4× smaller than
    // float32, so a full-scan rank touches a quarter of the bytes). Both
    // scans are broadcast-probe shapes; recall@5 against the exact ranking
    // is the honest quality number — random dense vectors are the WORST
    // case for quantized ranking (every neighbour sits in the same thin
    // cosine shell, so 8-bit rounding reorders the shell), so the bound
    // here is a floor, not the figure of merit.
    {
      import org.apache.spark.sql.expressions.Window
      val q16 = emb1m.filter(col("vec_id") < 16)
      // exact float top-5 by the same score SQ8 approximates (inner product),
      // so recall isolates pure quantization loss
      val exact = time(s"exact float top-5 full scan ($nVecs vectors, 16 queries)") {
        val q = q16.select(col("vec_id").as("qid"),
          Similarity.asDouble(col("embedding")).as("qe"))
        val c = emb1m.select(col("vec_id"),
          Similarity.asDouble(col("embedding")).as("ce"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("vec_id"))
        c.join(broadcast(q), col("vec_id") =!= col("qid"))
          .withColumn("score", Similarity.dot(col("qe"), col("ce")))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
          .select("qid", "vec_id").localCheckpoint()
      }
      val sq = time(s"SQ8 integer top-5 full scan ($nVecs vectors, 16 queries)") {
        Similarity.sqTopK(emb1m, q16, "vec_id", "embedding", k = 5)
          .localCheckpoint()
      }
      val rec = Similarity.recallAtK(exact, sq, 5)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"PSCALE   sq8 recall@5 vs exact inner product = $rec%.3f")
      require(rec >= 0.5, s"SQ8 recall collapsed: $rec")
      // the production shape: levels precomputed ONCE (what you persist at
      // 100 TB), probes served from the compressed domain — the one-shot
      // sqTopK above re-derives levels per call and pays the float scan back
      val cq = time("SQ8 quantize corpus once (persist shape)") {
        Similarity.sqQuantize(emb1m, "vec_id", "embedding",
            Similarity.sqBounds(emb1m, "embedding"))
          .select(col("vec_id"), col("qv").as("cq")).localCheckpoint()
      }
      time(s"SQ8 probe over precomputed levels ($nVecs vectors, 16 queries)") {
        val qq = cq.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("cq").as("qq"))
        require(Similarity.sqTopKQuantized(cq, qq, 5).count() == 16 * 5)
      }
      // planted near-pairs survive quantization: vec 10k+1 ≈ vec 10k at
      // cosine ~0.99999, far above the shell — its quantized dot must rank
      // it #1 for every planted query among the 16
      val planted = sq.filter(col("qid") % 10 === 1 && col("rn") === 1 &&
        col("vec_id") === col("qid") - 1).count()
      require(planted == 2L, s"planted twins must top SQ8 ranking: got $planted of 2")
    }

    // ── IVF-SQ8 persisted index at 1M vectors: build on evens, append odds
    // (the scale/centroid freeze contract at scale), then probe in the
    // compressed domain. Recall@5 is measured against the FLOAT probe over
    // the same index and nprobe — isolating pure pre-rank eviction loss,
    // since the rescore is exact by construction — and the planted twins
    // (cosine ≈ 0.99999) are a hard floor: 8-bit pre-ranking must never
    // evict a near-identical vector from the rerank·k sliver.
    {
      val idx = java.nio.file.Files.createTempDirectory("graftivfsq1m")
        .toFile.getAbsolutePath
      val cents = Similarity.farthestFirstCentroidsLocal(
        Sampling.hashSample(emb1m, "vec_id", 0.02, salt = "c"),
        "vec_id", "embedding", nlist = 64)
      time(s"IVF-SQ8 build evens ($nVecs vectors, 64 cells)") {
        Similarity.buildIvfSqIndex(emb1m.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", idx, nlist = 64, centroids = Some(cents))
      }
      time("IVF-SQ8 append odds (frozen scale + centroids)") {
        Similarity.appendToIvfSqIndex(spark, idx,
          emb1m.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
      }
      val q16 = emb1m.filter(col("vec_id") < 16)
      val float = time("IVF float probe top-5 (16 queries, nprobe=8)") {
        Similarity.ivfTopKIndexed(spark, idx, q16, "vec_id", "embedding",
          k = 5, nprobe = 8).localCheckpoint()
      }
      val sqp = time("IVF-SQ8 probe top-5 (16 queries, nprobe=8, rerank=4)") {
        Similarity.ivfSqTopKIndexed(spark, idx, q16, "vec_id", "embedding",
          k = 5, nprobe = 8, rerank = 4).localCheckpoint()
      }
      val rec = Similarity.recallAtK(float, sqp, 5)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"PSCALE   ivf-sq8 recall@5 vs float probe = $rec%.3f")
      // measured 0.888 at 1M deterministic vectors (worst case: random
      // dense vectors put every neighbour in the same thin cosine shell,
      // where 8-bit pre-ranking reorders hardest); the corpus is
      // hash-derived, so this is a reproducible fence, not a guess
      require(rec >= 0.8, s"IVF-SQ8 pre-rank recall collapsed: $rec")
      val planted = sqp.filter(col("qid") % 10 === 1 && col("rn") === 1 &&
        col("vec_id") === col("qid") - 1).count()
      require(planted == 2L,
        s"planted twins must top IVF-SQ8 ranking: got $planted of 2")

      // the normalize flag at 1M: the float probe ranks by COSINE, the raw
      // int8 pre-rank by INNER PRODUCT — even this corpus's mild norm
      // spread rounds enough agreement away that raw recall sits at ~0.888;
      // cosine-preserving codes close the metric mismatch entirely
      // (measured 1.000 at rerank=4). The adversarial norm-skew case is
      // spec'd in SkewTextOpsSpec; this pins the at-scale gain.
      val idxN = java.nio.file.Files.createTempDirectory("graftivfsqn1m")
        .toFile.getAbsolutePath
      time(s"IVF-SQ8 build NORMALIZED evens + append odds") {
        Similarity.buildIvfSqIndex(emb1m.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", idxN, nlist = 64, centroids = Some(cents),
          normalize = true)
        Similarity.appendToIvfSqIndex(spark, idxN,
          emb1m.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
      }
      val sqn = time("IVF-SQ8 normalized probe top-5 (16 queries, nprobe=8, rerank=4)") {
        Similarity.ivfSqTopKIndexed(spark, idxN, q16, "vec_id", "embedding",
          k = 5, nprobe = 8, rerank = 4).localCheckpoint()
      }
      val recN = Similarity.recallAtK(float, sqn, 5)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"PSCALE   ivf-sq8 NORMALIZED recall@5 vs float probe = $recN%.3f")
      require(recN >= rec,
        f"normalized pre-rank must match or beat the raw int-dot: $recN%.3f vs $rec%.3f")
    }

    // ── IVF-PQ persisted index at 1M vectors: the 32×-compressed serving
    // shape (8 one-byte codes per 64-dim vector vs SQ8's 64 bytes). Same
    // freeze contract (build evens, append odds against persisted
    // centroids + codebooks), probe ranks by ADC table lookups only.
    // Recall vs the float probe is measured with rerank slack sized to the
    // compression: PQ collapses the thin random-vector cosine shell far
    // harder than SQ8 (4 bits/subspace vs 8 bits/dim), so the pre-rank
    // needs a wider exact-rescore sliver (rerank=64 → 320 candidates/query
    // ≈ 2.6% of a probed partition — still a 40× cut of the exact-rescore
    // work) — exactly the production tuning story the index exists to
    // support: compression buys bandwidth, rerank buys recall back.
    {
      val idx = java.nio.file.Files.createTempDirectory("graftivfpq1m")
        .toFile.getAbsolutePath
      val cents = Similarity.farthestFirstCentroidsLocal(
        Sampling.hashSample(emb1m, "vec_id", 0.02, salt = "c"),
        "vec_id", "embedding", nlist = 64)
      time(s"IVF-PQ build evens ($nVecs vectors, 64 cells, m=8 kc=16)") {
        Similarity.buildIvfPqIndex(emb1m.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", idx, nlist = 64, m = 8, kc = 16,
          centroids = Some(cents))
      }
      time("IVF-PQ append odds (frozen centroids + codebooks)") {
        Similarity.appendToIvfPqIndex(spark, idx,
          emb1m.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
      }
      val q16 = emb1m.filter(col("vec_id") < 16)
      val float = time("IVF float probe top-5 (16 queries, nprobe=8)") {
        Similarity.ivfTopKIndexed(spark, idx, q16, "vec_id", "embedding",
          k = 5, nprobe = 8).localCheckpoint()
      }
      val pqp = time("IVF-PQ probe top-5 (16 queries, nprobe=8, rerank=64)") {
        Similarity.ivfPqTopKIndexed(spark, idx, q16, "vec_id", "embedding",
          k = 5, nprobe = 8, rerank = 64).localCheckpoint()
      }
      val rec = Similarity.recallAtK(float, pqp, 5)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"PSCALE   ivf-pq recall@5 vs float probe = $rec%.3f")
      require(rec >= 0.4, s"IVF-PQ pre-rank recall collapsed: $rec")
      // a planted near-twin's code equals the query's own argmin code in
      // (almost) every subspace, so its ADC distance sits at the global
      // floor — 1-byte-per-subspace ranking must never evict it
      val planted = pqp.filter(col("qid") % 10 === 1 && col("rn") === 1 &&
        col("vec_id") === col("qid") - 1).count()
      require(planted == 2L,
        s"planted twins must top IVF-PQ ranking: got $planted of 2")

      // ── k-means PQ codebooks vs the seeded first-kc books. METHOD NOTE:
      // the seeded books ARE the first-kc corpus vectors, so evaluating on
      // the first-16 queries hands the seeded books perfect resolution
      // around exactly those points (half that query set IS a codeword in
      // every subspace — its ADC self-distance term is 0). Measured, that
      // bias inverts the comparison (+~0.25 recall to the seeded side), so
      // the seeded-vs-trained floors run on DISJOINT queries far from the
      // seed block. Lloyd means minimize within-cell variance — the ADC
      // approximation error — so trained books must rank at least as well
      // at EQUAL rerank; on this corpus the measured gap is ~2× recall.
      val books = time("PQ k-means codebooks (2% sample, m=8 kc=16, 8 iters)") {
        Similarity.pqCodebooksKmeans(
          Sampling.hashSample(emb1m, "vec_id", 0.02, salt = "pqk"),
          "vec_id", "embedding", m = 8, kc = 16)
      }
      val idxK = java.nio.file.Files.createTempDirectory("graftivfpqk")
        .toFile.getAbsolutePath
      time("IVF-PQ build evens with k-means books") {
        Similarity.buildIvfPqIndex(emb1m.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", idxK, nlist = 64, m = 8, kc = 16,
          centroids = Some(cents), codebooks = Some(books))
      }
      time("IVF-PQ append odds (frozen k-means books)") {
        Similarity.appendToIvfPqIndex(spark, idxK,
          emb1m.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
      }
      // disjoint query block (includes two planted twins: 1001, 1011)
      val qk = emb1m.filter(col("vec_id") >= 1000 && col("vec_id") < 1016)
      val floatK = time("IVF float probe top-5 (disjoint queries)") {
        Similarity.ivfTopKIndexed(spark, idx, qk, "vec_id", "embedding",
          k = 5, nprobe = 8).localCheckpoint()
      }
      def recallOf(indexPath: String, which: String, rerank: Int): Double = {
        val pq = time(s"IVF-PQ $which probe top-5 (disjoint, rerank=$rerank)") {
          Similarity.ivfPqTopKIndexed(spark, indexPath, qk, "vec_id", "embedding",
            k = 5, nprobe = 8, rerank = rerank).localCheckpoint()
        }
        Similarity.recallAtK(floatK, pq, 5)
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
      }
      val recS16 = recallOf(idx, "seeded", 16)
      val recS64 = recallOf(idx, "seeded", 64)
      val recK16 = recallOf(idxK, "k-means", 16)
      val recK64 = recallOf(idxK, "k-means", 64)
      println(f"PSCALE   ivf-pq DISJOINT-query recall@5: seeded $recS16%.3f/@16 " +
        f"$recS64%.3f/@64, K-MEANS $recK16%.3f/@16 $recK64%.3f/@64")
      require(recK16 >= recS16 && recK64 >= recS64,
        f"trained books must never rank worse than seeded books at equal " +
          f"rerank on seed-disjoint queries: k-means $recK16%.3f/$recK64%.3f " +
          f"vs seeded $recS16%.3f/$recS64%.3f")
      // the planted twins' floor holds under trained books too
      val pqk16 = Similarity.ivfPqTopKIndexed(spark, idxK, qk,
        "vec_id", "embedding", k = 5, nprobe = 8, rerank = 16)
      val plantedK = pqk16.filter(col("qid") % 10 === 1 && col("rn") === 1 &&
        col("vec_id") === col("qid") - 1).count()
      require(plantedK == 2L,
        s"planted twins must top the k-means IVF-PQ ranking: got $plantedK of 2")
    }

    spark.stop()
  }
}
