package graft

import graft.log.EventLog
import graft.store.EventStore
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the properties we tuned for (pushdown, pruning,
  * broadcast) asserted against the executed plans so they can't silently
  * rot. These are the local proxies for the 100 TB behaviors.
  */
class PlanShapeSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("range scan pushes id bounds and event-kind filters into the parquet scan") {
    val p = plan("s3_range_scan")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThan(event_id,100)"), p.take(2000))
    assert(p.contains("LessThanOrEqual(event_id,600)"))
    assert(p.contains("In(event_type,"))
  }

  test("scan reads only the projected columns") {
    val p = plan("s3_range_scan")
    assert(p.contains("ReadSchema: struct<event_id:bigint,user_id:bigint,event_type:string,value:double>"))
  }

  test("multimodal metadata predicates prune the binary column from the scan") {
    // the core multimodal scale claim: filtering/selecting on metadata must
    // never read the (large) content bytes — ReadSchema excludes `content`
    val tmp = Files.createTempDirectory("graftmm").toFile.getAbsolutePath
    graft.ops.Multimodal.pack(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "img")
      .write.parquet(s"$tmp/media")
    val p = spark.read.parquet(s"$tmp/media")
      .filter(col("meta.n_bytes") > 100)
      .select(col("media_id"), col("meta.width"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema") && !p.contains("content"),
      "content bytes must not be scanned for metadata-only queries")
    assert(p.contains("PushedFilters") && p.contains("n_bytes"),
      "metadata predicate should push to parquet")
  }

  test("dimension joins broadcast (no sort-merge join in q5/j2)") {
    Seq("j2_broadcast_join", "q5_local_supplier").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q should broadcast dims")
    }
    // q5 keeps exactly one non-broadcast (shuffle) join: lineitem ⋈ orders
    val q5 = plan("q5_local_supplier")
    assert(!q5.contains("CartesianProduct"))
  }

  test("aggregations are partial before the exchange (map-side combine)") {
    val p = plan("q1_pricing_summary")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) > firstAgg,
      "expected partial + final aggregate pair")
  }

  test("per-query shuffle budgets hold (regression fence from tools/PlanStats)") {
    // Measured ceilings: a query exceeding its budget gained a shuffle it
    // never needed — the failure mode that silently kills 100 TB runs.
    val budgets = Map(
      "a1_rehydrate_fold" -> 1, "a4_projection_state" -> 1, "a5_distinct_streams" -> 1,
      "a6_resume_bounds" -> 1, "a8_asof_state" -> 1, "c1_base64" -> 0,
      // o1: the returned lag frame is one agg over the committed scan with
      // the token frame broadcast — the import/catchup side effects run
      // eagerly before it
      "o1_lag_stats" -> 1,
      // d3: the codegen'd simhash_packed expression made fingerprinting a
      // pure projection — zero shuffles
      "d1_exact_dedup" -> 1, "d2_minhash_lsh" -> 2, "d3_simhash" -> 0,
      // d2/d4/d6/d8/d12: the codegen'd MinhashSigs projection removed the
      // signature stage's explode+groupBy exchanges from the whole minhash
      // family; what remains is the bucket aggregation, candidate-sized
      // label/edge traffic, and (d8) the quality window
      // d5: the cross-table pair-dedup groupBy(id_a,id_b).agg(max(sim)) is the
      // one legitimate exchange — it moves candidate-PAIR-sized data (post
      // threshold filter), not the corpus; the band join itself stays an
      // equi-join on (t,bucket)
      // d4: the verify pair joins are PINNED to sort-merge with semi-pruned
      // sets legs (Dedup.jaccardVerifyFromSets) — the planner's array-width
      // underestimate made it broadcast the corpus-sized shingle frame at
      // sf10 (1.08 GB of task results, query dead); the honest scale-safe
      // plan pays 2 prune aggs + both-side exchanges on sliver-sized legs
      "d4_ngram_jaccard" -> 10, "d5_embedding_dedup" -> 1, "d6_dedup_survivors" -> 2,
      // d15/x9: the large-star/small-star contraction runs EAGERLY (per-round
      // convergence probes + checkpoints); the returned plan is the singleton
      // back-join over the checkpointed star-forest labels (d6's shape), plus
      // x9's broadcast of the component frame onto the corpus
      "d15_cc_clusters" -> 2, "x9_leakage_safe_split" -> 2,
      // d16: the star contractions run eagerly; the returned plan is the
      // touched-distinct + semi/anti label passes over the (checkpointed)
      // assignment, the new-pair filters, and the relabeled back-join union
      "d16_incremental_components" -> 6,
      // d10: the checkpointed signature frame broadcasts one side of the
      // band self-join, so only the pair-dedup distinct shuffles
      "d10_simhash_pairs" -> 1,
      "d7_embedding_survivors" -> 14, "d8_quality_survivors" -> 3,
      "t6_blocklist_scrub" -> 0,
      "t7_bigram_topk" -> 1, "w4_salted_agg" -> 2,
      // e3: the corpus-side cell assignment is now a zero-shuffle packed
      // argmax fold — what remains is the probe side's window exchanges
      "e1_cosine_topk" -> 1, "e2_lsh_ann" -> 1, "e3_ivf_ann" -> 2,
      // e20: four exact top-k windows (full + three truncation depths,
      // one qid exchange each) + the final per-depth census aggregate;
      // the truth join broadcasts
      "e20_matryoshka_recall" -> 5,
      // e6: the persisted-index probe — query-assign window exchange + the
      // final top-k window; the cell scan itself is pruned, never shuffled
      "e6_indexed_ann" -> 3,
      // e22: e6's probe shape (the census + nprobe choice run eagerly
      // before the returned plan; nprobe rides as a literal)
      "e22_auto_nprobe_ann" -> 3,
      // e21: the full-cell probe (e6's 3) + the full-dim truth's top-k
      // window + the single-row recall census; the truth side broadcasts
      // into the hit join
      "e21_mrl_indexed_recall" -> 5,
      // recall metrics join the exact and approx top-k subplans; their SMJ is
      // the left join of two tiny rank outputs (AQE broadcasts at runtime)
      "e4_ann_recall" -> 5, "e5_multitable_recall" -> 6,
      // e7: cell assignment is now the codegen'd kernel (zero shuffle) —
      // what remains is the label/meta/rep joins and the component
      // min-struct agg (skew-proof — no per-label window, so a giant dup
      // component never serializes); the label-propagation rounds run
      // eagerly behind checkpoints and AQE broadcasts the tiny rep/label
      // sides at runtime
      "e7_semdedup" -> 6,
      "f1_composite_filter" -> 0, "f6_prefix_match" -> 1, "f7_codec_decode" -> 0,
      "f8_message_shaping" -> 0, "j2_broadcast_join" -> 1, "j3_snapshot_stitch" -> 2,
      "j4_asof_join" -> 1, "j5_dim_rollup" -> 1, "q14_promo_effect" -> 0,
      "m1_forget_scrub" -> 0, "m3_upcast_read" -> 0, "mm_binary_meta" -> 0,
      "mm2_frame_sample" -> 0, "mm3_resize" -> 0, "mm4_features" -> 0,
      // mm5: decode+hash are kernel projections — zero exchanges; mm6: the
      // band self-join (SMJ: both sides corpus-sized) + pair distinct
      "mm5_phash" -> 0, "mm6_image_neardup" -> 3, "mm7_image_survivors" -> 2,
      "mm8_audio_energy" -> 0,
      // mm9: decode+hash is pure mapPartitions lineage, zero shuffles;
      // mm10: mm6's banded pair machinery (band self-join + pair distinct)
      // plus the per-video-pair rollup aggregate
      "mm9_video_frames" -> 0, "mm10_video_neardup" -> 4,
      // mm11: sniff is union of mapPartitions lineages — zero exchanges.
      // mm12/mm13: the probe side is checkpointed and BROADCAST into the
      // pruned index scan (zero exchange on the corpus side); only the
      // match rollup (mm12: AQE collapses distinct+agg into one) and
      // mm13's pair-distinct + per-video rollup shuffle
      // mm12: match rollup + the verdict id-list distinct (the distinct
      // reads the CHECKPOINTED probe signatures — one tiny exchange over
      // ≤4·|probe| rows bought the removal of a full probe re-decode)
      "mm11_sniff_meta" -> 0, "mm12_phash_index" -> 2,
      // mm24: mm12's screen shape through the agnostic entries — same
      // budget (verdict-id distinct + the candidate-join side over the
      // checkpointed probe signatures)
      "mm24_audio_index" -> 2,
      // mm20: sniff + a pure-Column route policy over unioned
      // mapPartitions synth slabs — the router adds ZERO exchanges
      "mm20_intake_route" -> 0,
      // mm21: routed pipeline over a checkpointed frame — filters and
      // mapPartitions decode kernels only, zero exchanges
      "mm21_routed_fingerprints" -> 0,
      // mm23: persist + re-route are side effects; the returned frame is a
      // partition-pruned video-route scan → decode → hash — zero exchanges
      "mm23_gif_video_upgrade" -> 0,
      // mm22: the persist + staged re-route run eagerly as side effects;
      // the returned plan is one census aggregate over the routed table
      "mm22_incremental_reroute" -> 1,
      "mm13_cross_modal" -> 2,
      // mm14: the pair machinery executes eagerly behind localCheckpoints
      // (d15's shape); the final plan is the component back-join
      "mm14_joint_dedup" -> 2,
      // mm15: mm6's banded pair machine over audio contour words;
      // mm16: decode->scale->re-encode->hash is pure kernel lineage
      "mm15_audio_fingerprint" -> 3, "mm16_resize_real" -> 0,
      // mm17: mm14's shape with two more modality pair machines, all
      // executed eagerly behind localCheckpoints inside
      // connectedComponents; the final plan is the component back-join
      "mm17_all_modal_dedup" -> 2,
      "p1_fnv_hash" -> 1, "p3_split_counts" -> 2, "q1_pricing_summary" -> 1,
      "q3_shipping" -> 1, "q5_local_supplier" -> 1, "q6_forecast_revenue" -> 0,
      "q10_returned_items" -> 1,
      "s1_stream_scan" -> 0,
      "s2_latest_per_key" -> 1, "s3_range_scan" -> 0, "s4_by_ids" -> 0,
      "s5_outbox_batch" -> 0, "t1_token_count" -> 0, "t2_quality_score" -> 0,
      "t3_lang_id" -> 0, "t4_fingerprint" -> 0, "t5_rare_word_ratio" -> 3,
      "t8_session_window" -> 1, "t8_sliding_window" -> 1, "t8_tumbling_window" -> 1,
      "u1_union_kinds" -> 0, "u2_active_minus_error" -> 1,
      "w2_version_assign" -> 1, "w3_keyset_page" -> 0, "w5_quality_rank" -> 1,
      // w7 returns the rebucketted log's plain active scan (the import/
      // rebucket side effects run eagerly before the returned plan); m5's
      // returned plan is the snapshot ⊕ tail stitch: tail semi-prune join,
      // per-stream aggs, and the full-outer stitch of two stream-keyed frames
      "w7_bulk_roundtrip" -> 0, "w8_sidecar_roundtrip" -> 0,
      "m5_retention_stitch" -> 3,
      // m6/m7 return the post-migration / post-fence active scan; the
      // import, migrate and fence side effects run eagerly before it
      "m6_migrate_sidecar" -> 0, "m7_fence_pass" -> 0, "m8_compact_roundtrip" -> 0,
      "m9_rebucket_copy" -> 0,
      // x1: sketch agg (1) + two split exact-distinct twins (2 each: the
      // distinct and its per-type recount) — split on purpose, a fused
      // multi-distinct Expand tripled the scan and measured 6× slower
      "x1_approx_distinct" -> 5, "x2_quantiles" -> 1,
      // x10: the ES key is a projection; ranking is the per-source window
      "x10_weighted_sample" -> 1,
      // x11: per-type sketch groupBy + the exact-distinct twin; the
      // single-row merged/direct frames broadcast into the cross joins
      "x11_sketch_merge" -> 2,
      "x3_hash_sample" -> 0, "x4_split_assign" -> 2,
      "t9_tfidf" -> 4, "d9_contamination" -> 3,
      // d14: same verify shape as d9 (pair agg + probe_n join) with the
      // Bloom scalar-subquery prefilter ahead of the corpus-side join
      "d14_bloom_screen" -> 3,
      "t10_chunk" -> 0, "w6_seq_pack" -> 1, "t11_repetition" -> 0,
      // d11: span min-struct agg (skew-proof), kept/total doc reassembly aggs;
      // d12: batch↔corpus band join,
      // semi-join prune of corpus verify docs (AQE broadcasts the candidate
      // ids), verify join — corpus shingle sets are never materialized
      "d11_span_dedup" -> 3, "d12_incremental" -> 2,
      // d17: the persisted-index screen — candidate c_id distinct + the
      // verify's b_id rollup; every batch-derived frame broadcasts and the
      // signature scan partition-prunes, so the corpus and the index are
      // never exchanged (pruning asserted in LshIndexSpec)
      "d17_lsh_index" -> 2,
      // d18: d17's screen plan over the post-forget index (the forget
      // rewrite runs eagerly before the returned frame)
      "d18_lsh_forget" -> 2,
      // d21: d17's screen plan — the census/cap choice and the capped
      // candidate join run eagerly behind the checkpoint; the cap rides
      // as a literal
      "d21_auto_capped_screen" -> 2,
      // d19: one grid-keyed aggregate over the signature scan (TakeOrdered
      // caps the top-k, no range exchange)
      "d19_lsh_health" -> 1,
      // d20: bucket census agg + band rollup agg + the 4-row band sort
      "d20_lsh_density" -> 3,
      // e19: one cell-keyed census agg; the one-row summary is a
      // SinglePartition exchange (not counted, q19's note)
      "e19_ivf_density" -> 1,
      // mm18: the estimator folds its ≤65-row distance histogram on the
      // driver (bounded by contract); the returned frame is a local table
      "mm18_phash_density" -> 0,
      // mm19: the radius decision executes eagerly (densityByDist's
      // bounded driver fold); the returned frame is mm12's screen plan
      "mm19_density_gated_screen" -> 2,
      // d13: dup-window min-struct agg (skew-proof, map-side combined),
      // covered-position distinct (duplicated occurrences × k only), doc
      // reassembly agg; the dup-window and drop-position joins broadcast at
      // this scale and stay equi-joins (AQE skew-split) at corpus scale
      "d13_substring_dedup" -> 3,
      "t12_pii_redact" -> 0, "x5_domain_cap" -> 1,
      // x6: domain-stats agg + the single-row weight total; the rate table
      // broadcasts back onto the corpus — nothing corpus-sized shuffles
      "x6_mixture_sample" -> 2,
      // t13: per-doc score agg (1) + the broadcast model subtree's vocab
      // aggregation, context-sum window and V single-row agg — all over the
      // checkpointed bigram-count frame, never the corpus
      "t13_lm_quality" -> 4,
      // j6: the (key,bin) equi-join + the per-episode rollup agg; the
      // zero-match left join broadcasts (AQE) — nothing explodes on range
      "j6_interval_join" -> 2,
      // x8: cutoff agg (broadcast back) + the (phase,source) pack window
      "x8_curriculum" -> 2,
      // x7: one two-phase group agg carrying sketch + exact percentiles
      "x7_approx_quantiles" -> 1,
      // t14/t15: pure integer-count projections, shuffle-free by construction
      "t14_gopher_rules" -> 0, "t15_encoding_qc" -> 0, "t16_script_mix" -> 0,
      // t17: a regexp_replace chain — pure projection, no exchange
      "t17_markup_strip" -> 0,
      // x13: t21's three (bucket census + totals single + per-doc sum)
      // plus the per-source sampler window; the source join broadcasts
      "x13_dsir_resample" -> 4,
      // t22: the vocab window/count run eagerly at build (driver maps);
      // the returned plan is word-distinct + a join that reuses its hash
      // partitioning — one exchange
      "t22_bpe_encode_ids" -> 1,
      // t23: count plan's vocab distinct + per-doc sum + the pack window
      // on source (the source join broadcasts)
      "t23_bpe_pack" -> 3,
      // t20: NB train census (vocab hash) + two 1-row single-partition
      // aggs (totals, prior) + the per-doc sum; the scorer constants
      // resolve driver-side and the model joins are broadcasts
      // (QualityModelSpec's plan fence)
      "t20_nb_quality" -> 3,
      // t21: ONE tagged-union bucket census (no census-vs-census join
      // exists) + the totals single + the per-doc sum
      "t21_dsir_weights" -> 3,
      // t18: word census + pair census aggregates (vocab-sized after the
      // first); the global top-20 is TakeOrdered, not an exchange
      "t18_bpe_pair_census" -> 2,
      // t19: the train loop runs eagerly (driver argmax); the returned
      // count plan is vocab distinct + the word join's two sides + the
      // per-doc sum
      "t19_bpe_token_count" -> 4,
      // x12: the one-pass census — a single grouped aggregate (the
      // quantiles ride the same ObjectHashAggregate), one exchange
      "x12_data_card" -> 1,
      // z1: the Morton key is shift/mask/add arithmetic — a pure projection
      "z1_zorder_key" -> 0,
      // e10: centroid assignment is the codegen'd kernel over a collected
      // 8-row centroid matrix — a pure scan projection
      "e10_embedding_outliers" -> 0,
      // e8: per-dim bounds agg + the scale's single-row agg; quantization is
      // a projection and the probe broadcasts — the corpus never reshuffles
      "e8_sq_ann" -> 3,
      // e12: PQ codes are a zero-shuffle projection and the query distance
      // tables broadcast — the only exchange is the per-query top-k window
      "e12_pq_ann" -> 1,
      // e14: one cell-table scan, centroids broadcast, one nlist-keyed
      // aggregate (partial before the exchange)
      "e14_index_health" -> 1,
      // e11: every exchange is probe-sliver-sized — the query-assign window
      // (10 rows) repeats textually inside both scans' DPP subqueries and
      // the candidate broadcast (runtime reuses the exchange), plus the
      // int-dot candidate window (≤ rerank·k·nq rows) and the final top-k
      // window; BOTH cell-table scans are dynamicpruning-pruned and the
      // corpus side is never shuffled (asserted in SkewTextOpsSpec)
      "e11_ivfsq_ann" -> 7,
      // e15: e11's probe with the normalize flag on — normalization is a
      // pure projection, so the exchange inventory is identical
      "e15_ivfsq_norm" -> 7,
      // e13: e11's probe shape with ADC arithmetic — the same probe-sliver
      // exchanges (query-assign window reused by both DPP subqueries and
      // the candidate broadcast, ADC candidate window, final top-k window);
      // the corpus side never shuffles and both cell scans DPP-prune
      // (asserted in SkewTextOpsSpec)
      "e13_ivfpq_ann" -> 7,
      // e16: the same probe plan over k-means books (books are a literal —
      // the plan shape cannot depend on their values)
      "e16_pqk_ann" -> 7,
      // e17: e11's probe-sliver exchanges (the semantic screen IS the SQ8
      // probe at k=1) — the verdict left-join broadcasts the thresholded
      // top-1 sliver, adding none
      "e17_semdedup_screen" -> 7,
      // e18: e11's probe plan over the post-forget geometry version (the
      // copy-on-write rewrite runs eagerly before the returned frame)
      "e18_ivf_forget" -> 7,
      // e9: the returned full-probe plan — query-side cell-assign window,
      // per-query top-k window, and the (tiny) query frame's own exchange;
      // build/append/recluster side effects run eagerly before it
      "e9_recluster_fullprobe" -> 3,
      // m10 returns the post-facade-write active scan; the import and
      // append side effects (claim-fenced) run eagerly before it
      "m10_facade_write" -> 0,
      // q18: per-order qty agg + the orders⋈sliver join exchanges (AQE
      // broadcasts the sliver at runtime); top-k is TakeOrdered, no range
      // exchange
      "q18_big_orders" -> 1,
      // q19: part broadcasts, the OR-of-ANDs is a post-join filter, the
      // global agg is partial + SinglePartition (not a hash exchange)
      "q19_disjunctive_pred" -> 0,
      // q4: the R-filtered key sliver broadcasts into the semi join; the
      // only hash exchange is the per-priority rollup
      "q4_priority_exists" -> 1,
      // w9: one documents scan; fingerprint-survivor window + per-source
      // rollup are the only data shuffles (split filter is a projection)
      "w9_pipeline_e2e" -> 2)
    val exchangeRe = "Exchange (hash|range|single)".r
    val missing = SparkEntry.queries.keySet -- budgets.keySet
    assert(missing.isEmpty, s"no shuffle budget declared for: $missing")
    val over = budgets.toSeq.sortBy(_._1).flatMap { case (name, budget) =>
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val n = exchangeRe.findAllIn(p).size
      if (n > budget) Some(s"$name: $n exchanges (budget $budget)") else None
    }
    assert(over.isEmpty, over.mkString("; "))
  }

  test("no sort-merge joins outside the snapshot stitch (dims broadcast)") {
    // j3: snapshot ⋈ tail is a true big-big join. d6: the label-propagation
    // joins read post-aggregate frames whose size statistics only exist at
    // runtime — the initial plan picks SMJ and AQE converts to broadcast.
    val smjAllowed = Set("j3_snapshot_stitch", "d6_dedup_survivors",
      // d4: verify pair joins deliberately PINNED to merge — neither side
      // of a pair-verify is reliably small (see the budget comment)
      "d4_ngram_jaccard",
      // d15/x9: same singleton back-join as d6 — the checkpointed label
      // frame's size exists only at runtime; AQE broadcasts it at execution
      "d15_cc_clusters", "x9_leakage_safe_split",
      // d16: semi/anti + back-join over runtime-sized checkpointed frames
      "d16_incremental_components",
      // mm6/mm7/mm10: the dHash band self-join — both sides are the
      // corpus-sized hashed frame, so SMJ is the only always-safe plan
      // (d4's reasoning); mm7 adds d15's component machinery on top, mm10
      // runs the same self-join over per-frame hashes
      "mm6_image_neardup", "mm7_image_survivors", "mm10_video_neardup",
      // mm14: composes mm6's band self-join AND d15's component machinery;
      // mm15: the same corpus-×-corpus band self-join over audio words;
      // mm17: mm14 plus the audio and video band self-joins
      "mm14_joint_dedup", "mm15_audio_fingerprint", "mm17_all_modal_dedup",
      // j6: the zero-match-keeping rollup joins episodes to a post-agg
      // count frame whose size exists only at runtime — AQE broadcasts it
      "j6_interval_join",
      "d7_embedding_survivors", "d8_quality_survivors",
      "e4_ann_recall", "e5_multitable_recall",
      // e7: same label-propagation shape as d6/d7 — the label/meta/rep
      // joins read post-aggregate frames whose sizes exist only at
      // runtime; AQE broadcasts them at execution
      "e7_semdedup",
      // d12: the batch↔corpus signature join reads two post-aggregate
      // frames with runtime-only statistics — AQE broadcasts the (small)
      // batch side at execution
      "d12_incremental",
      // d11: per-doc totals ⋈ kept-spans — two post-aggregate frames keyed
      // by doc id (exchange-reused partitioning; AQE re-plans at runtime)
      "d11_span_dedup",
      // m5: the snapshot ⊕ tail stitch is a full-outer join (like j3's) —
      // not broadcastable by definition
      "m5_retention_stitch")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filterNot(smjAllowed).filter { name =>
      SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
        .contains("SortMergeJoin")
    }
    assert(offenders.isEmpty, s"unexpected sort-merge joins in: $offenders")
  }

  test("t5's document-frequency join broadcasts (stop-word keys never hash-partition)") {
    val p = plan("t5_rare_word_ratio")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the token join must never shuffle corpus token rows on the token key")
  }

  test("embedding pair source (d5/d7) is an equi-join on (t, bucket), never a cartesian") {
    // The SRP-banded cosinePairs plan must join candidates through the
    // (table, bucket) hash keys — a CartesianProduct or BNLJ here is the
    // all-pairs O(N²) regression the banding exists to prevent.
    Seq("d5_embedding_dedup", "d7_embedding_survivors").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q must not plan a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q must not plan a nested-loop join")
    }
    // the band join keys appear in the pair-source join's KEY LIST — a bare
    // substring ("t#") would false-pass on any attribute ending in t (d7
    // feeds the same cosinePairs plan into label propagation, but
    // checkpoints it — the executed plan of d7 no longer shows the pair
    // source, d5's does)
    val p5 = plan("d5_embedding_dedup")
    val bandJoin =
      """(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \[t#\d+L?, bucket#\d+L?\]""".r
    assert(bandJoin.findFirstIn(p5).nonEmpty,
      s"d5 should join on exactly the (t, bucket) band keys\n${p5.take(3000)}")
  }

  test("event-log ULID range scan pushes string id bounds to parquet") {
    val tmp = Files.createTempDirectory("graftplan").toFile.getAbsolutePath
    val log = new EventLog(spark, tmp, numBuckets = 2, ulidSeed = Some(5L))
    val store = new EventStore(log, AccountType)
    store.create("01HXPLANSHAPE000000000001", Seq(AccountType.created(1, "P")))
    val p = log.range(graft.core.Ulid.timeOnly(0L), graft.core.Ulid.timeMax(4102444800000L))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThan(id,"), "ULID lower bound must push down")
    // the PushedFilters list is truncated in toString; the upper bound is
    // visible in the Filter node's condition
    assert(p.contains("<= 03QCPC7P00ZZZZZZZZZZZZZZZZ"), "ULID upper bound must be in the plan")
    assert(p.contains("EqualTo(migration,0)"))
  }

  test("declared discriminator keys push to parquet as disc_<key> columns") {
    // the reference indexes physical disc_* columns for tenant-scoped scans
    // (store/postgresql/store.go:712-726); our materialized twin must reach
    // PushedFilters so row-group stats can skip forever-cold tenants at 100 TB
    val tmp = Files.createTempDirectory("graftdiscpush").toFile.getAbsolutePath
    val log = new EventLog(spark, tmp, numBuckets = 2, ulidSeed = Some(7L),
      discriminatorPolicy = Some(graft.log.DiscriminatorPolicy(allowedKeys = Set("tenant"))))
    val store = new EventStore(log, AccountType)
    store.create("01HXDISCPUSH0000000000001", Seq(AccountType.created(5, "A")),
      callDiscriminator = Map("tenant" -> "abc"))
    store.create("01HXDISCPUSH0000000000002", Seq(AccountType.created(7, "B")),
      callDiscriminator = Map("tenant" -> "xyz"))

    // retrieve-scope path (withDiscriminator)
    val scoped = log.withDiscriminator(log.activeEvents, Map("tenant" -> "xyz"))
    val p1 = scoped.queryExecution.executedPlan.toString
    assert(p1.contains("PushedFilters") && p1.contains("disc_tenant"),
      s"disc predicate must reach the parquet scan:\n${p1.take(3000)}")
    assert(scoped.count() == 1)

    // replay path (EventFilter with a declared key)
    val rep = new graft.replay.Player(log).replay("", "ZZZZZZZZZZZZZZZZZZZZZZZZZZ",
      graft.replay.EventFilter(discriminator = Map("tenant" -> Seq("abc"))))
    val p2 = rep.queryExecution.executedPlan.toString
    assert(p2.contains("disc_tenant"),
      s"EventFilter's declared-key predicate must use the materialized column:\n${p2.take(3000)}")
    assert(rep.count() == 1)

    // legacy files (written before the key was declared) read null in the
    // twin column; the map predicate alone must keep them visible
    val legacy = new EventLog(spark, tmp + "-legacy", numBuckets = 2, ulidSeed = Some(8L))
    new EventStore(legacy, AccountType).create("01HXDISCPUSH0000000000003",
      Seq(AccountType.created(9, "C")))
    // re-open WITH the key declared: old files lack disc_tenant entirely
    val reopened = new EventLog(spark, tmp + "-legacy", numBuckets = 2, ulidSeed = Some(8L),
      discriminatorPolicy = Some(graft.log.DiscriminatorPolicy(allowedKeys = Set("tenant"))))
    assert(reopened.activeEvents.count() == 1, "legacy rows stay visible")
  }
}
