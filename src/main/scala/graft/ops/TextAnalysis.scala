package graft.ops

import graft.Checkpoints.Ownable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All pure Column
  * expressions (whole-stage codegen, no UDFs) so they run at scan speed and
  * push work into Tungsten at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens of the lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword proxy: count of letter/digit runs (punctuation and
    * whitespace both split) — the cheap upper-bound token estimate pipelines
    * use before real BPE.
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "[^\\p{L}\\p{N}]+"), t => t =!= "")).cast("long")

  /** Punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") /
      greatest(length(text), lit(1)), 4)

  /** Mean token length (chars without spaces / token count). */
  def avgTokenLen(text: Column): Column =
    round(length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      greatest(size(tokens(text)), lit(1)), 4)

  val stopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "auf", "für"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pour", "dans", "que", "sur"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "人", "这"))

  private def stopwordHits(text: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(arr, t)))
  }

  /** Distinct-token ratio: low values flag repetitive/boilerplate documents
    * (a standard pre-training quality filter).
    */
  def distinctRatio(text: Column): Column =
    round(size(array_distinct(tokens(text))).cast("double") /
      greatest(size(tokens(text)), lit(1)), 4)

  /** Stopword-token ratio against the English list (quality signal). */
  def stopwordRatio(text: Column): Column =
    round(stopwordHits(text, stopwordsByLang.head._2).cast("double") /
      greatest(size(tokens(text)), lit(1)), 4)

  /** N-gram/stopword-overlap language ID: score each language's stopword
    * list, pick the best (ties broken by language code). Returns a struct
    * `{lang, score}`.
    */
  def langId(text: Column): Column = {
    // sort ascending on (-score, lang): max score first, then lexical lang
    val scored = array(stopwordsByLang.map { case (lang, words) =>
      struct((-stopwordHits(text, words)).as("negscore"), lit(lang).as("lang"))
    }: _*)
    val best = element_at(array_sort(scored), 1)
    struct(best.getField("lang").as("lang"), (-best.getField("negscore")).cast("long").as("score"))
  }

  /** Number of tokens hitting a blocklist (dictionary-based content filter —
    * the shape used for term-level PII/unsafe-content screening at corpus
    * scale; the list is broadcast as an array literal, no join).
    */
  def blocklistHits(text: Column, terms: Seq[String]): Column = {
    val arr = array(terms.map(lit): _*)
    size(filter(tokens(text), t => array_contains(arr, t))).cast("long")
  }

  /** Redact blocklisted terms (word-boundary match on the normalized text).
    * Pure regexp_replace — runs inside whole-stage codegen.
    */
  def blocklistScrub(text: Column, terms: Seq[String], replacement: String = "[X]"): Column = {
    require(terms.nonEmpty && terms.forall(_.matches("[\\p{L}\\p{N}]+")),
      "blocklist terms must be plain words (no regex metacharacters)")
    regexp_replace(lower(trim(text)), s"\\b(${terms.mkString("|")})\\b",
      java.util.regex.Matcher.quoteReplacement(replacement))
  }

  /** Document fingerprint: hash of the whitespace-normalized, lower-cased
    * text — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Duplicate n-gram fraction per document (the Gopher-style repetition
    * quality filter): 1 − distinct/total 3-gram shingles. High values flag
    * machine-generated or looping text that token-level `distinctRatio`
    * misses (repeated PHRASES with a varied vocabulary). Returns
    * (id, n_shingles, rep_frac); no shuffle.
    */
  def repetitionFraction(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("__ws"))
      .select(col(idCol), Dedup.shinglesFromTokens(col("__ws"), shingleSize).as("__sh"))
      .select(col(idCol), size(col("__sh")).cast("long").as("n_shingles"),
        round(lit(1.0) - size(array_distinct(col("__sh"))).cast("double") /
          greatest(size(col("__sh")), lit(1)), 4).as("rep_frac"))

  /** Gopher-style composite quality rules (Rae et al. 2021 §A1.1, public):
    * the standard pre-training document filter batteries, computed as pure
    * integer counts so the oracle compare is exact (no float thresholds).
    * A document passes when ALL hold:
    *   - word count in [50, 100 000]
    *   - mean word length in [3, 10] chars   (3·wc ≤ chars ≤ 10·wc)
    *   - '#' and '...' symbol-to-word ratios ≤ 0.1   (sym·10 ≤ wc)
    *   - ≤ 90% of lines start with a bullet; ≤ 30% end with an ellipsis
    *   - ≥ 80% of words contain an alphabetic character (alpha·10 ≥ 8·wc)
    *   - ≥ 2 distinct words of the 8-word stop list appear
    * Returns one row per document with every raw count plus the verdict —
    * pipelines keep the counts for threshold re-tuning without a re-scan.
    * Pure Column projection: no shuffle, whole-stage codegen, scan-speed at
    * 100 TB. Counts use translate/replace arithmetic (not regexp) in the hot
    * symbols path so the generated code is branch-free.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    val text = col(textCol)
    val words = tokens(text)
    val lines = split(text, "\n")
    val wc = size(words).cast("long")
    val charsNoWs = length(regexp_replace(trim(text), "\\s+", "")).cast("long")
    val hashCount = (length(text) - length(translate(text, "#", ""))).cast("long")
    // non-overlapping left-to-right '...' occurrences, same greedy scan in
    // DuckDB's replace()
    val ellipsisCount =
      ((length(text) - length(replace(text, lit("..."), lit("")))) / 3).cast("long")
    val nLines = size(lines).cast("long")
    val bulletLines =
      size(filter(lines, l => l.rlike("^\\s*[-*•‣◦]"))).cast("long")
    val ellipsisLines =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    // tokens() lower-cases, so [a-z] covers the alphabetic check
    val alphaWords = size(filter(words, w => w.rlike("[a-z]"))).cast("long")
    val stopHits = gopherStopwords
      .map(w => when(array_contains(words, lit(w)), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    docs.select(col(idCol) +: keep.map(col) :+
        wc.as("word_count") :+ charsNoWs.as("chars_no_ws") :+
        hashCount.as("hash_count") :+ ellipsisCount.as("ellipsis_count") :+
        nLines.as("n_lines") :+ bulletLines.as("bullet_lines") :+
        ellipsisLines.as("ellipsis_lines") :+ alphaWords.as("alpha_words") :+
        stopHits.as("stop_hits"): _*)
      .withColumn("pass",
        col("word_count").between(50L, 100000L) &&
        col("chars_no_ws") >= col("word_count") * 3 &&
        col("chars_no_ws") <= col("word_count") * 10 &&
        col("hash_count") * 10 <= col("word_count") &&
        col("ellipsis_count") * 10 <= col("word_count") &&
        col("bullet_lines") * 10 <= col("n_lines") * 9 &&
        col("ellipsis_lines") * 10 <= col("n_lines") * 3 &&
        col("alpha_words") * 10 >= col("word_count") * 8 &&
        col("stop_hits") >= 2)
  }

  /** Per-document term frequencies: one row per (doc, token). The groupBy
    * partial-aggregates map-side, so the shuffle carries distinct
    * (doc, token) pairs, not raw token occurrences.
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))

  /** Corpus document frequency per token, derived from a term-frequency
    * frame (one row per (doc, token) already — counting rows per token IS
    * the document count, no second corpus scan).
    */
  def documentFrequency(tf: DataFrame): DataFrame =
    tf.groupBy("token").agg(count(lit(1)).as("df"))

  /** Top-k salient terms per document by linear TF-IDF: `tf · N/df`. The
    * linear form (no logarithm) ranks identically to log-IDF within a
    * document for the top end and keeps the score exact IEEE arithmetic —
    * libm `ln` implementations differ in the last ulp across engines, a
    * plain double division does not, so the whole operator is
    * oracle-checkable bit-for-bit (`t9_tfidf`).
    *
    * Plan shape: tf is computed PER ROW (count of each distinct token inside
    * its own document — an O(distinct·n) lambda, no corpus shuffle), so the
    * only shuffles are the vocab-sized df aggregation (map-side combine
    * shrinks it to distinct tokens per partition) and the final per-doc
    * top-k window. The earlier (doc, token) groupBy + checkpoint +
    * countDistinct formulation measured 2.5× slower at 200k docs.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    // N = distinct documents, not raw rows — duplicate ids would silently
    // deflate every IDF otherwise (and the oracle counts DISTINCT doc_id)
    val n = docs.select(col(idCol)).distinct().count()
    val exploded = docs
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("__ws"))
      .select(col("doc"), col("__ws"), explode(array_distinct(col("__ws"))).as("token"))
      .select(col("doc"), col("token"),
        size(filter(col("__ws"), t => t === col("token"))).cast("long").as("tf"))
    // df is vocab-sized after map-side combine; broadcast is right up to
    // ~100M distinct tokens — beyond that drop the hint and let the join
    // shuffle on token (the plan shape is otherwise unchanged)
    val dfTab = exploded.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc")).orderBy(col("score").desc, col("token"))
    exploded.join(broadcast(dfTab), Seq("token"))
      .withColumn("score", round(col("tf") * (lit(n.toDouble) / col("df")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc").as(idCol), col("token"), col("score"), col("rn"))
  }

  /** Add-k-smoothed bigram language model trained on a corpus — the model
    * half of the CCNet-style LM quality filter (CCNet scores CommonCrawl
    * against a Wikipedia LM; here the training corpus is a parameter, so
    * "train on the reference corpus, score the incoming crawl" is the
    * production call shape and self-scoring is the self-contained one).
    *
    * Returns one row per observed bigram: `(bigram, logp, __v)` where
    * `logp = ln((C(w1 w2) + k) / (C(w1 ·) + k·V))`, context counts
    * `C(w1 ·)` are derived from the bigram counts themselves (so the
    * conditional can never disagree with its own denominator), and
    * `V` = distinct continuation words — carried as a constant column so the
    * persisted model is one self-contained parquet table (unseen-bigram
    * scoring needs it for the `ln(1/V)` floor).
    *
    * Scale shape: ONE corpus aggregation (map-side combined to the distinct
    * bigram vocabulary, Zipf-bounded — orders of magnitude smaller than the
    * corpus), checkpointed, then a vocab-sized window for context sums and a
    * broadcast 1-row frame for V. No UDFs, no driver-side state.
    */
  def bigramLm(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.1): DataFrame = {
    require(k > 0, "smoothing k must be > 0")
    val bc = docBigrams(docs, idCol, textCol)
      .groupBy(col("bigram")).agg(count(lit(1)).cast("double").as("__b"))
      .checkpointOwned() // vocab-sized; feeds the window, V, and the join
    val v = bc.agg(
      countDistinct(substring_index(col("bigram"), " ", -1)).cast("double").as("__v"))
    val ctx = Window.partitionBy(substring_index(col("bigram"), " ", 1))
    bc.withColumn("__w", sum(col("__b")).over(ctx))
      .crossJoin(broadcast(v))
      .select(col("bigram"),
        log((col("__b") + lit(k)) / (col("__w") + lit(k) * col("__v"))).as("logp"),
        col("__v"))
  }

  /** CCNet-style LM quality score: average negative log-likelihood of each
    * document's bigrams under an add-k bigram model (nats per bigram —
    * LOWER = more in-distribution, the classic pretraining-data quality
    * signal). Trains on `docs` itself when no `model` is passed; pass a
    * [[bigramLm]] frame (fresh or loaded from parquet) to score a new batch
    * against a fixed reference corpus. Bigrams unseen by the model take the
    * `ln(1/V)` unseen-context floor. Documents under 2 tokens have no
    * bigrams and drop out (they have no likelihood to speak of — screen
    * them by [[tokenCount]]).
    *
    * Plan shape: the document bigram stream equi-joins the (vocab-sized,
    * broadcast-able) model and averages per doc — one join + one final
    * aggregation; at 100 TB both sides of the join partition on the bigram
    * key and nothing quadratic or driver-side exists.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.1, model: Option[DataFrame] = None): DataFrame = {
    val m = model.getOrElse(bigramLm(docs, idCol, textCol, k))
    val vv = m.agg(max(col("__v")).as("__vv"))
    docBigrams(docs, idCol, textCol)
      .join(broadcast(m), Seq("bigram"), "left")
      .crossJoin(broadcast(vv))
      .groupBy(col(idCol))
      .agg(round(-avg(coalesce(col("logp"), -log(col("__vv")))), 6).as("lm_score"),
        count(lit(1)).as("n_bigrams"))
  }

  /** One row per (doc, bigram occurrence) — explode of the 2-shingle array
    * (docs under 2 tokens contribute no rows).
    */
  private def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("__ws"))
      .select(col(idCol), explode(Dedup.shinglesFromTokens(col("__ws"), 2)).as("bigram"))

  /** Split documents into fixed-size token windows with overlap — the
    * context-window chunking step before tokenization/packing. One row per
    * chunk: (id, chunk_no, chunk, n_tokens). Stride = chunkTokens − overlap;
    * the final chunk may be short (standard behavior). Pure explode over a
    * start-offset sequence on a MATERIALIZED token array (the lambda-
    * re-evaluation rule), fully codegen'd.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 512, overlap: Int = 64): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    docs.select(col(idCol), tokens(col(textCol)).as("__ws"))
      .withColumn("start",
        explode(when(size(col("__ws")) >= 1,
          sequence(lit(0), size(col("__ws")) - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .select(col(idCol), (col("start") / stride).cast("long").as("chunk_no"),
        array_join(slice(col("__ws"), col("start") + 1, lit(chunkTokens)), " ").as("chunk"),
        least(lit(chunkTokens), size(col("__ws")) - col("start")).cast("long")
          .as("n_tokens"))
  }

  /** Greedy sequence packing: assign documents to fixed token-budget bins
    * (context windows) by exclusive running token count, per `groupCol`
    * partition. This is the scalable streaming-pack form — one window
    * shuffle on the group key, deterministic, order = id — not optimal
    * bin packing (NP-hard and inherently sequential); a doc larger than the
    * budget gets bins to itself, like every practical packer. At 100 TB the
    * group key (source/shard) bounds each window partition.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, budgetTokens: Int = 2048): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(groupCol),
        tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budgetTokens).cast("long").as("bin"))
  }

  // ── REAL BPE: learned subword merges, Spark-native ─────────────────────
  // bpeishTokenCount is a regex proxy; training pipelines need the real
  // thing — token counts under a LEARNED merge table (the published
  // byte-pair-encoding subword algorithm: Sennrich, Haddow & Birch, ACL
  // 2016). The Spark shape exploits the algorithm's own scale split: the
  // corpus is read ONCE (word census); every training round then runs over
  // the distinct-word-SHAPE table, which is vocabulary-sized (millions of
  // rows at 100 TB, not trillions), so the merge loop costs O(vocab) per
  // round regardless of corpus size. Encoding reuses the same split:
  // distinct words encode once, documents join the encoded vocabulary.

  /** The distinct word shapes with counts — BPE training's working set.
    * Symbols start as single characters (`(?!^)` splits between every
    * char without an empty head). ASCII/BMP text only as written: Spark
    * splits UTF-16 code units while char-level oracles count codepoints —
    * identical up to the basic plane.
    */
  private def wordShapes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      // `(?!^)(?=.)`: between-character positions only — Spark's split
      // keeps trailing empties (limit -1), so the end-of-string position
      // must not match
      .select(col("cnt"), split(col("word"), "(?!^)(?=.)").as("syms"))

  /** Adjacent-symbol-pair census over word shapes: one row per distinct
    * (lhs, rhs) with its corpus-weighted occurrence count. Round 0 of BPE
    * training (symbols = characters), exposed because it is the
    * oracle-expressible half of the trainer — and a useful corpus
    * dashboard (character bigram structure) by itself.
    */
  def bpePairCensus(docs: DataFrame, textCol: String): DataFrame =
    pairCensus(wordShapes(docs, textCol))

  private def pairCensus(shapes: DataFrame): DataFrame =
    shapes.select(col("cnt"), explode(
        when(size(col("syms")) >= 2,
          zip_with(slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("lhs"), b.as("rhs"))))
          .otherwise(array().cast("array<struct<lhs:string,rhs:string>>")))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** Merge every leftmost-first non-overlapping adjacent (l, r) inside a
    * symbol array — the BPE merge step as a pure Column fold (no UDF):
    * carry the pending symbol; emit `l+r` when it completes the pair,
    * otherwise flush it and carry the current symbol.
    */
  private def mergePairCol(syms: Column, l: String, r: String): Column = {
    val empty = array().cast("array<string>")
    aggregate(syms,
      struct(empty.as("acc"), lit(null).cast("string").as("pend")),
      (st, s) =>
        when(st.getField("pend").isNull,
          struct(st.getField("acc").as("acc"), s.as("pend")))
          .when(st.getField("pend") === lit(l) && s === lit(r),
            struct(concat(st.getField("acc"), array(lit(l + r))).as("acc"),
              lit(null).cast("string").as("pend")))
          .otherwise(
            struct(concat(st.getField("acc"), array(st.getField("pend"))).as("acc"),
              s.as("pend"))),
      st => when(st.getField("pend").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("pend")))))
  }

  /** Train a BPE merge table: `nMerges` rounds of (pair census → argmax →
    * merge everywhere). Deterministic tiebreak: count DESC, then (lhs,
    * rhs) ASC. Returns (rank, lhs, rhs, merged, pair_count) — `rank` is
    * the merge priority the encoder applies in order. Stops early when no
    * word holds two symbols. The per-round argmax is a ONE-row driver
    * fetch; lineage over the shape table is cut every 4 rounds through the
    * checkpoint ownership registry (the CC-loop cadence) and every block
    * is released before returning.
    */
  def bpeTrain(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges > 0 && nMerges <= 4096, s"nMerges in 1..4096, got $nMerges")
    val spark = docs.sparkSession
    var shapes = wordShapes(docs, textCol).checkpointOwned()
    var prevCut = shapes // earlier cuts are freed by each advance()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var dry = false
    while (rank < nMerges && !dry) {
      val top = pairCensus(shapes)
        .orderBy(desc("pair_count"), col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, n))
        shapes = shapes.select(col("cnt"), mergePairCol(col("syms"), l, r).as("syms"))
        rank += 1
        if (rank % 4 == 0 && rank < nMerges) {
          shapes = graft.Checkpoints.advance(prevCut, shapes)
          prevCut = shapes
        }
      }
    }
    graft.Checkpoints.release(prevCut)
    import spark.implicits._
    merges.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("pair_count"))
  }

  /** Greedy BPE encode of one word under a rank map: repeatedly merge ALL
    * leftmost-first occurrences of the lowest-rank adjacent pair present —
    * exactly the training semantics, so encoding the training corpus
    * reproduces the trained shapes.
    */
  private[graft] def bpeEncodeWord(word: String,
      rank: Map[(String, String), Int]): Array[String] = {
    var syms = Array.tabulate(word.length)(i => word.substring(i, i + 1))
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val rk = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) best = rk
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == best) {
            out += syms(j) + syms(j + 1); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        done = syms.length < 2
      }
    }
    syms
  }

  /** Per-document token count under a trained merge table. The corpus-scale
    * shape: explode words (scan-speed), encode only the DISTINCT words
    * (vocabulary-sized mapPartitions — the merge table rides the closure,
    * it is `nMerges` rows by construction), join back, sum per document.
    * Three exchanges (vocab distinct, word join, doc sum); the join's word
    * side reuses the distinct's hash partitioning. Documents with no words
    * contribute no row (consistent with the census ops).
    */
  def bpeTokenCount(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    val ranked = merges.select("rank", "lhs", "rhs").collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val words = docs.select(col(idCol), explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val vocab = words.select("word").distinct()
    val enc = vocab.mapPartitions { it =>
      it.map(row => {
        val w = row.getString(0)
        (w, bpeEncodeWord(w, ranked).length.toLong)
      })
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong))
      .toDF("word", "n_word_tokens")
    words.join(enc, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("n_word_tokens")).as("n_bpe_tokens"))
  }

  /** The trained tokenizer's vocabulary: one row per token with a
    * deterministic id. Base alphabet = every distinct single character of
    * the corpus's words (pre-merge, so characters that only survive inside
    * merged tokens still get ids), ids 0..|A|−1 in lexicographic order;
    * merged tokens follow at `|A| + rank`. The lexicographic window runs
    * over the ALPHABET (at most a few thousand rows for any real corpus) —
    * bounded by construction, like the merge table itself.
    */
  def bpeVocab(docs: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val chars = wordShapes(docs, textCol)
      .select(explode(col("syms")).as("token")).distinct()
    val base = chars.select(col("token"),
      (row_number().over(Window.orderBy(col("token"))) - 1).cast("long")
        .as("token_id"))
    val nBase = base.agg(count(lit(1)).as("__n"))
    base.unionByName(merges.crossJoin(broadcast(nBase))
      .select(col("merged").as("token"),
        (col("__n") + col("rank")).cast("long").as("token_id")))
  }

  /** Encode documents to token-id sequences under a trained merge table +
    * [[bpeVocab]] vocabulary — the tokenizer's production output (what
    * [[packSequencesBy]] packs and a training loop consumes). One row per
    * token occurrence, ordered by `(word_no, sub_no)` within each document:
    * `(id, word_no, sub_no, token, token_id)` — the exploded form keeps
    * every value scalar and the order total without a per-doc array
    * rebuild. A token absent from the vocabulary encodes as −1 (can only
    * happen when scoring a LATER batch whose alphabet outgrew the training
    * corpus — the caller's cue to retrain, not a silent drop).
    *
    * Scale shape: same vocabulary split as [[bpeTokenCount]] — only
    * DISTINCT words run the greedy encoder (merge table and vocabulary
    * ride the closure; both are bounded by `|A| + nMerges` rows by
    * construction), documents join the encoded vocabulary.
    */
  def bpeEncodeIds(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame, vocab: DataFrame): DataFrame = {
    val ranked = merges.select("rank", "lhs", "rhs").collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val vmap = vocab.select("token", "token_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("word_no", "word")))
      .filter(length(col("word")) > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val enc = words.select("word").distinct().mapPartitions { it =>
      it.map { row =>
        val w = row.getString(0)
        val toks = bpeEncodeWord(w, ranked).toSeq
        (w, toks, toks.map(t => vmap.getOrElse(t, -1L)))
      }
    }.toDF("word", "__toks", "__ids")
    words.join(enc, Seq("word"))
      .select(col(idCol), col("word_no").cast("long").as("word_no"),
        posexplode(arrays_zip(col("__toks"), col("__ids")))
          .as(Seq("sub_no", "__z")))
      .select(col(idCol), col("word_no"), col("sub_no").cast("long").as("sub_no"),
        col("__z.__toks").as("token"), col("__z.__ids").as("token_id"))
  }

  /** [[packSequences]] over a PRECOMPUTED per-document count column — the
    * packer under real tokenizer counts ([[bpeTokenCount]]) instead of the
    * whitespace proxy, or any other cost metric (chars, bytes, frames).
    * Same greedy exclusive-running-sum bins, same one-window shuffle.
    */
  def packSequencesBy(counted: DataFrame, idCol: String, groupCol: String,
      countCol: String, budgetTokens: Int = 2048): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted.withColumn("__cum", sum(col(countCol)).over(w))
      .select(col(idCol), col(groupCol), col(countCol),
        floor((col("__cum") - col(countCol)) / budgetTokens).cast("long").as("bin"))
  }

  /** 32-bit token hash: little-endian reading of the first 4 md5 bytes.
    * Chosen because it is reproducible everywhere — equal to DuckDB's
    * `md5_number(t) % 2^32` (made non-negative) and trivially portable.
    */
  def tokenHash32(t: Column): Column =
    conv(concat(
      substring(md5(t), 7, 2), substring(md5(t), 5, 2),
      substring(md5(t), 3, 2), substring(md5(t), 1, 2)), 16, 10).cast("long")

  /** 64-bit token hash: little-endian reading of the first 8 md5 bytes —
    * the 64-bit widening of [[tokenHash32]], equal to DuckDB's
    * `md5_number(t) % 2^64` reinterpreted as a signed long. Built from two
    * 32-bit halves (each fits a long after `conv`) because a single
    * 16-hex-digit `conv` ≥ 2^63 would overflow the string→long cast; the
    * `shiftleft(hi,32) | lo` recombination is exact two's-complement.
    */
  def tokenHash64(t: Column): Column = {
    def half(o1: Int, o2: Int, o3: Int, o4: Int): Column =
      conv(concat(substring(md5(t), o1, 2), substring(md5(t), o2, 2),
        substring(md5(t), o3, 2), substring(md5(t), o4, 2)), 16, 10).cast("long")
    shiftleft(half(15, 13, 11, 9), 32).bitwiseOR(half(7, 5, 3, 1))
  }

  /** PII patterns — deliberately RE2-compatible (no backreferences, no
    * lookaround) so the same pattern string runs in Spark (java.util.regex)
    * and any RE2 engine with identical semantics; order of redaction is
    * email → phone → IPv4 so a phone-bearing email local part is consumed
    * as one email first.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-document PII hit counts (email / phone / IPv4), on the RAW text —
    * the screening half of the PII filter. Pure regexp_count: codegen'd,
    * no shuffle, linear scans per pattern.
    */
  def piiEmailCount(text: Column): Column = regexp_count(text, lit(EmailPattern)).cast("long")
  def piiPhoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern)).cast("long")
  def piiIpCount(text: Column): Column = regexp_count(text, lit(Ipv4Pattern)).cast("long")

  /** Redact all three PII classes with typed placeholders. Email first: its
    * pattern can span digits a later pass would partially consume.
    */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        PhonePattern, "[PHONE]"),
      Ipv4Pattern, "[IP]")

  // ── markup strip: the boilerplate-extraction first pass over scraped
  //    HTML-ish text — tags out, core entities decoded, whitespace
  //    normalized. Pure regexp_replace chain (codegen, RE2-compatible
  //    patterns like the PII set), so the DuckDB oracle runs the SAME
  //    pipeline verbatim. ───────────────────────────────────────────────

  /** The five core character entities, decode order pinned: `&amp;` LAST,
    * so `&amp;lt;` yields the LITERAL text `&lt;` (HTML semantics), never
    * a second-round `<`.
    */
  val MarkupEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Extracted text of a markup document: every tag becomes a space (a
    * tag boundary is a word boundary — deleting it outright would weld
    * `...</td><td>...` cell texts together), entities decode in
    * [[MarkupEntities]] order, runs of blank characters collapse to one
    * space, ends trimmed. A tag opens only with `<` + letter / `/` / `!`
    * / `?` — the HTML tokenizer's rule — so comparison text like
    * `3 < 5 and x > 2` is content and survives (a bare `<[^>]*>` would
    * eat the span between the operators). Same verdict in RE2 and
    * java.util.regex, so the oracle transfers.
    */
  def stripMarkup(text: Column): Column = {
    val decoded = MarkupEntities.foldLeft(
      regexp_replace(text, "</?[A-Za-z!?][^>]*>", " ")) { case (c, (e, v)) =>
        regexp_replace(c, e, v)
    }
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  /** Markup mass per mille: `1000·(len(raw) − len(stripped)) / len(raw)`,
    * integer-exact — the boilerplate-density quality signal (a page that
    * is 95% tags is navigation chrome, not a document).
    */
  def markupDensityPerMille(text: Column): Column = {
    val stripped = stripMarkup(text)
    when(length(text) === 0, lit(0L)).otherwise(
      (lit(1000) * (length(text) - length(stripped)) / length(text))
        .cast("long"))
  }

  /** One-pass corpus DATA CARD: the per-group census every corpus release
    * ships — doc count, token/char mass, length quantiles, corpus-level
    * distinct-token ratio, PII incidence — as ONE aggregation over ONE
    * scan (at 100 TB the scan is the cost; a census that reads the corpus
    * once per statistic is wrong by construction). Integer-exact except
    * the two interpolated quantiles and one final division, both
    * engine-portable (the x2 parity rule). Deliberately ratio-of-sums,
    * not mean-of-ratios: a single division on exact longs is
    * deterministic across engines and weighs documents by their token
    * mass; an average of per-doc rounded doubles is neither.
    */
  /** `exactQuantiles = false` (the DEFAULT — bounded-by-default at
    * 100 TB, VERDICT r15 #4) computes the two quantile columns with
    * `percentile_approx` (GK sketch, bounded memory at ANY group size),
    * spec-gated within the sketch's rank-error bound against the exact
    * twin (the x7 pattern). `true` switches to exact interpolated
    * `percentile` — oracle-checkable, but its aggregation buffer holds
    * every group value, so it is for oracle gates and groups KNOWN
    * bounded; callers opt into the unbounded buffer, never fall into it.
    * Every other column is a constant-space aggregate either way.
    */
  def dataCard(docs: DataFrame, textCol: String,
      groupCols: Seq[String], exactQuantiles: Boolean = false): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    def pct(p: Double) =
      if (exactQuantiles) percentile(length(t), lit(p))
      else percentile_approx(length(t), lit(p), lit(10000)).cast("double")
    docs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("n_tokens"),
      sum(length(t).cast("long")).as("n_chars"),
      round(pct(0.5), 2).as("p50_chars"),
      round(pct(0.95), 2).as("p95_chars"),
      round(sum(size(array_distinct(toks)).cast("long")) /
        greatest(sum(size(toks).cast("long")), lit(1L)), 6)
        .as("distinct_token_ratio"),
      sum(when(piiEmailCount(t) + piiPhoneCount(t) + piiIpCount(t) > 0, 1L)
        .otherwise(0L)).as("pii_docs"))
  }

  // ── learned quality models: Naive Bayes classifier + DSIR weights ──────
  // The two CLOSED-FORM members of the learned-filter family (the
  // fastText-quality-classifier and importance-resampling steps of a
  // pretraining pipeline). Both are pure count aggregates — no gradient
  // loop, so the whole model is oracle-re-derivable and the Spark shape is
  // exactly the [[bigramLm]] one: one corpus-scan census down to a
  // vocabulary/bucket-sized model table, then a broadcast join back onto
  // the document token stream. Nothing iterative, nothing driver-side.

  /** Train a binary add-k Naive Bayes word classifier — the closed form of
    * the fastText-style quality filter (label high/low-quality seed docs,
    * score the crawl). `labelCol` is a BOOLEAN column on `docs` (true =
    * positive class). Returns one row per observed word:
    * `(word, lp_pos, lp_neg)` with the self-contained constants the scorer
    * needs carried on every row (the [[bigramLm]] persisted-model pattern):
    * unseen-word floors `__floor_pos`/`__floor_neg` = `ln(k / (N_c + k·V))`
    * and the document-count prior logit `__prior` = `ln(D_pos / D_neg)`.
    * V = distinct words across BOTH classes (one shared vocabulary, so the
    * two conditionals are smoothed over the same event space). Refuses
    * loudly when either class has no documents — a one-class "classifier"
    * would silently score everything with ±∞.
    *
    * Scale shape: ONE token-census aggregate (map-side combined, lands
    * vocabulary-sized — Zipf-bounded), two 1-row broadcast frames for the
    * totals and prior. The census conditional-count trick (`sum(when)`)
    * needs no pivot and no second pass.
    */
  def nbTrain(docs: DataFrame, textCol: String, labelCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, "smoothing k must be > 0")
    val wc = docs
      .select(col(labelCol).as("__pos"), explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(sum(when(col("__pos"), 1d).otherwise(0d)).as("__cp"),
        sum(when(col("__pos"), 0d).otherwise(1d)).as("__cn"))
    val tot = wc.agg(sum(col("__cp")).as("__np"), sum(col("__cn")).as("__nn"),
      count(lit(1)).cast("double").as("__v"))
    val pri = docs.agg(
      sum(when(col(labelCol), 1d).otherwise(0d)).as("__dp"),
      sum(when(col(labelCol), 0d).otherwise(1d)).as("__dn"))
      .select(when(col("__dp") * col("__dn") === 0d,
        raise_error(lit("nbTrain: both classes must hold at least one document")))
        .otherwise(log(col("__dp") / col("__dn"))).as("__prior"))
    wc.crossJoin(broadcast(tot)).crossJoin(broadcast(pri))
      .select(col("word"),
        log((col("__cp") + lit(k)) / (col("__np") + lit(k) * col("__v"))).as("lp_pos"),
        log((col("__cn") + lit(k)) / (col("__nn") + lit(k) * col("__v"))).as("lp_neg"),
        log(lit(k) / (col("__np") + lit(k) * col("__v"))).as("__floor_pos"),
        log(lit(k) / (col("__nn") + lit(k) * col("__v"))).as("__floor_neg"),
        col("__prior"))
  }

  /** Score documents under a [[nbTrain]] model: per-doc log-odds
    * `__prior + Σ_w (lp_pos(w) − lp_neg(w))` with unseen words taking the
    * model's smoothing floors, plus the boolean verdict (`logit > 0`).
    * Documents with zero words contribute no row (no evidence either way —
    * screen them by [[tokenCount]], the [[lmScore]] convention). Pass a
    * model loaded from parquet to score a new batch against a fixed seed.
    *
    * Plan shape: token stream ⋈ broadcast(vocab-sized model) → one per-doc
    * aggregation. At 100 TB the model stays broadcast-able by construction
    * (it is the training corpus's vocabulary, not its rows).
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    // the model is vocabulary-bounded BY CONTRACT (broadcastable — the
    // score join collects it to the driver anyway to build the broadcast),
    // so collect it ONCE up front: the model plan executes exactly once,
    // the floor/prior constants come off the collected rows with no
    // separate aggregate job, and the join's build side becomes a
    // LocalRelation whose broadcast builds without a distributed job.
    // This also retires the owned checkpoint the r16 form minted and never
    // released — a block set leaked per call on loaded models (r17 opt +
    // ADVICE r16 fix). The empty-model refusal stays DRIVER-SIDE: AQE's
    // empty-relation pruning could otherwise collapse the score join
    // before any in-plan guard evaluates, turning a bad model path into
    // silent empties.
    val spark = docs.sparkSession
    val proj = model.select(col("word"), col("lp_pos"), col("lp_neg"),
      col("__floor_pos"), col("__floor_neg"), col("__prior"))
    val rows = proj.collect()
    def const(i: Int): Option[Double] =
      rows.iterator.filterNot(_.isNullAt(i)).map(_.getDouble(i))
        .reduceOption((a, b) => math.max(a, b))
    val (fpO, fnO, prO) = (const(3), const(4), const(5))
    require(fpO.nonEmpty && fnO.nonEmpty && prO.nonEmpty,
      "nbScore: model is empty or lacks its floor/prior constants")
    val (fp, fn, pr) = (fpO.get, fnO.get, prO.get)
    val mLocal = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2))): _*),
      org.apache.spark.sql.types.StructType(proj.schema.fields.take(3)))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(mLocal), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(round(lit(pr) +
          sum(coalesce(col("lp_pos"), lit(fp)) -
            coalesce(col("lp_neg"), lit(fn))), 6).as("nb_logit"),
        count(lit(1)).as("n_words"))
      .withColumn("nb_pred", col("nb_logit") > 0d)
  }

  /** DSIR importance weights (data selection via importance resampling,
    * Xie et al. 2023): per-document `ln(p_target(doc) / p_raw(doc))` under
    * add-k-smoothed HASHED-unigram bag models of a target corpus (the
    * distribution you want more of — e.g. curated reference text) and the
    * raw pool being selected from. Features are [[tokenHash32]] buckets
    * (mod `buckets`), so the two "models" are fixed-size count tables —
    * `buckets` rows, NOT vocabulary-sized — and the feature space is
    * identical across any two corpora by construction. Returns one row per
    * raw document: `(id, dsir_logw, n_feats)`; resample by `dsir_logw`
    * (e.g. Gumbel top-k) to tilt the pool toward the target. Identical
    * corpora get exactly 0 everywhere — the census ratios cancel term by
    * term, a property the spec pins.
    *
    * Scale shape: ONE bucket census over the tagged union of both corpora
    * (map-side combined to ≤ `buckets` rows — the conditional-count trick,
    * no census-vs-census join exists), broadcast onto the raw token
    * stream, one per-doc sum. The model build cost is independent of
    * vocabulary growth — the reason DSIR hashes in the first place.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096, k: Double = 0.5): DataFrame =
    dsirScore(raw, idCol, textCol, dsirModel(raw, target, textCol, buckets, k))

  /** The DSIR log-ratio table alone — persist it, then [[dsirScore]] later
    * batches (the production split: model from reference snapshots, score
    * the stream). TOTAL over the bucket domain: one row for EVERY bucket
    * `0..buckets−1`, so a later batch whose tokens hash to buckets neither
    * training corpus touched still scores (it gets the both-unseen
    * smoothing ratio, not a dropped token). `__buckets` rides every row —
    * the persisted model is self-contained like the [[nbTrain]] one.
    */
  def dsirModel(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int = 4096, k: Double = 0.5): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(k > 0, "smoothing k must be > 0")
    def side(df: DataFrame, isTarget: Boolean) = Par.fanOut(df)
      .select(lit(isTarget).as("__t"), explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .select(col("__t"), pmod(tokenHash32(col("word")), lit(buckets.toLong)).as("bucket"))
    val census = side(target, isTarget = true)
      .unionByName(side(raw, isTarget = false))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__t"), 1d).otherwise(0d)).as("__ct"),
        sum(when(col("__t"), 0d).otherwise(1d)).as("__cr"))
    val domain = raw.sparkSession.range(buckets).select(col("id").as("bucket"))
    val full = domain.join(census, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("__ct"), lit(0d)).as("__ct"),
        coalesce(col("__cr"), lit(0d)).as("__cr"))
    val tot = full.agg(sum(col("__ct")).as("__nt"), sum(col("__cr")).as("__nr"))
    full.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (log((col("__ct") + lit(k)) / (col("__nt") + lit(k) * buckets)) -
          log((col("__cr") + lit(k)) / (col("__nr") + lit(k) * buckets))).as("lr"),
        lit(buckets.toLong).as("__buckets"))
  }

  /** Score documents under a [[dsirModel]] (fresh or loaded from parquet):
    * per-doc sum of bucket log-ratios. The bucket width comes off the
    * model itself, and the model is total over its domain, so the join is
    * inner AND lossless for any input batch. Broadcast join + one per-doc
    * aggregation per call — the same shape at ingest as in batch.
    */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    // the model is buckets-bounded BY CONTRACT — collect it ONCE (the
    // nbScore shape): census executes exactly once, the bucket width comes
    // off the collected rows with no separate aggregate job, the join's
    // build side broadcasts from a LocalRelation, and no owned checkpoint
    // is minted to leak (r17 opt + ADVICE r16 fix). Empty-model refusal
    // stays driver-side for the same AQE empty-relation-pruning reason as
    // [[nbScore]].
    val spark = docs.sparkSession
    val proj = model.select(col("bucket"), col("lr"), col("__buckets"))
    val rows = proj.collect()
    val b = rows.iterator.filterNot(_.isNullAt(2)).map(_.getLong(2))
      .reduceOption((a, b) => math.max(a, b))
    require(b.nonEmpty, "dsirScore: model is empty or lacks __buckets")
    val mLocal = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r.get(0), r.get(1))): _*),
      org.apache.spark.sql.types.StructType(proj.schema.fields.take(2)))
    Par.fanOut(docs)
      .select(col(idCol), explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .select(col(idCol),
        pmod(tokenHash32(col("word")), lit(b.get)).as("bucket"))
      .join(broadcast(mLocal), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(round(sum(col("lr")), 6).as("dsir_logw"), count(lit(1)).as("n_feats"))
  }
}
