package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** REAL BPE trainer/encoder vs an independent single-threaded reference
  * implementation of the published algorithm (Sennrich, Haddow & Birch,
  * ACL 2016): merge-table equality on a structured corpus, deterministic
  * tiebreaks, leftmost-first merge semantics, greedy-by-rank encoding, and
  * the corpus-count identity (encoding the training corpus reproduces the
  * trained shapes).
  */
class BpeSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  // ── independent reference: the textbook algorithm, driver-side ─────────
  private def refPairCensus(
      shapes: Map[Vector[String], Long]): Map[(String, String), Long] =
    shapes.toSeq.flatMap { case (syms, cnt) =>
      syms.zip(syms.tail).map(p => p -> cnt)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }

  private def refMerge(syms: Vector[String], l: String,
      r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
        out += l + r; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Returns (merges with counts, final word shapes). */
  private def refTrain(words: Map[String, Long], k: Int)
      : (Seq[(String, String, Long)], Map[Vector[String], Long]) = {
    var shapes = words.toSeq
      .map { case (w, c) => w.map(_.toString).toVector -> c }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val merges = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var dry = false
    while (round < k && !dry) {
      val census = refPairCensus(shapes)
      if (census.isEmpty) dry = true
      else {
        val ((l, r), n) = census.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        merges += ((l, r, n))
        shapes = shapes.toSeq.map { case (s, c) => refMerge(s, l, r) -> c }
          .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
        round += 1
      }
    }
    (merges.result(), shapes)
  }

  private def corpusWords(rows: Seq[String]): Map[String, Long] =
    rows.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }

  // a corpus with real merge structure: shared stems, repeats, a tie
  private val docs: Seq[(Long, String)] = Seq(
    0L -> "banana bandana banana cabana",
    1L -> "low lower lowest low low slow",
    2L -> "new newer newest news new renew",
    3L -> "aaa aaaa aa aaa banana",
    4L -> "low new low new lowest newest")

  test("bpeTrain equals the reference implementation, merge for merge") {
    val s = spark
    import s.implicits._
    val k = 12
    val trained = TextAnalysis.bpeTrain(docs.toDF("doc_id", "text"), "text", k)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    val (expect, _) = refTrain(corpusWords(docs.map(_._2)), k)
    assert(trained.length === expect.length)
    trained.zip(expect).zipWithIndex.foreach {
      case (((rank, l, r, m, n), (el, er, en)), i) =>
        assert(rank === i)
        assert((l, r, n) === ((el, er, en)), s"merge $i diverges")
        assert(m === el + er)
    }
  }

  test("tiebreak is deterministic: equal counts resolve lexicographically") {
    val s = spark
    import s.implicits._
    // 'zb' and 'ac' both occur exactly 3 times; (a,c) < (z,b)
    val tie = Seq(0L -> "zb zb zb ac ac ac")
    val m = TextAnalysis.bpeTrain(tie.toDF("doc_id", "text"), "text", 1).head
    assert((m.getString(1), m.getString(2)) === (("a", "c")))
  }

  test("trainer stops early when no word holds two symbols") {
    val s = spark
    import s.implicits._
    val tiny = Seq(0L -> "ab ab")
    // one merge exhausts the corpus ('ab' fuses); further rounds are dry
    val m = TextAnalysis.bpeTrain(tiny.toDF("doc_id", "text"), "text", 10)
    assert(m.count() === 1L)
  }

  test("encode: leftmost-first within a pair, lowest rank across pairs") {
    // 'aaa' under (a,a): leftmost pair fuses, tail survives
    assert(TextAnalysis.bpeEncodeWord("aaa", Map(("a", "a") -> 0)).toSeq
      === Seq("aa", "a"))
    // rank 0 beats rank 1 even when rank 1's pair appears first in the word
    assert(TextAnalysis.bpeEncodeWord("abc",
      Map(("b", "c") -> 0, ("a", "b") -> 1)).toSeq === Seq("a", "bc"))
    // chained merges climb: (a,b) then (ab,c)
    assert(TextAnalysis.bpeEncodeWord("abc",
      Map(("a", "b") -> 0, ("ab", "c") -> 1)).toSeq === Seq("abc"))
    // no merges: characters
    assert(TextAnalysis.bpeEncodeWord("xyz", Map.empty).toSeq
      === Seq("x", "y", "z"))
    // tokens always concatenate back to the word
    val rank = Map(("a", "n") -> 0, ("an", "an") -> 1, ("b", "an") -> 2)
    assert(TextAnalysis.bpeEncodeWord("banana", rank).mkString === "banana")
  }

  test("encoding the training corpus reproduces the trained shapes") {
    val s = spark
    import s.implicits._
    val k = 8
    val trained = TextAnalysis.bpeTrain(docs.toDF("doc_id", "text"), "text", k)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val (_, shapes) = refTrain(corpusWords(docs.map(_._2)), k)
    shapes.keys.foreach { syms =>
      val word = syms.mkString
      assert(TextAnalysis.bpeEncodeWord(word, trained).toSeq === syms,
        s"greedy encode of '$word' must reproduce the trained shape")
    }
  }

  test("bpeTokenCount equals the reference count per document") {
    val s = spark
    import s.implicits._
    val k = 8
    val df = docs.toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, "text", k)
    val rank = merges.collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val got = TextAnalysis.bpeTokenCount(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = docs.map { case (id, text) =>
      id -> text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        .map(w => TextAnalysis.bpeEncodeWord(w, rank).length.toLong).sum
    }.toMap
    assert(got === expect)
    // sanity: merges genuinely compress vs characters
    val chars = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        .map(_.length.toLong).sum
    }.toMap
    docs.foreach { case (id, _) => assert(got(id) < chars(id)) }
  }

  test("census over a corpus equals brute force; weighted by word frequency") {
    val s = spark
    import s.implicits._
    val got = TextAnalysis.bpePairCensus(docs.toDF("doc_id", "text"), "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val expect = refPairCensus(corpusWords(docs.map(_._2))
      .map { case (w, c) => w.map(_.toString).toVector -> c })
    assert(got === expect)
  }

  test("vocab ids are deterministic: alphabet lexicographic, merges appended by rank") {
    val s = spark
    import s.implicits._
    val df = docs.toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, "text", 5)
    val vocab = TextAnalysis.bpeVocab(df, "text", merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val alphabet = corpusWords(docs.map(_._2)).keys
      .flatMap(_.map(_.toString)).toSeq.distinct.sorted
    alphabet.zipWithIndex.foreach { case (c, i) =>
      assert(vocab(c) === i.toLong, s"char '$c'")
    }
    val ms = merges.orderBy("rank").collect()
    ms.foreach(m => assert(vocab(m.getString(3)) ===
      alphabet.size.toLong + m.getInt(0)))
    assert(vocab.size === alphabet.size + ms.length)
    assert(vocab.values.toSeq.distinct.size === vocab.size, "ids collide")
  }

  test("encodeIds reproduces the greedy encoder word for word, ids included") {
    val s = spark
    import s.implicits._
    val df = docs.toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, "text", 6)
    val vocab = TextAnalysis.bpeVocab(df, "text", merges)
    val vmap = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rank = merges.collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val got = TextAnalysis.bpeEncodeIds(df, "doc_id", "text", merges, vocab)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getString(3), r.getLong(4))))
      .toMap
    docs.foreach { case (id, text) =>
      val ws = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      ws.zipWithIndex.foreach { case (w, wi) =>
        val toks = TextAnalysis.bpeEncodeWord(w, rank)
        toks.zipWithIndex.foreach { case (tk, si) =>
          assert(got((id, wi.toLong, si.toLong)) === ((tk, vmap(tk))),
            s"doc $id word $wi sub $si")
        }
      }
    }
    // total size agrees with the count op — same tokenizer, two views
    val counts = TextAnalysis.bpeTokenCount(df, "doc_id", "text", merges)
      .agg(sum("n_bpe_tokens")).head.getLong(0)
    assert(got.size.toLong === counts)
  }

  test("a token outside the vocabulary encodes as -1, never silently drops") {
    val s = spark
    import s.implicits._
    val trainDf = Seq(0L -> "ab ab ab").toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(trainDf, "text", 1)
    val vocab = TextAnalysis.bpeVocab(trainDf, "text", merges)
    val later = Seq(1L -> "ab zq").toDF("doc_id", "text") // z,q unseen
    val rows = TextAnalysis.bpeEncodeIds(later, "doc_id", "text", merges, vocab)
      .collect().map(r => (r.getString(3), r.getLong(4)))
    assert(rows.toSet === Set(("ab", 2L), ("z", -1L), ("q", -1L)))
  }

  test("packSequencesBy equals packSequences under the whitespace count") {
    val s = spark
    import s.implicits._
    val df = docs.toDF("doc_id", "text").withColumn("source",
      (col("doc_id") % 2).cast("string"))
    val counted = df.select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val a = TextAnalysis.packSequences(df, "doc_id", "text", "source", 7)
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.packSequencesBy(counted, "doc_id", "source",
        "n_tokens", 7)
      .collect().map(_.toSeq).toSet
    assert(a === b, "the precomputed-count packer is the same packer")
  }

  test("trainer leaves zero engine-owned checkpoint blocks behind") {
    val s = spark
    import s.implicits._
    // settle any blocks prior suites left pending release
    val base = s.sparkContext.getRDDStorageInfo.length
    TextAnalysis.bpeTrain(docs.toDF("doc_id", "text"), "text", 9).collect()
    assert(s.sparkContext.getRDDStorageInfo.length <= base,
      "bpeTrain must release every lineage cut before returning")
  }
}
