package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form learned quality filters — add-k Naive Bayes classifier and
  * DSIR hashed-unigram importance weights — against independent
  * single-threaded reference implementations, plus the structural
  * properties that make them trustworthy: smoothing-floor behavior on
  * unseen words, the one-class refusal, and DSIR's identical-corpora ⇒
  * exactly-zero cancellation.
  */
class QualityModelSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def words(text: String): Seq[String] =
    text.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  // ── reference NB: the textbook closed form, driver-side ────────────────
  private def refNb(train: Seq[(String, Boolean)], score: Seq[String],
      k: Double): Seq[Double] = {
    val cp = collection.mutable.Map.empty[String, Double].withDefaultValue(0d)
    val cn = collection.mutable.Map.empty[String, Double].withDefaultValue(0d)
    train.foreach { case (t, pos) =>
      words(t).foreach(w => if (pos) cp(w) += 1 else cn(w) += 1)
    }
    val vocab = (cp.keySet ++ cn.keySet).toSeq
    val (np, nn, v) = (cp.values.sum, cn.values.sum, vocab.size.toDouble)
    val dp = train.count(_._2).toDouble
    val dn = train.size - dp
    val prior = math.log(dp / dn)
    def lp(c: Double, n: Double) = math.log((c + k) / (n + k * v))
    score.map { t =>
      prior + words(t).map { w =>
        val p = if (cp.contains(w) || cn.contains(w)) lp(cp(w), np) else lp(0, np)
        val q = if (cp.contains(w) || cn.contains(w)) lp(cn(w), nn) else lp(0, nn)
        p - q
      }.sum
    }
  }

  private val train: Seq[(Long, String, Boolean)] = Seq(
    (0L, "fast scan good table clean clean prose", true),
    (1L, "good clean order data well formed text", true),
    (2L, "clean fast table good value", true),
    (3L, "spam spam buy now click spam", false),
    (4L, "click buy spam now now buy", false))
  private val heldOut: Seq[(Long, String)] = Seq(
    (10L, "clean good data table"),          // in-vocab, positive-leaning
    (11L, "spam click buy"),                 // in-vocab, negative-leaning
    (12L, "zebra quark unseen clean spam"))  // exercises BOTH floors

  test("nbScore equals the reference, floors and prior included") {
    val s = spark
    import s.implicits._
    val model = TextAnalysis.nbTrain(
      train.toDF("doc_id", "text", "pos"), "text", "pos", k = 0.5)
    val got = TextAnalysis.nbScore(
        heldOut.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getBoolean(3)))).toMap
    val expect = refNb(train.map(t => (t._2, t._3)), heldOut.map(_._2), 0.5)
    heldOut.map(_._1).zip(expect).foreach { case (id, e) =>
      val (logit, nWords, pred) = got(id)
      assert(math.abs(logit - e) < 1e-6, s"doc $id logit")
      assert(pred === (e > 0), s"doc $id verdict")
    }
    assert(got(10L)._2 === 4L && got(12L)._2 === 5L)
    assert(got(10L)._3 && !got(11L)._3,
      "clean prose scores positive, spam negative — the filter filters")
  }

  test("a persisted model scores a later batch identically (parquet round-trip)") {
    val s = spark
    import s.implicits._
    val model = TextAnalysis.nbTrain(
      train.toDF("doc_id", "text", "pos"), "text", "pos")
    val dir = java.nio.file.Files.createTempDirectory("graftnb").toString
    model.write.mode("overwrite").parquet(dir)
    val fresh = TextAnalysis.nbScore(
      heldOut.toDF("doc_id", "text"), "doc_id", "text", model).collect().toSeq
    val loaded = TextAnalysis.nbScore(
      heldOut.toDF("doc_id", "text"), "doc_id", "text",
      s.read.parquet(dir)).collect().toSeq
    assert(fresh.map(_.toSeq).toSet === loaded.map(_.toSeq).toSet)
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(s"file://$dir"),
      s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
  }

  test("nbTrain refuses a one-class corpus loudly") {
    val s = spark
    import s.implicits._
    val oneClass = train.filter(_._3).toDF("doc_id", "text", "pos")
    val ex = intercept[Exception] {
      TextAnalysis.nbTrain(oneClass, "text", "pos").collect()
    }
    assert(ex.getMessage.contains("both classes") ||
      Option(ex.getCause).exists(_.getMessage.contains("both classes")))
  }

  // ── reference DSIR ─────────────────────────────────────────────────────
  private def bucketOf(w: String, buckets: Int): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
    val h = ((md5(3) & 0xffL) << 24) | ((md5(2) & 0xffL) << 16) |
      ((md5(1) & 0xffL) << 8) | (md5(0) & 0xffL)
    h % buckets
  }

  private def refDsir(raw: Seq[(Long, String)], target: Seq[String],
      buckets: Int, k: Double): Map[Long, Double] = {
    def census(texts: Seq[String]) = texts.flatMap(words)
      .groupBy(bucketOf(_, buckets)).map { case (b, xs) => b -> xs.size.toDouble }
    val (ct, cr) = (census(target), census(raw.map(_._2)))
    val (nt, nr) = (ct.values.sum, cr.values.sum)
    def lr(b: Long) =
      math.log((ct.getOrElse(b, 0d) + k) / (nt + k * buckets)) -
        math.log((cr.getOrElse(b, 0d) + k) / (nr + k * buckets))
    raw.map { case (id, t) =>
      id -> words(t).map(w => lr(bucketOf(w, buckets))).sum
    }.toMap
  }

  test("dsirWeights equals the reference; target-like docs rank higher") {
    val s = spark
    import s.implicits._
    val target = Seq("clean prose table data order", "well formed clean text data",
      "good clean data order")
    val raw = Seq(
      (0L, "clean data order text"),     // target-like
      (1L, "spam click buy now"),        // far from target
      (2L, "clean spam data buy"))       // mixed
    val got = TextAnalysis.dsirWeights(
        raw.toDF("doc_id", "text"),
        target.zipWithIndex.map { case (t, i) => (100L + i, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text", buckets = 256, k = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val expect = refDsir(raw, target, 256, 0.5)
    raw.foreach { case (id, t) =>
      assert(math.abs(got(id)._1 - expect(id)) < 1e-6, s"doc $id weight")
      assert(got(id)._2 === words(t).size.toLong)
    }
    assert(got(0L)._1 > got(2L)._1 && got(2L)._1 > got(1L)._1,
      "importance order: target-like > mixed > anti-target")
  }

  test("identical corpora get exactly zero everywhere (term-by-term cancellation)") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "alpha beta gamma"), (1L, "beta beta delta"),
      (2L, "gamma alpha alpha"))
    val w = TextAnalysis.dsirWeights(docs.toDF("doc_id", "text"),
        docs.toDF("doc_id", "text"), "doc_id", "text", buckets = 64)
      .collect().map(_.getDouble(1))
    assert(w.length === 3 && w.forall(_ === 0d),
      "p_target ≡ p_raw ⇒ every log-ratio is exactly 0, not merely small")
  }

  test("dsirModel is total over its bucket domain; a persisted model scores unseen vocabulary") {
    val s = spark
    import s.implicits._
    val model = TextAnalysis.dsirModel(
      train.map(t => (t._1, t._2)).toDF("doc_id", "text"),
      heldOut.toDF("doc_id", "text"), "text", buckets = 128)
    assert(model.count() === 128L, "one row per bucket, observed or not")
    val dir = java.nio.file.Files.createTempDirectory("graftdsir").toString
    model.write.mode("overwrite").parquet(dir)
    // a later batch whose words neither corpus contains still scores —
    // every token lands in SOME bucket and the model covers them all
    val novel = Seq((50L, "xylophone quixotic jabberwock")).toDF("doc_id", "text")
    val scored = TextAnalysis.dsirScore(novel, "doc_id", "text",
      s.read.parquet(dir)).collect()
    assert(scored.length === 1 && scored(0).getLong(2) === 3L,
      "three novel tokens, three scored features, zero dropped")
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(s"file://$dir"),
      s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
  }

  test("ingest screens: streaming batches score exactly like the batch ops") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftscreens").toString
    val nbModel = TextAnalysis.nbTrain(
      train.toDF("doc_id", "text", "pos"), "text", "pos")
    val dsModel = TextAnalysis.dsirModel(
      train.filter(!_._3).map(t => (t._1, t._2)).toDF("doc_id", "text"),
      train.filter(_._3).map(t => (t._1, t._2)).toDF("doc_id", "text"),
      "text", buckets = 128)
    heldOut.toDF("doc_id", "text").write.parquet(s"$dir/in")
    val wantNb = TextAnalysis.nbScore(s.read.parquet(s"$dir/in"),
      "doc_id", "text", nbModel).collect().map(_.toString).sorted.toSeq
    val wantDs = TextAnalysis.dsirScore(s.read.parquet(s"$dir/in"),
      "doc_id", "text", dsModel).collect().map(_.toString).sorted.toSeq
    def drive(mk: org.apache.spark.sql.DataFrame =>
        ((org.apache.spark.sql.DataFrame, Long) => Unit) =>
          org.apache.spark.sql.streaming.DataStreamWriter[
            org.apache.spark.sql.Row],
        chk: String): Seq[String] = {
      val got = scala.collection.mutable.ArrayBuffer[String]()
      val q = mk(s.readStream.schema("doc_id long, text string")
          .parquet(s"$dir/in")) { (res, _) =>
          got.synchronized { got ++= res.collect().map(_.toString); () }
        }.option("checkpointLocation", s"$dir/$chk").start()
      try q.processAllAvailable() finally q.stop()
      got.sorted.toSeq
    }
    assert(drive(st => graft.streaming.StreamAggs.screenNbAtIngest(
      st, nbModel, "doc_id", "text"), "chkNb") === wantNb)
    assert(drive(st => graft.streaming.StreamAggs.screenDsirAtIngest(
      st, dsModel, "doc_id", "text"), "chkDs") === wantDs)
  }

  test("a stopped ingest screen releases its model block (no per-screen leak)") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val model = TextAnalysis.nbTrain(
      train.toDF("doc_id", "text", "pos"), "text", "pos")
    val dir = java.nio.file.Files.createTempDirectory("graftscreenrel").toString
    // track NEW block ids, not the count: earlier suites' leftover blocks can
    // be reclaimed by the ContextCleaner mid-test, so a size comparison races
    // with their asynchronous release (observed flaky in full-suite runs)
    val base = s.sparkContext.getPersistentRDDs.keySet
    def fresh() = s.sparkContext.getPersistentRDDs.keySet -- base
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamAggs.screenNbAtIngest(
        in.toDF().toDF("doc_id", "text"), model, "doc_id", "text") { (r, _) =>
        r.count(): Unit
      }
      .option("checkpointLocation", s"$dir/chk").start()
    try {
      (0 until 3).foreach { b =>
        in.addData((10L + b, "clean data"), (20L + b, "spam buy"))
        q.processAllAvailable()
        assert(fresh().size === 1,
          s"batch $b: exactly the model's block, flat — never per-batch growth")
      }
    } finally q.stop()
    // the termination listener fires on the async listener bus — poll
    val deadline = System.nanoTime() + 15_000_000_000L
    while (fresh().nonEmpty &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(fresh().isEmpty,
      "query termination must release the model block — a long-lived " +
        "driver cycling screens would otherwise leak one block per start")
  }

  test("an empty persisted model refuses loudly instead of silently nulling scores") {
    val s = spark
    import s.implicits._
    val docs = heldOut.toDF("doc_id", "text")
    val nbModel = TextAnalysis.nbTrain(train.toDF("doc_id", "text", "pos"),
      "text", "pos")
    val dsModel = TextAnalysis.dsirModel(docs, docs, "text", buckets = 32)
    def msgOf(e: Throwable): String = {
      var t = e; var m = Option(t.getMessage).getOrElse("")
      while (t.getCause != null) { t = t.getCause
        m += " " + Option(t.getMessage).getOrElse("") }
      m
    }
    val e1 = intercept[Exception](TextAnalysis.nbScore(docs, "doc_id", "text",
      nbModel.filter(lit(false))).collect())
    assert(msgOf(e1).contains("model is empty"))
    val e2 = intercept[Exception](TextAnalysis.dsirScore(docs, "doc_id", "text",
      dsModel.filter(lit(false))).collect())
    assert(msgOf(e2).contains("model is empty"))
  }

  test("both model joins broadcast (vocab/bucket-sized build sides)") {
    val s = spark
    import s.implicits._
    val model = TextAnalysis.nbTrain(
      train.toDF("doc_id", "text", "pos"), "text", "pos")
    val nbPlan = TextAnalysis.nbScore(heldOut.toDF("doc_id", "text"),
      "doc_id", "text", model).queryExecution.executedPlan.toString
    assert(nbPlan.contains("BroadcastHashJoin") &&
      !nbPlan.contains("SortMergeJoin"))
    val dsPlan = TextAnalysis.dsirWeights(
      heldOut.toDF("doc_id", "text"), train.map(t => (t._1, t._2))
        .toDF("doc_id", "text"), "doc_id", "text", buckets = 64)
      .queryExecution.executedPlan.toString
    assert(dsPlan.contains("BroadcastHashJoin") &&
      !dsPlan.contains("SortMergeJoin"))
  }
}
