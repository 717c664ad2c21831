package graft

import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level helpers for the engine's custom Catalyst expressions and the
  * partitioning arithmetic the reference uses (util/common.go:13-18,40-56).
  */
package object functions {

  /** FNV-1a 32-bit, sign bit cleared — bit-compatible with the reference's
    * stored `aggregate_id_hash`.
    */
  def fnv1a32(c: Column): Column =
    ExpressionUtils.column(Fnv1a32(ExpressionUtils.expression(c)))

  /** Millisecond epoch time encoded in a ULID id column. */
  def ulid_millis(c: Column): Column =
    ExpressionUtils.column(UlidMillis(ExpressionUtils.expression(c)))

  /** Codegen'd cosine similarity of two array<double> columns. */
  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd Jaccard similarity of two distinct array<string> sets. */
  def jaccard_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd SRP-LSH bucket keys (one `int` per hyperplane table) of an
    * array<double> vector.
    */
  def srp_buckets(vec: Column, signs: Array[Array[Array[Int]]]): Column =
    ExpressionUtils.column(SrpBuckets(ExpressionUtils.expression(vec), signs))

  /** Codegen'd nearest-centroid assignment of an array<double> vector over
    * a fixed (cent_id-sorted) centroid matrix: `struct<idx:int, csim:double>`
    * — the IVF corpus-assignment kernel as a pure scan projection.
    */
  def nearest_centroid(vec: Column, cents: Array[Array[Double]]): Column =
    ExpressionUtils.column(NearestCentroid(ExpressionUtils.expression(vec), cents))

  /** Codegen'd product-quantization encoder: array<double> → m 1-based
    * codes against fixed codebooks — the PQ corpus-encode kernel as a pure
    * scan projection.
    */
  def pq_codes(vec: Column, books: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqCodes(ExpressionUtils.expression(vec), books))

  /** Codegen'd packed `width`-bit SimHash of an array<string> token column
    * (pure projection — no explode, no shuffle).
    */
  def simhash_packed(tokens: Column, width: Int): Column =
    ExpressionUtils.column(SimhashPacked(ExpressionUtils.expression(tokens), width))

  /** Codegen'd MinHash band signatures (array<long>, one per band) of an
    * array<string> shingle column (pure projection — no explode, no shuffle).
    */
  def minhash_sigs(shingles: Column, a: Seq[Long], c: Seq[Long], p: Long): Column =
    ExpressionUtils.column(MinhashSigs(
      ExpressionUtils.expression(shingles), a.toArray, c.toArray, p))

  /** As [[minhash_sigs]] but shingling n-grams from a TOKEN column inside
    * the expression (single child reference — CollapseProject-safe).
    */
  def minhash_shingle_sigs(tokens: Column, shingleSize: Int, a: Seq[Long],
      c: Seq[Long], p: Long): Column =
    ExpressionUtils.column(MinhashShingleSigs(
      ExpressionUtils.expression(tokens), shingleSize, a.toArray, c.toArray, p))

  /** 1-based partition assignment: `(hash % partitions) + 1`
    * (reference: util/common.go:13-18). `hash` is already non-negative.
    */
  def calc_partition(hash: Column, partitions: Int): Column =
    if (partitions <= 1) lit(1) else pmod(hash, lit(partitions)) + lit(1)

  /** 0-based split selector used by catchup workers:
    * `MOD(aggregate_id_hash, splits) IN splitIds`
    * (reference: store/postgresql/store.go:536-548).
    */
  def split_of(hash: Column, splits: Int): Column = pmod(hash, lit(splits))

  /** Bloom-filter aggregate over a column (hashed with xxhash64, the same
    * hash [[bloom_might_contain]] probes with) — returns the serialized
    * filter as a single binary row. Feed the resulting one-row frame
    * through [[graft.functions.bloom_of]] / `Bridge.scalarSubquery` to use
    * it as a scan-side prefilter (the `InjectRuntimeFilter` pattern).
    */
  def bloom_agg(c: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(ExpressionUtils.expression(c))),
        expectedItems).toAggregateExpression())

  /** The serialized Bloom filter of `df`'s `c` values as a scalar-subquery
    * Column: evaluated once, shipped to every task.
    */
  def bloom_of(df: org.apache.spark.sql.DataFrame, c: Column,
      expectedItems: Long): Column =
    ExpressionUtils.scalarSubquery(df.select(bloom_agg(c, expectedItems)))

  /** Membership probe against a [[bloom_of]] filter — no false negatives,
    * bounded false positives; pair with an exact verify join downstream.
    */
  def bloom_might_contain(bloom: Column, c: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ExpressionUtils.expression(bloom),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(ExpressionUtils.expression(c)))))

  /** Register SQL names for the custom expressions so `spark.sql` queries and
    * `expr(...)` strings can use them too.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("fnv1a32", es => Fnv1a32(es.head), "internal")
    reg.createOrReplaceTempFunction("ulid_millis", es => UlidMillis(es.head), "internal")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "internal")
    reg.createOrReplaceTempFunction("jaccard_sim", es => JaccardSim(es(0), es(1)), "internal")
    // SQL macros: single-argument text ops registered as their full Column
    // composition — `spark.sql("SELECT pii_redact(text) …")` expands to the
    // same codegen'd expression tree the Scala API builds, no UDF involved.
    import graft.ops.TextAnalysis
    def macro1(name: String, f: Column => Column): Unit =
      reg.createOrReplaceTempFunction(name,
        es => {
          if (es.length != 1)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map("functionName" -> name,
                "expectedNum" -> "1", "actualNum" -> es.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"))
          ExpressionUtils.resolvedExpression(spark,
            f(ExpressionUtils.column(es.head)))
        },
        "internal")
    macro1("pii_redact", TextAnalysis.piiRedact)
    macro1("pii_email_count", TextAnalysis.piiEmailCount)
    macro1("pii_phone_count", TextAnalysis.piiPhoneCount)
    macro1("pii_ip_count", TextAnalysis.piiIpCount)
    macro1("token_count", TextAnalysis.tokenCount)
    macro1("bpeish_token_count", TextAnalysis.bpeishTokenCount)
    macro1("distinct_ratio", TextAnalysis.distinctRatio)
    macro1("doc_fingerprint", TextAnalysis.fingerprint)
    macro1("token_hash32", TextAnalysis.tokenHash32)
    macro1("strip_markup", TextAnalysis.stripMarkup)
    macro1("markup_density_pm", TextAnalysis.markupDensityPerMille)
    // route_of(fmt, codec, n_channels[, n_frames]): the intake routing
    // policy as the same codegen'd Column tree routeIntake plans — the SQL
    // deployment routes a pre-sniffed manifest without touching the Scala
    // API. The 3-arg legacy form routes with the frame count UNKNOWN, so a
    // gif verdict honestly lands in quarantine:gif-unknown-frames instead
    // of guessing single-frame (policy v2's animated-GIF split).
    reg.createOrReplaceTempFunction("route_of",
      es => {
        if (es.length < 3 || es.length > 4)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map("functionName" -> "route_of",
              "expectedNum" -> "3 or 4", "actualNum" -> es.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        val nFrames =
          if (es.length == 4) ExpressionUtils.column(es(3))
          else org.apache.spark.sql.functions.lit(null)
        ExpressionUtils.resolvedExpression(spark,
          graft.ops.Multimodal.routeOf(ExpressionUtils.column(es(0)),
            ExpressionUtils.column(es(1)), ExpressionUtils.column(es(2)),
            nFrames))
      },
      "internal")
    // zorder_key(dim1, dim2, …): Morton interleave of all arguments at the
    // widest per-dim width that fits a signed long (16 bits up to 3 dims,
    // 63/n beyond) — same codegen'd shift/mask/add tree as the Scala API.
    reg.createOrReplaceTempFunction("zorder_key",
      es => {
        if (es.isEmpty || es.length > 63)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map("functionName" -> "zorder_key",
              "expectedNum" -> "1 to 63", "actualNum" -> es.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        val bits = math.min(16, 63 / es.length)
        ExpressionUtils.resolvedExpression(spark,
          graft.ops.Layout.zorderKey(es.map(ExpressionUtils.column), bits))
      },
      "internal")
  }
}
