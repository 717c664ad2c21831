package graft.tools

import graft.SparkEntry
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale validation of headline bench queries: synthesize the bench
  * tables at sf0.1-equivalent row counts AND at 10× (≈ sf1), run each
  * selected query at both scales through the same noop-sink convention as
  * `graft.Bench`, and enforce a HARD linearity bound on the time ratio —
  * the per-query evidence that the plans scale, complementing
  * [[FullPipelineSmoke]]'s composed-pipeline rehearsal.
  *
  * Tables are hash-derived (the PipelineScaleSmoke formulas) with the same
  * schemas as the driver's testdata, so `SparkEntry.queries` run unchanged.
  * Queries chosen to cover the engine's families: TPC-shape agg + join,
  * sketches, minhash/span dedup, LM quality, brute/compressed ANN,
  * leakage-safe splits, the composed pipeline, and multimodal features.
  * Deliberately NOT included: e7_semdedup — SemDeDup is all-pairs within a
  * cell, quadratic at FIXED nlist by construction (production scales nlist
  * with the corpus; the query pins nlist=8 for its oracle).
  *
  * Bound: t(10×) ≤ 14 × t(1×) — 10× data with 1.4 slack for shuffle/
  * scheduling overhead. Sub-linear ratios are expected on overhead-dominated
  * queries; the fence exists to catch the SUPER-linear regressions
  * (accidental cross joins, per-row driver work, quadratic candidate sets)
  * that local[32] bench timings at one scale cannot see.
  */
object BenchScaleSmoke {
  private val Queries = Seq(
    "q1_pricing_summary", "q18_big_orders",    // TPC shape: agg, join+agg
    "x1_approx_distinct",                       // sketches + exact twins
    "d2_minhash_lsh", "d11_span_dedup",         // dedup: banding, spans
    "t13_lm_quality",                           // bigram LM train + score
    "e1_cosine_topk", "e8_sq_ann",              // ANN: float brute, SQ8
    "x9_leakage_safe_split",                    // components + split
    "w9_pipeline_e2e",                          // composed pipeline
    "mm4_features")                             // multimodal kernel

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val factor = sys.env.getOrElse("BSCALE_FACTOR", "10").toInt
    val bound = factor * 1.4
    val base = sys.env.getOrElse("BSCALE_BASE", "1.0").toDouble

    def synth(k: Double): String = {
      val dir = Files.createTempDirectory(s"graftbscale").toFile.getAbsolutePath
      def n(rows: Long): Long = math.max(100L, (rows * k * base).toLong)

      // documents: 40-token hash text, planted near-dups every 10th, one
      // planted email per ≡3 (mod 100) — the PipelineScaleSmoke corpus
      val docText = concat_ws(" ", (0 until 40).map { j =>
        val b = when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id"))
        val idx = if (j == 7) col("id") * 31 + j else b * 31 + j
        concat(lit("w"), pmod(xxhash64(idx), lit(5000)))
      }: _*)
      spark.range(n(5000)).select(
          col("id").as("doc_id"), docText.as("text"),
          lit("en").as("lang"),
          concat(lit("src"), pmod(xxhash64(col("id")), lit(20))).as("source"))
        .withColumn("n_chars", length(col("text")))
        .write.parquet(s"$dir/documents.parquet")

      spark.range(n(2000)).select(
          col("id").as("vec_id"),
          array((0 until 64).map(j =>
            (pmod(xxhash64(col("id") * 67 + j), lit(1000)) / 500.0 - 1.0)
              .cast("float")): _*).as("embedding"),
          pmod(col("id"), lit(10)).cast("int").as("label"))
        .write.parquet(s"$dir/embeddings.parquet")

      spark.range(n(600000)).select(
          (col("id") / 4).cast("long").as("l_orderkey"),
          pmod(xxhash64(col("id") * 7), lit(200000)).as("l_partkey"),
          pmod(xxhash64(col("id") * 11), lit(10000)).as("l_suppkey"),
          (pmod(col("id"), lit(4)) + 1).cast("int").as("l_linenumber"),
          (pmod(xxhash64(col("id") * 13), lit(50)) + 1).cast("double").as("l_quantity"),
          ((pmod(xxhash64(col("id") * 17), lit(1000)) + 900) * 1.0).as("l_extendedprice"),
          (pmod(xxhash64(col("id") * 19), lit(11)) / 100.0).as("l_discount"),
          (pmod(xxhash64(col("id") * 23), lit(9)) / 100.0).as("l_tax"),
          element_at(array(lit("A"), lit("N"), lit("R")),
            (pmod(xxhash64(col("id") * 29), lit(3)) + 1).cast("int")).as("l_returnflag"),
          element_at(array(lit("O"), lit("F")),
            (pmod(xxhash64(col("id") * 31), lit(2)) + 1).cast("int")).as("l_linestatus"),
          to_timestamp(date_add(lit("1992-01-01").cast("date"),
            pmod(xxhash64(col("id") * 37), lit(2500)).cast("int"))).as("l_shipdate"))
        .write.parquet(s"$dir/lineitem.parquet")

      spark.range(n(150000)).select(
          col("id").as("o_orderkey"),
          pmod(xxhash64(col("id") * 41), lit(15000)).as("o_custkey"),
          element_at(array(lit("O"), lit("F"), lit("P")),
            (pmod(xxhash64(col("id") * 43), lit(3)) + 1).cast("int")).as("o_orderstatus"),
          ((pmod(xxhash64(col("id") * 47), lit(100000)) + 1000) * 1.0).as("o_totalprice"),
          to_timestamp(date_add(lit("1992-01-01").cast("date"),
            pmod(xxhash64(col("id") * 53), lit(2500)).cast("int"))).as("o_orderdate"),
          element_at(array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
              lit("4-NOT SPECIFIED"), lit("5-LOW")),
            (pmod(xxhash64(col("id") * 59), lit(5)) + 1).cast("int")).as("o_orderpriority"))
        .write.parquet(s"$dir/orders.parquet")

      spark.range(n(15000)).select(
          col("id").as("c_custkey"),
          concat(lit("Customer#"), col("id")).as("c_name"),
          pmod(xxhash64(col("id") * 73), lit(25)).cast("int").as("c_nationkey"),
          (pmod(xxhash64(col("id") * 79), lit(10000)) / 10.0).as("c_acctbal"),
          element_at(array(lit("BUILDING"), lit("AUTOMOBILE"), lit("MACHINERY"),
              lit("HOUSEHOLD"), lit("FURNITURE")),
            (pmod(xxhash64(col("id") * 83), lit(5)) + 1).cast("int")).as("c_mktsegment"))
        .write.parquet(s"$dir/customer.parquet")

      spark.range(n(100000)).select(
          col("id").as("event_id"),
          timestamp_seconds(unix_timestamp(lit("2024-01-01 00:00:00")) +
            pmod(xxhash64(col("id")), lit(86400 * 30))).as("ts"),
          pmod(xxhash64(col("id") * 61), lit(5000)).as("user_id"),
          element_at(array(lit("click"), lit("view"), lit("purchase"),
              lit("error"), lit("login")),
            (pmod(xxhash64(col("id") * 67), lit(5)) + 1).cast("int")).as("event_type"),
          (pmod(xxhash64(col("id") * 71), lit(10000)) / 100.0).as("value"),
          lit("""{"k":"v"}""").as("props"))
        .write.parquet(s"$dir/events.parquet")
      dir
    }

    def run(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val d1 = synth(1.0)
    val d10 = synth(factor.toDouble)
    // warm codegen/parquet paths outside the timed region
    Queries.take(2).foreach(q => run(d1, q))

    var failed = List.empty[String]
    Queries.foreach { q =>
      val t1 = math.min(run(d1, q), run(d1, q))   // min of 2: steady state
      val t10 = math.min(run(d10, q), run(d10, q))
      val ratio = t10 / math.max(t1, 0.05)        // floor: timer noise guard
      println(f"BSCALE $q%-24s 1x=$t1%7.2f s  ${factor}x=$t10%7.2f s  ratio=$ratio%6.2f  (bound $bound%.1f)")
      if (ratio > bound) failed ::= f"$q: $ratio%.2f > $bound%.1f"
    }
    require(failed.isEmpty,
      s"SUPER-LINEAR scale-up detected:\n  ${failed.reverse.mkString("\n  ")}")
    println(s"BSCALE all ${Queries.size} queries within ${bound}x at ${factor}x data")
    spark.stop()
  }
}
