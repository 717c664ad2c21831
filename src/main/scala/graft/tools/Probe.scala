package graft.tools

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe for pipeline stages (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("warmup")(noop(docs))
    time("tokens only")(noop(docs.select(TextAnalysis.tokens(col("text")).as("ws"))))
    time("shingles (materialized ws)")(noop(
      docs.select(TextAnalysis.tokens(col("text")).as("ws"))
        .select(Dedup.shinglesFromTokens(col("ws")).as("sh"))))
    time("explode + bands + md5")(noop(
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(col("doc_id"), explode(Dedup.shinglesFromTokens(col("ws"))).as("s"))
        .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("b"), col("s"))
        .select(md5(concat(col("b").cast("string"), lit("|"), col("s"))).as("h"))))
    time("signatures (codegen projection)")(noop(Dedup.minhashSignatures(docs, "doc_id", "text")))
    time("candidate pairs")(noop(Dedup.lshCandidatePairs(docs, "doc_id", "text")))
    spark.stop()
  }
}
