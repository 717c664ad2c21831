package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-leg timing of the d17 persisted-LSH lifecycle — the measurement
  * behind the LshIndex write/probe shape decisions.
  */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    def leg[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"LEG $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bucket = graft.ops.Sampling.hashBucket(col("doc_id"), "inc", 10000)
    val corpus = docs.filter(bucket >= 2000)
    val idx = java.nio.file.Files.createTempDirectory("probelsh")
      .toFile.getAbsolutePath
    leg("build")(graft.ops.LshIndex.build(
      docs.filter(bucket >= 6000), "doc_id", "text", idx))
    leg("append")(graft.ops.LshIndex.append(spark, idx,
      docs.filter(bucket >= 5000 && bucket < 6000), "doc_id", "text"))
    leg("appendBatch1")(graft.ops.LshIndex.appendBatch(spark, idx,
      docs.filter(bucket >= 3500 && bucket < 5000), "doc_id", "text", 1))
    leg("compact")(graft.ops.LshIndex.compactIngest(spark, idx))
    leg("appendBatch2")(graft.ops.LshIndex.appendBatch(spark, idx,
      docs.filter(bucket >= 2000 && bucket < 3500), "doc_id", "text", 2))
    val res = leg("screen-plan")(graft.ops.LshIndex.screen(spark, idx, corpus,
      docs.filter(bucket < 2000), "doc_id", "text", threshold = 0.2))
    leg("screen-run")(res.collect().length)
    spark.stop()
  }
}
