package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage-level timing for labelPropagation shapes at SCALE_DOCS (1M-doc
  * smoke regression hunt): pairs are materialized once, then each shape of
  * the propagation is timed in isolation.
  */
object ProbeLP {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = sys.env.getOrElse("SCALE_DOCS", "1000000").toInt
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PLP $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = time("synthesize") {
      spark.range(nDocs.toLong).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map { j =>
          val base = when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id"))
          val idx = if (j == 7) col("id") * 31 + j else base * 31 + j
          concat(lit("w"), pmod(xxhash64(idx), lit(5000)))
        }: _*).as("text")).localCheckpoint()
    }
    val sets = time("shingle sets") {
      Dedup.shingleSets(docs, "doc_id", "text").localCheckpoint()
    }
    val pairs = time("LSH + verify -> pairs") {
      Dedup.jaccardVerifyFromSets(sets,
        Dedup.lshCandidatePairsFromSets(sets), 0.5)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
    }
    time("pairs count")(println("  n=" + pairs.count()))
    val nodes = docs.select(col("doc_id").as("node"))
    time("labelprop NEW (touched-only)")(
      println("  n=" + Dedup.labelPropagation(nodes, pairs, 3).count()))
    time("labelprop NEW again")(
      println("  n=" + Dedup.labelPropagation(nodes, pairs, 3).count()))
    time("dedupSurvivors e2e + checkpoint")(
      println("  n=" + Dedup.dedupSurvivors(docs, "doc_id", "text",
        threshold = 0.5, rounds = 3).localCheckpoint().count()))
    spark.stop()
  }
}
