package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: simhash64 near-dup pair counts per hamming cutoff at the
  * test scale factors, to pick the d10 maxHamming the oracle asserts on.
  */
object ProbeHamming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val pairs = graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
        .localCheckpoint()
      val byH = pairs.groupBy("hamming").count().orderBy("hamming").collect()
        .map(r => s"h${r.getLong(0)}=${r.getLong(1)}").mkString(" ")
      println(s"PROBE $sf docs=${docs.count()} pairs<=3: ${byH}")
    }
    spark.stop()
  }
}
