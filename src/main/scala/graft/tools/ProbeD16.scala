package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does d16 blow up at sf10? Bucket-size distribution and candidate
  * pair volume of the LSH stage over the generated tier's documents.
  */
object ProbeD16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args.head else "data/sf10"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs: ${docs.count()}")
    val sets = graft.ops.Dedup.shingleSets(docs, "doc_id", "text")
    val sigs = graft.ops.Dedup.minhashSignaturesFromSets(sets, 4)
    val buckets = sigs.groupBy("band", "sig").count()
    println("bucket size distribution (top 10):")
    buckets.orderBy(col("count").desc).limit(10).collect()
      .foreach(r => println(s"  band=${r.get(0)} sig=${r.get(1)} n=${r.get(2)}"))
    val pairVolume = buckets.filter(col("count") > 1)
      .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
    println(s"total candidate pair volume (pre-distinct): $pairVolume")
    spark.stop()
  }
}
