package graft.tools
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeBuckets {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val signs = Similarity.srpSigns(Similarity.SrpSeed, 8, 8, 64)
      val ce = Similarity.asDouble(col("embedding"))
      for (t <- 0 until 2) {
        val bc = emb.select(Similarity.srpBucket(ce, signs(t)).as("b"))
          .groupBy("b").count().agg(max("count"), count(lit(1)), avg("count")).head()
        println(s"$dir n=$n table=$t maxBucket=${bc.get(0)} nBuckets=${bc.get(1)} avg=${bc.get(2)}")
      }
    }
    spark.stop()
  }
}
