package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement driver behind the SRP-LSH parameter choice (e2/e4/e5): mean
  * recall@3 and candidate volume per (bits, tables, probeRadius) on the
  * bench embeddings.
  */
object ProbeSrp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 3)
      .localCheckpoint()

    def measure(label: String, approx: org.apache.spark.sql.DataFrame): Unit = {
      val r = Similarity.recallAtK(exact, approx, 3)
        .agg(avg(col("recall"))).head().getDouble(0)
      println(f"PROBE $label%-42s recall=$r%.3f  (corpus $n)")
    }

    for ((bits, tables, radius) <- Seq((8, 1, 0), (8, 1, 1), (8, 2, 1), (8, 4, 1),
        (8, 8, 1))) {
      val approx =
        if (tables == 1) Similarity.signLshTopK(emb, queries, "vec_id", "embedding",
          k = 3, bits = bits, probeRadius = radius)
        else Similarity.signLshTopKMulti(emb, queries, "vec_id", "embedding",
          k = 3, bits = bits, tables = tables, probeRadius = radius)
      measure(s"bits=$bits tables=$tables radius=$radius", approx)
    }
    spark.stop()
  }
}
