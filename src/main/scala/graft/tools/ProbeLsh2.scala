package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose one LshIndex write leg: sign vs flat write vs partitioned
  * write vs partition-count sensitivity.
  */
object ProbeLsh2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    def leg[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"LEG $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bucket = graft.ops.Sampling.hashBucket(col("doc_id"), "inc", 10000)
    val slice = docs.filter(bucket >= 5000 && bucket < 6000)
    val tmp = java.nio.file.Files.createTempDirectory("probelsh2")
      .toFile.getAbsolutePath
    def sigs = graft.ops.Dedup.minhashSignatures(slice, "doc_id", "text", 4, 3)
      .withColumn("sb", pmod(col("sig"), lit(64L)).cast("int"))
    leg("sign+count")(sigs.count())
    leg("sign+count again")(sigs.count())
    leg("flat write")(sigs.write.mode("overwrite").parquet(s"$tmp/flat"))
    leg("repart+partitioned write")(sigs.repartition(col("band"), col("sb"))
      .write.mode("overwrite").partitionBy("band", "sb").parquet(s"$tmp/part"))
    leg("partitioned write again")(sigs.repartition(col("band"), col("sb"))
      .write.mode("overwrite").partitionBy("band", "sb").parquet(s"$tmp/part2"))
    leg("sb16 partitioned write")(
      graft.ops.Dedup.minhashSignatures(slice, "doc_id", "text", 4, 3)
        .withColumn("sb", pmod(col("sig"), lit(16L)).cast("int"))
        .repartition(col("band"), col("sb"))
        .write.mode("overwrite").partitionBy("band", "sb").parquet(s"$tmp/p16"))
    val nf = new java.io.File(s"$tmp/part").listFiles().flatMap(b =>
      if (b.isDirectory) b.listFiles().flatMap(sb =>
        if (sb.isDirectory) sb.listFiles() else Array(sb)) else Array(b))
      .count(_.getName.endsWith(".parquet"))
    println(s"files in partitioned table: $nf")
    spark.stop()
  }
}
