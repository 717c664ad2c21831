package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Is the (band, sb)-partitioned index write dominated by the v1 job
  * commit's sequential directory renames? Times the same write under
  * FileOutputCommitter algorithm 1 vs 2.
  */
object ProbeCommit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def sigs = graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text", 4, 3)
      .withColumn("sb", pmod(col("sig"), lit(16L)).cast("int"))
      .repartition(col("band"), col("sb"))
    val tmp = java.nio.file.Files.createTempDirectory("probecommit")
      .toFile.getAbsolutePath
    def leg(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"LEG $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup (sign + codegen)
    sigs.write.mode("overwrite").parquet(s"$tmp/warm")
    (1 to 2).foreach { i =>
      leg(s"v1 partitioned #$i")(sigs.write.mode("overwrite")
        .partitionBy("band", "sb").parquet(s"$tmp/v1_$i"))
      leg(s"v2 partitioned #$i")(sigs.write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("band", "sb").parquet(s"$tmp/v2_$i"))
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(tmp))
    spark.stop()
  }
}
