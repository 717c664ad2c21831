package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Does Dataset.observe() deliver metrics when the action is an eager
  * localCheckpoint()? Decides whether the CC convergence probe can fuse
  * into the per-round checkpoint pass.
  */
object ProbeObserve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation("probe")
    val df = spark.range(1000).toDF("u")
      .withColumn("v", col("u") % 7)
      .groupBy("v").agg(count(lit(1)).as("n"))
      .observe(obs, count(lit(1)).as("cnt"),
        sum(xxhash64(col("v"), col("n")).cast("decimal(38,0)")).as("h"))
    val cp = df.localCheckpoint()
    // getOrEmpty-style with timeout so a non-firing observe can't hang us
    val got = try {
      val m = concurrent.Await.result(
        concurrent.Future(obs.get)(concurrent.ExecutionContext.global),
        concurrent.duration.Duration(10, "s"))
      s"METRICS ${m("cnt")} ${m("h")}"
    } catch { case _: java.util.concurrent.TimeoutException => "TIMEOUT" }
    println(s"observe-on-localCheckpoint: $got (rows=${cp.count()})")
    spark.stop()
  }
}
