package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Print every Spark job a single query fires (description + stage count)
  * — the "where do 35 jobs come from" microscope.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(0) else "/root/testdata/sf0.1"
    val q = args.last
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t00 = System.nanoTime()
    @volatile var last = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val now = System.nanoTime()
        val gap = (now - last) / 1e6
        last = now
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(j.stageInfos.lastOption.map(_.name)).getOrElse("?")
        println(f"JOB ${j.jobId}%3d +${(now - t00) / 1e9}%6.2fs gap=${gap}%6.0fms stages=${j.stageInfos.size}%2d $desc")
      }
    })
    SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
    org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
    spark.stop()
  }
}
