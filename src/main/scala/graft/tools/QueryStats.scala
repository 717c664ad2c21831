package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Deterministic per-query execution census: jobs, stages, tasks, shuffle
  * bytes, for named queries (or all). Host-noise-immune evidence for plan
  * work — two runs of the same code produce the same counts, so a
  * before/after diff here is a real structural change, not CPU weather.
  *
  * Usage: runMain graft.tools.QueryStats <sfDir> [q1,q2,...]
  */
object QueryStats {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = if (args.length > 1) Some(args(1).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-querystats")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0L
    @volatile var stages = 0L
    @volatile var tasks = 0L
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        Option(s.stageInfo.taskMetrics).foreach { m =>
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          shufRead += m.shuffleReadMetrics.remoteBytesRead +
            m.shuffleReadMetrics.localBytesRead
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    println(f"${"query"}%-28s ${"sec"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"shW(KB)"}%9s ${"shR(KB)"}%9s")
    selected.foreach { case (name, fn) =>
      // settle listener bus so counts attribute to this query
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
      jobs = 0; stages = 0; tasks = 0; shufWrite = 0; shufRead = 0
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
      println(f"$name%-28s $sec%8.2f $jobs%6d $stages%7d $tasks%7d ${shufWrite / 1024}%9d ${shufRead / 1024}%9d")
      System.gc()
    }
    spark.stop()
  }
}
