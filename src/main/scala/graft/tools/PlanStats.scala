package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Per-query plan statistics (shuffle count, codegen spans, scan count) —
  * the measurement behind PlanShapeSpec's plan budgets.
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.01"
    // optional 2nd arg: comma-separated query names to measure (default all)
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        def count(tok: String) = tok.r.findAllIn(p).size
        println(f"$name%-24s exchanges=${count("Exchange (hash|range|single)")}%2d " +
          f"codegen=${count("\\*\\(\\d+\\)")}%3d sorts=${count("\\bSort\\b")}%2d " +
          f"sortAgg=${count("SortAggregate")}%2d bcast=${count("BroadcastHashJoin")}%d " +
          f"smj=${count("SortMergeJoin")}%d")
      } catch { case e: Exception => println(s"$name FAILED ${e.getMessage}") }
    }
    spark.stop()
  }
}
