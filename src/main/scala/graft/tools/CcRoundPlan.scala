package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dump the physical plan of ONE connected-components contraction round —
  * the loop executes eagerly inside queries, so query-level explain never
  * shows it. Prints the r15 round shape (largeStar ending in distinct, the
  * convergence signature as a SEPARATE aggregation) next to the r16 shape
  * (no largeStar distinct, signature riding the round as CollectMetrics)
  * over the same synthetic edge set, as committed plan evidence.
  */
object CcRoundPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = (1L to 1000L).map(i => (i, i / 3 + 1)).toDF("u", "v")
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()

    def largeStarOld(e: DataFrame): DataFrame = {
      val nbr = e.union(e.select(col("v"), col("u"))).toDF("u", "v")
      val mins = nbr.groupBy("u").agg(least(col("u"), min(col("v"))).as("m"))
      nbr.filter(col("v") > col("u")).join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def largeStarNew(e: DataFrame): DataFrame = {
      val nbr = e.union(e.select(col("v"), col("u"))).toDF("u", "v")
      val mins = nbr.groupBy("u").agg(least(col("u"), min(col("v"))).as("m"))
      nbr.filter(col("v") > col("u")).join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val o = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val mins = o.groupBy("u").agg(min(col("v")).as("m"))
      o.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

    println("========== r15 round: smallStar(largeStar(e)) with largeStar distinct ==========")
    println(fmt(smallStar(largeStarOld(e))))
    println("========== r15 convergence probe: separate aggregation job over the round's checkpoint ==========")
    println(fmt(e.agg(count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("h"))))
    println("========== r16 round: no largeStar distinct; signature rides the SAME pass as CollectMetrics ==========")
    val obs = org.apache.spark.sql.Observation()
    println(fmt(smallStar(largeStarNew(e)).observe(obs, count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("h"))))

    // r17 shape: largeStar materialized per round (its join executes once,
    // not once per reference), smallStar emits both branches from one
    // joined row via explode (o and mins each referenced exactly once)
    def smallStarR17(e: DataFrame): DataFrame = {
      val o = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val mins = o.groupBy("u").agg(min(col("v")).as("m"))
      o.join(mins, "u")
        .select(explode(array(
          struct(col("v").as("u"), col("m").as("v")),
          struct(col("u").as("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    println("========== r17 half-round: largeStar, materialized per round (executes ONCE) ==========")
    println(fmt(largeStarNew(e)))
    println("========== r17 round: smallStar over the materialized half-round, one reference to o and mins, signature as CollectMetrics ==========")
    val half = largeStarNew(e).localCheckpoint()
    val obs17 = org.apache.spark.sql.Observation()
    println(fmt(smallStarR17(half).observe(obs17, count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("h"))))
    spark.stop()
  }
}
