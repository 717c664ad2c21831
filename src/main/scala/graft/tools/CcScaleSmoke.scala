package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Connected-components stress at the shape nothing else in the suite can
  * reach: one chain of diameter CC_CHAIN (default 1,000,000 — a duplicate
  * path a fixed-round propagation would need a million rounds to close)
  * plus CC_TRIANGLES disjoint triangles of bulk component count. Expected
  * structure is exact and asserted: 1 + CC_TRIANGLES components, every
  * label the component minimum.
  *
  * The point being measured: alternating large-star/small-star contracts
  * the chain geometrically, so wall time grows with log(diameter) x the
  * per-round shuffle of the CURRENT (shrinking) edge set — not with the
  * diameter itself.
  */
object CcScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val chainN = sys.env.getOrElse("CC_CHAIN", "1000000").toLong
    val triN = sys.env.getOrElse("CC_TRIANGLES", "300000").toLong

    val chain = spark.range(chainN - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val tri = spark.range(triN).flatMap { k =>
      val b = chainN + 3 * k
      Seq((b, b + 1), (b + 1, b + 2), (b, b + 2))
    }.toDF("doc_a", "doc_b")
    val nodes = spark.range(chainN + 3 * triN).select(col("id").as("node"))
    val nEdges = (chainN - 1) + 3 * triN

    val t0 = System.nanoTime()
    val labels = Dedup.connectedComponents(nodes, chain.union(tri)).localCheckpoint()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"CCSCALE connected components: chain diameter $chainN%,d + $triN%,d triangles " +
      f"($nEdges%,d edges) in $secs%.1f s")

    val nComponents = labels.select("label").distinct().count()
    require(nComponents == 1 + triN, s"expected ${1 + triN} components, got $nComponents")
    val chainBad = labels.filter(col("node") < chainN && col("label") =!= 0).count()
    require(chainBad == 0, s"chain must collapse to label 0 ($chainBad stragglers)")
    val triBad = labels.filter(col("node") >= chainN &&
      col("label") =!= (col("node") - chainN) - pmod(col("node") - chainN, lit(3)) + chainN)
      .count()
    require(triBad == 0, s"triangle labels must be their base ($triBad wrong)")
    println("CCSCALE all component labels exact")
    spark.stop()
  }
}
