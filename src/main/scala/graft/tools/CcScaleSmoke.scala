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

    val (nodes, pairs) = GraphFixtures.chainAndTriangles(spark, chainN, triN)
    val nEdges = (chainN - 1) + 3 * triN

    val t0 = System.nanoTime()
    val labels = Dedup.connectedComponents(nodes, pairs).localCheckpoint()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"CCSCALE connected components: chain diameter $chainN%,d + $triN%,d triangles " +
      f"($nEdges%,d edges) in $secs%.1f s")

    GraphFixtures.assertExactLabels(labels, chainN, triN)
    println("CCSCALE all component labels exact")
    spark.stop()
  }
}
