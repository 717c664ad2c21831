package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared synthetic graph for the connected-components smokes: one chain of
  * diameter `chainN` (the adversarial shape for any per-hop propagation)
  * plus `triN` disjoint triangles over ids `[chainN, chainN + 3·triN)` as
  * bulk component count. One construction + one assertion set, used by both
  * [[PipelineScaleSmoke]] and [[CcScaleSmoke]] so the fixtures cannot
  * drift apart.
  */
private[tools] object GraphFixtures {

  /** (nodes, pairs) for the chain+triangles graph. */
  def chainAndTriangles(spark: SparkSession, chainN: Long,
      triN: Long): (DataFrame, DataFrame) = {
    import spark.implicits._
    val chain = spark.range(chainN - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val tri = spark.range(triN).flatMap { k =>
      val b = chainN + 3 * k
      Seq((b, b + 1), (b + 1, b + 2), (b, b + 2))
    }.toDF("doc_a", "doc_b")
    val nodes = spark.range(chainN + 3 * triN).select(col("id").as("node"))
    (nodes, chain.union(tri))
  }

  /** Exact-structure assertions: 1 + triN components, the chain collapsed
    * to label 0, every triangle labeled by its base id.
    */
  def assertExactLabels(labels: DataFrame, chainN: Long, triN: Long): Unit = {
    val nComponents = labels.select("label").distinct().count()
    require(nComponents == 1 + triN,
      s"expected ${1 + triN} components, got $nComponents")
    val chainBad = labels.filter(col("node") < chainN && col("label") =!= 0).count()
    require(chainBad == 0, s"chain must collapse to label 0 ($chainBad stragglers)")
    val triBad = labels.filter(col("node") >= chainN &&
      col("label") =!= (col("node") - chainN) - pmod(col("node") - chainN, lit(3)) + chainN)
      .count()
    require(triBad == 0, s"triangle labels must be their base ($triBad wrong)")
  }
}
