package graft

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact connected components (alternating large-star/small-star): converges
  * to true component minima on any graph shape — including the long chains
  * that defeat fixed-round label propagation — and matches a union-find
  * reference on randomized graphs.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  private def nodesDf(ids: Seq[Long]): DataFrame = {
    val s = spark
    import s.implicits._
    ids.toDF("node")
  }

  /** In-memory union-find ground truth: node → min id of its component. */
  private def unionFind(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    nodes.map(n => n -> find(n)).toMap
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a diameter-63 duplicate chain collapses to one component (where 3-round LP cannot)") {
    val nodes = (0L to 63L).toSeq
    val chain = nodes.init.map(i => (i, i + 1))
    val cc = labelsOf(Dedup.connectedComponents(nodesDf(nodes), pairsDf(chain)))
    assert(cc.values.toSet == Set(0L), "every chained node must label to the chain minimum")

    // the motivating gap: one-hop-per-round propagation moves labels at most
    // 3 hops in 3 rounds, so the same chain splinters into many "components"
    val lp = labelsOf(Dedup.labelPropagation(nodesDf(nodes), pairsDf(chain), rounds = 3))
    assert(lp.values.toSet.size > 1, "fixed-round LP should NOT converge on a deep chain")
  }

  test("matches a union-find reference on randomized graphs (incl. singletons)") {
    val rnd = new scala.util.Random(421)
    (1 to 5).foreach { trial =>
      val n = 40 + rnd.nextInt(60)
      val nodes = (0L until n.toLong).toSeq
      // random edge set over a SUBSET of nodes, leaving true singletons
      val nEdges = 20 + rnd.nextInt(80)
      val pairs = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(nodes, pairs)
      val got = labelsOf(Dedup.connectedComponents(nodesDf(nodes), pairsDf(pairs)))
      assert(got == expected, s"trial $trial (n=$n, e=${pairs.size})")
    }
  }

  test("already-converged star forests and empty pair sets are fixed points") {
    val nodes = (0L to 9L).toSeq
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L), (6L, 5L), (7L, 5L))
    val got = labelsOf(Dedup.connectedComponents(nodesDf(nodes), pairsDf(star)))
    assert(got == unionFind(nodes, star))

    val none = labelsOf(Dedup.connectedComponents(nodesDf(nodes), pairsDf(Seq.empty)))
    assert(none == nodes.map(i => i -> i).toMap, "no edges → every node is its own component")
  }

  test("dedupSurvivors(exact=true) agrees with converged LP on shallow clusters") {
    val s = spark
    import s.implicits._
    // two near-dup families + one unique doc
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (10L, "completely different content about spark partition shuffles here"),
      (11L, "completely different content about spark partition shuffles there"),
      (20L, "a singleton document with no duplicate partner in this corpus x")
    ).toDF("doc_id", "text")
    val exact = Dedup.dedupSurvivors(docs, "doc_id", "text", threshold = 0.3, exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val lp = Dedup.dedupSurvivors(docs, "doc_id", "text", threshold = 0.3, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(exact == lp, "shallow clusters: exact CC and converged LP must elect the same survivors")
    assert(exact.count(_._3) == 3, "three components → three survivors")
  }

  test("incremental components equal a full recompute, touching only affected components") {
    // corpus: components {0,1,2} (chain), {10,11}, {20} singleton, {30,31}
    val corpusNodes = Seq(0L, 1L, 2L, 10L, 11L, 20L, 30L, 31L)
    val corpusPairs = Seq((0L, 1L), (1L, 2L), (10L, 11L), (30L, 31L))
    val existing = Dedup.connectedComponents(nodesDf(corpusNodes), pairsDf(corpusPairs))
      .localCheckpoint()
    // batch: 5 bridges {0..2} and {10,11} into one component; 40 is a new
    // singleton; 15 attaches to the {30,31} component and undercuts its min
    val batchNodes = Seq(5L, 40L, 15L)
    val newPairs = Seq((5L, 2L), (5L, 10L), (15L, 31L))
    val inc = labelsOf(Dedup.incrementalComponents(existing,
      nodesDf(batchNodes), pairsDf(newPairs)))
    val full = unionFind(corpusNodes ++ batchNodes, corpusPairs ++ newPairs)
    assert(inc == full, "incremental must be indistinguishable from full recompute")
    assert(inc(5L) == 0L && inc(11L) == 0L, "bridged components take the overall min")
    assert(inc(30L) == 15L && inc(31L) == 15L, "a smaller batch id becomes the new root")
    assert(inc(20L) == 20L && inc(40L) == 40L, "untouched corpus + isolated batch stay singletons")
  }

  test("weighted sampling prefers heavy rows and composes across partitions") {
    val s = spark
    import s.implicits._
    // 2000 rows, half weight 9, half weight 1: a 500-draw without
    // replacement should be dominated by the heavy half (E[heavy] ≈ 450+)
    val rows = (0L until 2000L).map(i => (i, if (i < 1000) 9.0 else 1.0))
      .toDF("doc_id", "w")
    val sample = ops.Sampling.weightedSample(rows, "doc_id", col("w"), k = 500,
      salt = "t").localCheckpoint()
    assert(sample.count() == 500)
    val heavy = sample.filter(col("doc_id") < 1000).count()
    assert(heavy > 400, s"weight-9 rows must dominate the draw (got $heavy/500)")

    // composition: the global top-k is the re-ranked union of per-group
    // top-k (same keys) — the scale path for one global draw
    val global = sample.select("doc_id").collect().map(_.getLong(0)).toSet
    val perGroup = ops.Sampling.weightedSample(
      rows.withColumn("g", pmod(col("doc_id"), lit(4))), "doc_id", col("w"),
      k = 500, groupCols = Seq("g"), salt = "t")
    val recombined = perGroup.orderBy(col("es_key").desc, col("doc_id"))
      .limit(500).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(recombined == global, "per-partition draws must compose to the global draw")
  }

  test("leakage-safe split: every near-dup component lands in exactly one split") {
    val s = spark
    import s.implicits._
    // a duplicate CHAIN — the adversarial case: doc-id hashing would spray
    // these across splits, and fixed-round LP would splinter the component
    val docs = (0L to 40L).map { i =>
      (i, s"shared boilerplate body tail marker ${"x" * (i % 3).toInt} common suffix t$i t${i + 1}")
    }.toDF("doc_id", "text")
    val comp = Dedup.dedupSurvivors(docs, "doc_id", "text", threshold = 0.1, exact = true)
      .select(col("doc_id"), col("component"))
    val out = ops.Sampling.assignSplitBy(docs.join(comp, "doc_id"), col("component"),
      salt = "split")
    val violations = out.groupBy("component")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(violations == 0, "a component must never straddle splits")
    // and the split column is exhaustive over the configured names
    val names = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(names.subsetOf(Set("train", "val", "test")))
  }
}
