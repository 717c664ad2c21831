package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, coordination-free sampling for training-data pipelines.
  *
  * Everything keys off a stable hash bucket of the row id — NOT `rand()` —
  * because at 100 TB the properties that matter are reproducibility (the
  * same sample on every re-run, resubmit, and engine), stability under
  * repartitioning (no dependence on row order or task count), and
  * consistency across tables (the same id lands in the same split
  * everywhere, so features and labels never straddle train/test). Plain
  * `sample()` guarantees none of these.
  *
  * The bucket hash is `TextAnalysis.tokenHash32` (md5-derived), so every
  * decision here is reproducible in any engine with md5 — the DuckDB oracle
  * checks the sampled/split row sets bit-for-bit (x3/x4).
  */
object Sampling {

  /** Stable bucket in `[0, granularity)` for an id (salted: different salts
    * give independent samples).
    */
  def hashBucket(id: Column, salt: String = "", granularity: Int = 10000): Column =
    pmod(TextAnalysis.tokenHash32(concat(lit(salt), id.cast("string"))), lit(granularity))

  /** Keep ~`rate` of rows, deterministically by id hash. A row's fate
    * depends only on (salt, id): re-runs, retries, and other tables agree.
    */
  def hashSample(df: DataFrame, idCol: String, rate: Double, salt: String = "",
      granularity: Int = 10000): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate in [0,1]")
    df.filter(hashBucket(col(idCol), salt, granularity) <
      math.round(rate * granularity).toInt)
  }

  /** Stratified deterministic sampling: per-stratum keep rates (e.g. down-
    * sample boilerplate-heavy sources, keep rare ones whole) — the data-
    * mixture primitive. Strata not in `rates` keep `defaultRate`.
    */
  def hashSampleBy(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "", granularity: Int = 10000): DataFrame = {
    val threshold = rates.foldLeft(
      lit(math.round(defaultRate * granularity).toInt)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, math.round(r * granularity).toInt).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt, granularity) < threshold)
  }

  /** Assign every row to a named split (train/val/test…) by cumulative
    * weight ranges over the id-hash bucket. Deterministic and
    * cross-table-consistent: any table hashing the same id gets the same
    * split, so joins never leak across the boundary.
    */
  def assignSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      salt: String = "", granularity: Int = 10000): DataFrame =
    assignSplitBy(df, col(idCol), weights, salt, granularity)

  /** [[assignSplit]] over an arbitrary key expression. The key is the
    * leakage unit: whatever shares a key value lands in one split. Hashing
    * the near-dup COMPONENT id instead of the row id is how a pipeline keeps
    * duplicate families from straddling the train/test boundary (near-
    * identical docs on both sides = memorization measured as generalization)
    * — see the `x9_leakage_safe_split` query for the composed form.
    */
  def assignSplitBy(df: DataFrame, key: Column,
      weights: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      salt: String = "", granularity: Int = 10000): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val bucket = hashBucket(key, salt, granularity)
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * granularity).toInt)
    val expr = weights.map(_._1).zip(cuts).reverse
      .foldLeft(lit(weights.last._1)) { case (acc, (name, cut)) =>
        when(bucket < cut, name).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): every row draws a hash-uniform u ∈ (0,1) from
    * (salt, id) and ranks by `ln(u)/w` — the log-monotone form of the
    * paper's u^(1/w) key — so the per-group top-k by key is distributed
    * exactly as k weighted draws without replacement. The quality-weighted
    * selection step of mixture pipelines ("keep the best-ish k per source,
    * but stochastically, so the tail still contributes"), with the same
    * contract as everything here: (salt, id) decides, so re-runs, retries
    * and engines agree.
    *
    * The key is rounded to 6 decimals with an id tie-break, so libm ulp
    * differences between engines cannot reorder the sample (the d8/e1
    * float-parity discipline). Weights are clamped to ≥ 1e-9: a zero-weight
    * row gets a vanishingly negative key (never sampled while any positive-
    * weight row remains) instead of dividing by zero.
    *
    * Scale shape: the key is a pure projection; ranking is one window
    * shuffle on `groupCols`. With NO groups the window is a single ordered
    * task — fine for driver-sized k, but partition at scale (per-source /
    * per-shard draws compose: a weighted sample of weighted samples with
    * the same keys is the global weighted sample, so union the per-group
    * top-k and re-rank when one global draw is needed).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
      groupCols: Seq[String] = Nil, salt: String = ""): DataFrame = {
    require(k >= 1, "weightedSample needs k >= 1")
    import org.apache.spark.sql.expressions.Window
    val u = (TextAnalysis.tokenHash32(concat(lit(salt), col(idCol).cast("string")))
      + lit(0.5)) / lit(4294967296.0)
    val key = round(log(u) / greatest(weight, lit(1e-9)), 6)
    val w0 = if (groupCols.isEmpty) Window.orderBy(col("es_key").desc, col(idCol))
      else Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col("es_key").desc, col(idCol))
    df.withColumn("es_key", key)
      .withColumn("es_rank", row_number().over(w0).cast("long"))
      .filter(col("es_rank") <= k)
  }

  /** Cap rows per key (the per-domain contribution cap of web-crawl
    * pipelines: no single site may dominate the mixture). Keeps the `cap`
    * rows whose salted id-hash ranks lowest within the key — a deterministic
    * uniform choice, reproducible across runs and engines, unlike
    * order-dependent `limit` per group. Adds the rank as `cap_rank`.
    *
    * Scale shape: one shuffle by key. Rank-then-filter means a hot key's
    * rows DO shuffle before being cut; when one key holds a double-digit
    * share of all rows, pre-filter with a cheap bound (e.g. `hashSample`
    * at ~10·cap/keyCount) before ranking — the deterministic hash makes the
    * two-stage result identical to the one-stage one.
    */
  def capPerKey(df: DataFrame, idCol: String, keyCol: String, cap: Int,
      salt: String = "", granularity: Int = 1000000): DataFrame = {
    require(cap >= 1, "cap >= 1")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(hashBucket(col(idCol), salt, granularity), col(idCol))
    df.withColumn("cap_rank", row_number().over(w).cast("long"))
      .filter(col("cap_rank") <= cap)
  }

  /** Temperature-weighted domain mixture sampling to a global token budget —
    * the multi-corpus data-mixing primitive (the α-smoothed sampling of
    * multilingual/multi-source training sets, cf. the exponent-smoothed
    * mixtures in XLM-R / T5): domain d gets weight T_d^α / Σ T^α over its
    * total token count, a keep-rate `min(1, budget·w_d / T_d)`, and rows
    * are then kept deterministically by id hash. α < 1 flattens the mixture
    * (up-samples rare domains, down-samples dominant ones); α = 1 is
    * proportional; α = 0 is uniform-per-domain. α = 0.5 computes via
    * `sqrt` (correctly rounded IEEE, engine-portable for the oracle);
    * other α use `pow`.
    *
    * Returns the SELECTED rows: id, key, `n_tok`, and the domain's keep
    * `rate` (rounded). Scale shape: one map-side-combined agg to
    * domain-count-sized stats, a single-row total agg, a broadcast join of
    * the tiny rate table back onto the corpus, and a per-row hash filter —
    * nothing corpus-sized ever shuffles, and the sample is repartition- and
    * rerun-stable like everything else here.
    */
  def mixtureSample(df: DataFrame, idCol: String, keyCol: String, tokCol: Column,
      budgetTokens: Long, alpha: Double = 0.5, salt: String = "",
      granularity: Int = 1000000): DataFrame = {
    require(budgetTokens > 0, "budgetTokens > 0")
    require(alpha >= 0 && alpha <= 1, "alpha in [0,1]")
    val base = df.select(col(idCol), col(keyCol), tokCol.cast("long").as("__tok"))
    val stats = base.groupBy(col(keyCol)).agg(sum(col("__tok")).as("__T"))
      .withColumn("__wn",
        if (alpha == 0.5) sqrt(col("__T")) else pow(col("__T"), lit(alpha)))
    val total = stats.agg(sum(col("__wn")).as("__wsum"))
    val rates = stats.crossJoin(broadcast(total))
      .select(col(keyCol),
        least(lit(1.0),
          lit(budgetTokens.toDouble) * col("__wn") / col("__wsum") / col("__T"))
          .as("__rate"))
    base.join(broadcast(rates), Seq(keyCol))
      .filter(hashBucket(col(idCol), salt, granularity) <
        col("__rate") * granularity)
      .select(col(idCol), col(keyCol), col("__tok").as("n_tok"),
        round(col("__rate"), 6).as("rate"))
  }
}
