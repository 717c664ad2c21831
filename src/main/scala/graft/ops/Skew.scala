package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations over hot keys.
  *
  * Spark's hash aggregate already combines map-side, so a plain algebraic
  * `groupBy(key).agg(...)` rarely skews — each partition pre-reduces its
  * slice of the hot key before the exchange. The salted two-phase shape
  * matters when the per-key STATE is large (collect-style, distinct-count,
  * large sketches) or when a single reducer would still receive an outsized
  * combine load: salting fans one hot key's partials across `salts`
  * reducers, and a second cheap pass combines the per-salt results.
  *
  * Reference context: the reference balances hot partitions across workers
  * (worker/balance_workers.go); in Spark the analogous pressure point is the
  * reducer for a hot group key.
  */
object Skew {

  /** Two-phase salted count+sum: exactly equal to the plain aggregate for
    * these algebraic measures (property-tested), while bounding any single
    * reducer's input to ~1/`salts` of a hot key.
    *
    * `saltExpr` must be deterministic per row (e.g. `pmod(col("user_id"),
    * lit(salts))`) — a `rand()`-based salt would break retry idempotence
    * on task re-execution (speculation, fetch-failure replays).
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      saltExpr: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(saltExpr, lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).cast("long").as("n_rows"), sum(col("__s")).as("total"))
}
