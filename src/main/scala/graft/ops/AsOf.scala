package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the latest right row of
  * the same key with `rightTs <= leftTs` — the kdb `aj` / pandas
  * `merge_asof` shape, and the generalization of this engine's
  * snapshot-stitch (j3) and as-of state reads (a8).
  *
  * Spark-first plan: instead of a range join (which Catalyst would execute
  * as a broadcast-nested-loop or an exploding interval join), tag both
  * sides, UNION them, and carry the last right payload forward inside one
  * `(key, ts)` sorted window — ONE shuffle on the key, linear work,
  * spill-safe. Ties at equal ts resolve right-before-left (the `side`
  * column sorts 0 before 1), matching the `<=` bound; multiple right rows
  * on one timestamp resolve to the highest `rightOrd` — every ordering
  * input is explicit, so results are deterministic and oracle-checkable.
  */
object AsOf {

  /** @param valueCols right columns to carry (exposed as `asof_<name>`,
    *                   NULL when no right row precedes the left row)
    * @param rightOrd  deterministic tie-breaker among right rows sharing a
    *                  timestamp (e.g. an event id)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      rightOrd: String): DataFrame = {
    val payload = struct(valueCols.map(right(_)) :+ right(rightOrd).as("__ord"): _*)
    val l = left.select(
      left(key).as("__k"), left(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast("string").as("__ordkey"),
      lit(null).cast(org.apache.spark.sql.graftbridge.Bridge.expression(payload)
        .dataType.sql).as("__rv"),
      struct(left.columns.map(left(_)): _*).as("__lrow"))
    val r = right.select(
      right(key).as("__k"), right(rightTs).as("__ts"), lit(0).as("__side"),
      right(rightOrd).cast("string").as("__ordkey"),
      payload.as("__rv"),
      lit(null).cast(l.schema("__lrow").dataType.sql).as("__lrow"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__ordkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val leftCols = left.columns.map(c => col(s"__lrow.$c").as(c))
    val rightOut = valueCols.map(c => col(s"__asof.$c").as(s"asof_$c"))
    carried.select(leftCols ++ rightOut: _*)
  }
}
