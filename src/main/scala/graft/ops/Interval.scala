package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: every (interval, point) pair of the
  * same key with `start <= ts <= end` — the "events inside a window"
  * shape (session × clicks, incident × telemetry, episode × purchases)
  * that a naive formulation executes as a broadcast-nested-loop or an
  * O(n·m) range join.
  *
  * Spark-first plan: time-bin bucketing. Each interval explodes into the
  * bins it covers (`⌈len/bin⌉+1` rows — 2 when the bin width matches the
  * interval length), each point maps to exactly ONE bin, and the join
  * becomes a plain equi-join on `(key, bin)` with the range predicate left
  * as a residual filter. Because a point has a single bin, a pair can match
  * at most once — no post-join dedup, no duplicate counting. Shuffle volume
  * is `O(intervals·bins_per_interval + points)`, AQE handles skewed bins,
  * and both sides remain partition-pruned scans — the plan that survives a
  * 100 TB telemetry table where a range join never finishes.
  */
object Interval {

  /** @param binMillis bucket width; choose ≈ the typical interval length so
    *                  intervals explode into ~2 bins. Correctness does not
    *                  depend on the choice — only shuffle volume does.
    */
  def intervalJoin(intervals: DataFrame, points: DataFrame, keys: Seq[String],
      startCol: String, endCol: String, tsCol: String,
      binMillis: Long): DataFrame = {
    require(binMillis > 0, "binMillis > 0")
    def bin(c: org.apache.spark.sql.Column) =
      floor(unix_millis(c).cast("double") / binMillis).cast("long")
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    val pt = points.withColumn("__bin", bin(col(tsCol)))
    iv.join(pt, keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }
}
