package graft

import graft.plans.GraftBucketPruning
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session-builder extension point:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  * }}}
  *
  * injects the bucket-pruning optimizer rule into the main operator-
  * optimization batch (so it composes with predicate pushdown in the same
  * fixpoint) — the zero-code-change way to make ANY Spark job reading a
  * graft log get point-scan pruning.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(GraftBucketPruning.apply)
  }
}

/** Programmatic enablement for an already-built session (e.g. notebooks):
  * registers the engine's SQL functions and appends the bucket-pruning rule
  * to `spark.experimental.extraOptimizations` (a late optimizer batch —
  * pruning still applies, because FileSourceStrategy re-derives partition
  * filters at physical planning).
  */
object Graft {
  def enable(spark: SparkSession): Unit = {
    functions.registerAll(spark)
    val already = spark.experimental.extraOptimizations.exists {
      case GraftBucketPruning(s) => s eq spark
      case _ => false
    }
    if (!already) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftBucketPruning(spark)
    }
  }
}
