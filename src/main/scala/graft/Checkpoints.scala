package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.Bridge

/** Explicit lifetimes for `localCheckpoint()` block sets.
  *
  * A `localCheckpoint()` materializes its RDD into executor block storage
  * and truncates lineage; the blocks are freed by the ContextCleaner only
  * after a GC notices the frame is unreachable. In a long-lived driver
  * (streaming projectors, index-maintenance loops, a session issuing many
  * lifecycle ops) that is effectively "never": with a large heap GC runs
  * rarely, superseded block sets accumulate, and later work degrades into
  * eviction/GC churn (measured 6–7× at sf1). These helpers make the
  * release explicit at the points where the engine KNOWS a checkpointed
  * frame's consumers are done — no GC required.
  *
  * CONTRACT: a released frame must never execute again. A localCheckpoint
  * cannot recompute (its lineage is gone) — releasing a frame that a
  * still-lazy consumer references turns that consumer's next action into
  * a missing-block error. Scope these helpers around the LAST action that
  * consumes the frame.
  */
object Checkpoints {

  /** Checkpoint `df`, hand the materialized frame to `body`, release its
    * blocks on exit (including on exception). `body` must EXECUTE every
    * consumer of the frame before returning — returning a lazy frame that
    * still references it violates the contract above.
    */
  def withCheckpointed[A](df: DataFrame)(body: DataFrame => A): A = {
    val cp = df.localCheckpoint()
    try body(cp)
    finally Bridge.unpersistCheckpoint(cp)
  }

  /** Loop-iteration handoff: checkpoint `next` (an eager action — by the
    * time it returns, `prev` has been fully consumed by the round's plan),
    * then release `prev`'s blocks. The iterative-contraction shape
    * (connected components, k-means rounds) holds exactly one round's
    * frame in block storage instead of all of them.
    */
  def advance(prev: DataFrame, next: DataFrame): DataFrame = {
    val cp = next.localCheckpoint()
    Bridge.unpersistCheckpoint(prev)
    cp
  }

  /** Release the blocks behind every checkpointed frame in `frames`'
    * plans, for frames whose last consumer has already run. Walks each
    * frame's analyzed plan, so passing a PRE-checkpoint frame releases
    * the interior scratch checkpoints its builder created (the
    * screen-then-append micro-batch shape). No-op on frames without
    * checkpoints.
    */
  def release(frames: DataFrame*): Unit =
    frames.foreach(Bridge.unpersistCheckpoint)
}
