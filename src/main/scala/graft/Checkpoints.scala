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
  * OWNERSHIP: [[release]] may be handed a COMPOSITE frame (e.g. screen
  * verdicts) and walks its plan to free the scratch checkpoints the engine
  * created while building it — but a caller's own `localCheckpoint()`ed
  * input can be embedded in the same plan, and freeing it would turn the
  * caller's next use into an unrecoverable missing-block error (a
  * localCheckpoint cannot recompute; its lineage is gone). So the engine
  * registers every checkpoint it mints (all engine code routes through
  * [[checkpoint]] / the `.checkpointOwned()` syntax) and [[release]] frees
  * ONLY registered ids: frames checkpointed outside this object survive
  * any release walk untouched.
  *
  * CONTRACT: a released frame must never execute again. Scope these
  * helpers around the LAST action that consumes the frame.
  */
object Checkpoints {

  /** Ids of the engine-minted checkpoint RDDs that are still live.
    * Entries are removed as [[release]] frees them; an engine checkpoint
    * that is never released (a bench query body's scratch) leaves one
    * boxed Int behind for the session's lifetime — negligible next to the
    * blocks themselves, which the ContextCleaner still reclaims on GC
    * exactly as before.
    */
  private val owned = java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()

  /** `ds.localCheckpoint()` plus ownership registration — the form ALL
    * engine code uses (via [[Ownable.checkpointOwned]]), so a later
    * [[release]] walk may free it.
    */
  def checkpoint[T](ds: org.apache.spark.sql.Dataset[T])
      : org.apache.spark.sql.Dataset[T] = {
    val cp = ds.localCheckpoint()
    Bridge.checkpointRddIds(cp.toDF()).foreach(id => owned.add(Int.box(id)): Unit)
    cp
  }

  /** Engine-side syntax: `frame.checkpointOwned()` reads like
    * `localCheckpoint()` at ~50 call sites while routing through the
    * ownership registry.
    */
  implicit class Ownable[T](private val ds: org.apache.spark.sql.Dataset[T])
      extends AnyVal {
    def checkpointOwned(): org.apache.spark.sql.Dataset[T] =
      Checkpoints.checkpoint(ds)
  }

  /** Checkpoint `df`, hand the materialized frame to `body`, release its
    * blocks on exit (including on exception). `body` must EXECUTE every
    * consumer of the frame before returning — returning a lazy frame that
    * still references it violates the contract above.
    */
  def withCheckpointed[A](df: DataFrame)(body: DataFrame => A): A = {
    val cp = checkpoint(df)
    try body(cp)
    finally release(cp)
  }

  /** Loop-iteration handoff: checkpoint `next` (an eager action — by the
    * time it returns, `prev` has been fully consumed by the round's plan),
    * then release `prev`'s blocks. The iterative-contraction shape
    * (connected components, k-means rounds) holds exactly one round's
    * frame in block storage instead of all of them.
    */
  def advance(prev: DataFrame, next: DataFrame): DataFrame = {
    val cp = checkpoint(next)
    release(prev)
    cp
  }

  /** Release the ENGINE-OWNED checkpoint blocks reachable from each
    * frame's plan, for frames whose last consumer has already run. Walks
    * each frame's analyzed plan, so passing a composite result frame
    * (screen verdicts, component labels) releases the interior scratch
    * checkpoints its builder created — while a caller's own
    * `localCheckpoint()`ed input embedded in the same plan is NOT owned
    * and survives. No-op on frames without owned checkpoints.
    */
  def release(frames: DataFrame*): Unit =
    frames.foreach(Bridge.unpersistOwned(_, owned))
}
