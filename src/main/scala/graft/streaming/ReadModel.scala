package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A durable projection read model over parquet: latest-row-per-key upsert
  * semantics (the reference's `UPDATE read_model SET …` inside the
  * projection handler, test/integration/projection_mock.go:62-106).
  *
  * Writes are append-only versioned rows (ULID-stamped); reads resolve the
  * latest version per key — the same latest-wins pattern as the checkpoint
  * store, so a projection handler inside `foreachBatch` stays idempotent
  * under micro-batch redelivery: re-appending the same batch changes no
  * resolved row. `compact()` rewrites to one row per key. On a table-format
  * deployment the append+resolve pair becomes a MERGE in the same commit as
  * the checkpoint save.
  */
class ReadModel(spark: SparkSession, path: String, keyCol: String) {

  private val gen = new graft.core.Ulid.Generator()

  // Hadoop-FS existence check so read models work off local disk (HDFS/S3) —
  // same pattern as EventLog's side IO; a bare java.io.File would silently
  // report "no data" for any non-local scheme.
  private def hasData: Boolean = {
    val (hp, fs) = fsOf
    fs.exists(hp) && parquetFiles(fs, hp).nonEmpty
  }

  /** Upsert a batch: every row in `batch` becomes the key's new state.
    *
    * `version` picks the concurrency contract:
    *  - `Some(v)` (a foreachBatch batchId, or the batch's max event
    *    position — anything monotone in stream order): the stamp is minted
    *    DETERMINISTICALLY from `v`, which makes merges exactly-once-
    *    equivalent under concurrent projector instances of one name —
    *    a redelivered batch re-appends content-identical rows (latest-wins
    *    resolves the same state), and a STALE instance replaying an older
    *    batch can never promote old state over new (stamps sort by `v`,
    *    not by arrival). This is the checkpoint store's order-neutrality
    *    applied to the model itself.
    *  - `None`: wall-clock ULID stamp; last writer wins by arrival. Scope:
    *    a single owning projector (the reference's projection ownership,
    *    worker/balance_workers.go) — two unversioned writers interleaving
    *    can reorder states.
    * One mode per read model: deterministic stamps share the ULID string
    * ordering, but mixing modes makes "latest" depend on wall clock again.
    */
  def merge(batch: DataFrame, version: Option[Long] = None): Unit = {
    require(batch.columns.contains(keyCol), s"batch must carry key column $keyCol")
    val stamp = version match {
      case Some(v) => graft.core.Ulid.timeOnly(v)
      case None => gen.next()
    }
    batch
      .withColumn("__rm_version", concat(lit(stamp), lit("-"), monotonically_increasing_id()))
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Current state: the latest row per key. */
  def current(): DataFrame = {
    val (hp, fs) = fsOf
    // a forget whose swap crashed mid-way leaves `_forget_swap` behind and
    // the root half-deleted — reading it would silently miss keys. Loud
    // refusal, naming the repair (the swap finishes FORWARD on the next
    // maintenance entry); readers must not run the recovery themselves,
    // maintenance is single-owner.
    if (fs.exists(hp) && fs.exists(swapMarker(hp)))
      throw new IllegalStateException(
        s"read model at $path: a forget crashed mid-swap — re-run forget() " +
          "or compact() (either finishes the swap forward) before reading")
    if (!hasData)
      throw new IllegalStateException(s"read model at $path has no data yet")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__rm_version").desc)
    spark.read.parquet(path)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__rm_version")
  }

  /** Drop superseded versions (same maintenance story as the log).
    *
    * Object-store-safe two-phase shape, mirroring the log's
    * compact-then-[[graft.log.EventLog.gcReplaced]]: the latest row per key
    * is RE-APPENDED keeping its ORIGINAL `__rm_version` stamp — a
    * concurrent reader that listed the directory before the append still
    * resolves every key from the old files; one that lists after sees both
    * copies, which are content-identical under latest-wins. Preserving the
    * stamp makes compaction order-NEUTRAL: it can never promote a stale
    * snapshot over a `merge` a rival writer landed after the snapshot was
    * listed (a fresh stamp would sort the stale copy on top and silently
    * roll the key back). Superseded files are only deleted once older than
    * `gcRetentionMs` (in-flight readers have drained by then); younger
    * leftovers are swept by the next compact. An in-place Overwrite would
    * instead open a read-after-delete window on any store where directory
    * replacement is not atomic (S3/HDFS).
    *
    * Writer scope: single owner (the owning projector, between its own
    * batches — the reference's projection owns its read model the same
    * way); stamp preservation de-fangs the races a violated scope used to
    * open.
    */
  // ── staged side-directory machinery (shared by forget/compact) ─────────
  // Both maintenance rewrites write their output to a hidden side directory
  // FIRST (Spark's file listing ignores `.`/`_`-prefixed names, so readers
  // never see it), then move the part files into the model root. The write
  // may read the source files lazily — they are untouched until the staged
  // copy is complete — so nothing needs to materialize in executor block
  // storage. The previous shape (`localCheckpoint()` then append) pinned the
  // ENTIRE surviving model in block storage, the exact corpus-sized-cache
  // pattern that OOM'd elsewhere at 5M docs; at a billion-key model the
  // staged write is the only shape that survives (the LshIndex.forget
  // staged-swap, applied to a loose-file table).

  private def fsOf = {
    val hp = new org.apache.hadoop.fs.Path(path)
    (hp, hp.getFileSystem(spark.sessionState.newHadoopConf()))
  }

  private def parquetFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] =
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Move every staged part file into the model root (names carry task
    * UUIDs, so they never collide with existing files), then drop the side
    * directory and its `_SUCCESS`/metadata leftovers.
    */
  private def adoptStaged(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      staged: org.apache.hadoop.fs.Path): Unit = {
    parquetFiles(fs, staged).foreach { s =>
      if (!fs.rename(s.getPath, new org.apache.hadoop.fs.Path(root, s.getPath.getName)))
        throw new java.io.IOException(
          s"read model staged adopt failed for ${s.getPath}")
    }
    fs.delete(staged, true): Unit
  }

  /** GDPR/forget for the PROJECTED state: remove (default) or scrub EVERY
    * stored version of the given keys — not just the latest-wins winner,
    * because superseded rows stay readable until compaction and "the user
    * asked to be deleted" must not mean "until the next compact".
    * `EventLog.forget` erases the source-of-truth bodies (and the index
    * family twins erase derived signatures/vectors), but a projection
    * materializes VALUES DERIVED from those bodies — the reference scrubs
    * its snapshots for exactly this reason (eventstore.go:405-432); a read
    * model is the same derived-state story one hop further.
    *
    *  - `scrub = None`: the keys' rows are REMOVED. The caller then
    *    re-projects those keys from the (already-forgotten) log if a
    *    post-scrub state should exist — replaying a scrubbed log rebuilds
    *    exactly the scrubbed state.
    *  - `scrub = Some(f)`: `f` rewrites the victim rows in place (e.g.
    *    nulling PII columns). It MUST preserve `keyCol` and
    *    `__rm_version` — stamps are what keep merges order-neutral, so a
    *    scrub that preserves them leaves checkpoint continuity untouched:
    *    the projector's tokens stay valid, later versioned merges still
    *    win, replayed old batches still lose.
    *
    * Copy-on-write: survivors + scrubbed victims are rewritten (original
    * stamps preserved) to a hidden staged directory, then swapped in under a
    * `_forget_swap` marker: marker minted AFTER the staged copy is complete,
    * old files deleted, staged files moved in, marker cleared. A crash
    * before the marker leaves the model untouched (stale staging is
    * overwritten by the next attempt); a crash after it is finished by the
    * next forget/compact/read-entry recovery (the staged copy IS the
    * post-forget truth). Unlike [[compact]] there is no retention grace,
    * because lingering victim bytes are the thing being erased. Writer
    * scope: single owner, maintenance cadence (the same not-reader-
    * concurrent contract as the log's forget). Returns the number of victim
    * rows removed or scrubbed.
    */
  def forget(keys: DataFrame,
      scrub: Option[DataFrame => DataFrame] = None): Long = {
    val (hp, fs) = fsOf
    if (!fs.exists(hp)) return 0L
    recoverSwap(fs, hp)
    val snapshot = parquetFiles(fs, hp)
    if (snapshot.isEmpty) return 0L
    // resolve the key column by NAME, never by position: a frame whose
    // first column merely coincides with valid key values would delete the
    // WRONG rows (and a filtered current() passed as keys would silently
    // match nothing) — the LshIndex.forget/forgetFromIvfIndex idCol contract
    val k = (if (keys.columns.contains(keyCol)) keys.select(col(keyCol))
      else {
        require(keys.columns.length == 1,
          s"keys frame must carry '$keyCol' or exactly one column of key " +
            s"values, got ${keys.columns.mkString(", ")}")
        keys.select(col(keys.columns.head).as(keyCol))
      }).distinct()
    val all = spark.read.parquet(snapshot.map(_.getPath.toString).toIndexedSeq: _*)
    val victims = all.join(broadcast(k), Seq(keyCol), "semi")
    val survivors = all.join(broadcast(k), Seq(keyCol), "anti")
    val total = all.count() // parquet-metadata count, no scan
    val n = victims.count()
    if (n == 0) return 0L
    val out = scrub match {
      case Some(f) =>
        val scrubbed = f(victims)
        require(scrubbed.columns.contains(keyCol) &&
          scrubbed.columns.contains("__rm_version"),
          s"scrub must preserve $keyCol and __rm_version (stamps carry the " +
            "merge order — dropping them would break checkpoint continuity)")
        survivors.unionByName(scrubbed)
      case None => survivors
    }
    // staged side-dir write: sources are read lazily but stay untouched
    // until the copy is complete — no model-sized materialization
    val staged = stagedDir(hp)
    out.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    // row conservation (ADVICE r13): a scrub that filters or deduplicates
    // would silently DROP stored versions while forget reports them
    // scrubbed — the staged copy must hold exactly (total − n) removed or
    // `total` scrubbed rows; counted from the staged files, never recomputed
    val written = spark.read.parquet(staged.toString).count()
    val expect = if (scrub.isDefined) total else total - n
    if (written != expect) {
      fs.delete(staged, true): Unit
      throw new IllegalStateException(
        s"read model forget at $path: staged rewrite holds $written rows, " +
          s"expected $expect ($total stored, $n victims) — the scrub " +
          "function must rewrite victim rows 1:1, never filter or " +
          "deduplicate them; the model is untouched")
    }
    // swap: marker → delete old → adopt staged → clear marker. The marker
    // NAMES the old files (written via tmp+rename so it is never partial),
    // which is what lets a mid-swap crash finish FORWARD deterministically:
    // recovery deletes exactly the named files (idempotent — adopted part
    // files have fresh task-UUID names and can never match) and adopts
    // whatever staged files remain.
    writeSwapMarker(fs, hp, snapshot.map(_.getPath.getName))
    snapshot.foreach(s => fs.delete(s.getPath, false): Unit)
    adoptStaged(fs, hp, staged)
    fs.delete(swapMarker(hp), false): Unit
    n
  }

  private def writeSwapMarker(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, oldNames: Seq[String]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(root,
      s"._forget_swap.tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(oldNames.mkString("\n").getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, swapMarker(root)))
      throw new java.io.IOException(s"read model swap-marker rename failed at $root")
  }

  private def stagedDir(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, ".staged_rewrite")
  private def swapMarker(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_forget_swap")

  /** Finish a forget whose swap crashed mid-way: the marker is minted only
    * once the staged copy is COMPLETE, so with it present the staged files
    * are the post-forget truth — delete exactly the OLD files the marker
    * names (never the freshly adopted ones) and adopt whatever staged files
    * remain; every step is idempotent. Without the marker, a stale staged
    * dir is a pre-swap crash: the model is intact and the next rewrite
    * simply overwrites the leftovers.
    */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    val marker = swapMarker(root)
    if (!fs.exists(marker)) return
    val in = fs.open(marker)
    val oldNames = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.split("\n").filter(_.nonEmpty) finally in.close()
    oldNames.foreach(nm =>
      fs.delete(new org.apache.hadoop.fs.Path(root, nm), false): Unit)
    adoptStaged(fs, root, stagedDir(root))
    fs.delete(marker, false): Unit
  }

  def compact(gcRetentionMs: Long = 10 * 60 * 1000L): Unit = {
    val (hp, fs) = fsOf
    if (!fs.exists(hp)) return
    recoverSwap(fs, hp)
    val snapshot = parquetFiles(fs, hp)
    if (snapshot.isEmpty) return
    val latest = {
      val w = Window.partitionBy(col(keyCol)).orderBy(col("__rm_version").desc)
      spark.read.parquet(snapshot.map(_.getPath.toString).toIndexedSeq: _*)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
    // staged side-dir write (sources read lazily, untouched until the copy
    // completes — no model-sized localCheckpoint), then MOVE the part files
    // in: append semantics, so no swap marker is needed — a crash after a
    // partial adoption leaves content-identical duplicates latest-wins
    // already tolerates, and the old files survive until the retention
    // delete below, which runs last
    val staged = stagedDir(hp)
    latest.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    adoptStaged(fs, hp, staged)
    val horizon = System.currentTimeMillis() - gcRetentionMs
    snapshot.filter(_.getModificationTime < horizon)
      .foreach(s => fs.delete(s.getPath, false): Unit)
  }
}
