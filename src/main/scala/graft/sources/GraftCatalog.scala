package graft.sources

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL DDL surface: a V2 `TableCatalog` mapping identifiers to event-log
  * directories, so the log is a first-class SQL table —
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft
  *
  *   CREATE TABLE graft.ns.orders USING `graft-events`
  *     OPTIONS (numBuckets 64)                -- or LOCATION '/explicit/root'
  *   SELECT * FROM graft.ns.orders            -- claim-aware, bucket-pruned
  *   INSERT INTO graft.ns.orders SELECT ...   -- claim-fenced appendBulk
  *   CREATE TABLE graft.ns.copy USING `graft-events` AS SELECT ...  -- CTAS
  * }}}
  *
  * Needed because session-catalog `CREATE TABLE ... USING graft-events`
  * resolves through Spark's V1 file-source fallback: reads bypass the
  * facade's committed-file exclusion and bucket derivation entirely, and
  * inserts hit the raw-parquet write fence. Through this catalog, reads go
  * to [[GraftEventsTable]] (read-committed view, bucket directory pruning)
  * and `INSERT INTO` routes the V1Write fallback into
  * [[GraftWriteSupport.write]] — the same claim fencing and version minting
  * as native `EventLog` callers. Inserted rows are ingest-shaped
  * (`aggregate_id, aggregate_kind, kind, body, seq`); ids/versions are
  * minted by the log.
  *
  * The catalog is STATELESS: an identifier IS a directory under the
  * configured warehouse (`<warehouse>/<ns...>/<name>`), table existence IS
  * the `_graft_meta.json` marker [[GraftMeta]] maintains, and `LOCATION`
  * escapes the warehouse for logs that live elsewhere (recorded in a
  * `_graft_location` pointer file so the mapping survives restarts with no
  * metastore). At 100 TB there is nothing to migrate or keep consistent —
  * the filesystem is the catalog.
  */
/** Catalog-facing wrapper around [[GraftEventsTable]]. Deliberately NOT a
  * `FileTable`: the analyzer's `FallBackFileSourceV2` rule rewrites any
  * `INSERT INTO` a FileTable relation into the raw V1 file-write command
  * (which the read-only format refuses by design). Hiding the FileTable
  * type keeps SQL inserts on the V2 AppendData path, where the
  * V1_BATCH_WRITE capability routes them through the commit-protocol
  * delegate. All behavior delegates to the inner table.
  */
private[sources] class GraftSqlTable(inner: GraftEventsTable,
    root: Option[String] = None,
    sparkOpt: Option[SparkSession] = None)
  extends Table
  with org.apache.spark.sql.connector.catalog.SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite
  with org.apache.spark.sql.connector.catalog.TruncatableTable
  with org.apache.spark.sql.connector.catalog.SupportsDeleteV2 {
  override def name(): String = inner.name
  override def schema(): StructType = inner.schema
  override def columns(): Array[org.apache.spark.sql.connector.catalog.Column] =
    inner.columns()
  override def partitioning(): Array[Transform] = inner.partitioning()

  /** `DESCRIBE EXTENDED` surface: the log's operational stats ride the
    * table properties — layout (numBuckets, commit mode, declared
    * discriminator keys) plus [[graft.log.EventLog.stats]]'s file counts,
    * bytes and claim-chain state, the numbers a maintenance scheduler
    * watches. Computed LAZILY on first call (DESCRIBE / SHOW TBLPROPERTIES
    * consult properties(); scans go through newScanBuilder and never pay
    * the listing).
    */
  private lazy val opsProps: Map[String, String] =
    (root, sparkOpt) match {
      case (Some(r), Some(s)) =>
        try {
          val eventsDir = s"$r/events"
          val nb = GraftMeta.numBuckets(s, eventsDir)
          val chain = new Path(r, graft.log.ManifestCommitLog.CommitDir)
          val manifest = chain.getFileSystem(s.sessionState.newHadoopConf()).exists(chain)
          val mode = if (manifest) graft.log.CommitMode.Manifest else graft.log.CommitMode.Lock
          val log = new graft.log.EventLog(s, r, nb.getOrElse(32), commitMode = mode)
          val st = log.stats()
          Map(
            "graft.numBuckets" -> nb.fold("?")(_.toString),
            "graft.commitMode" -> (if (manifest) "manifest" else "lock"),
            "graft.discKeys" -> GraftMeta.discKeys(s, eventsDir).toSeq.sorted.mkString(","),
            "graft.events.files" -> st.eventFiles.toString,
            "graft.events.bytes" -> st.eventBytes.toString,
            "graft.events.maxFilesPerBucket" -> st.maxFilesPerBucket.toString,
            "graft.snapshots.files" -> st.snapshots.map(_.files).sum.toString,
            "graft.claims.pending" -> st.pendingClaims.toString,
            "graft.claims.done" -> st.doneClaims.toString,
            "graft.gc.replacedAwaiting" -> st.replacedAwaitingGc.toString)
        } catch { case scala.util.control.NonFatal(_) => Map.empty }
      case _ => Map.empty
    }

  override def properties(): util.Map[String, String] = {
    val m = new java.util.HashMap[String, String](inner.properties())
    opsProps.foreach { case (k, v) => m.put(k, v) }
    m
  }
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    inner.capabilities()
  override def newScanBuilder(options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    inner.newScanBuilder(options)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    inner.newWriteBuilder(info)

  // Row-level mutation verbs refuse BY NAME toward the sanctioned paths —
  // the log is append-only with three controlled mutations (SURVEY §1.4),
  // none of which is SQL DELETE/TRUNCATE.
  override def truncateTable(): Boolean =
    throw new UnsupportedOperationException(
      "graft-events is an append-only event log: TRUNCATE would destroy " +
        "history. DROP TABLE removes the log entirely; per-user redaction " +
        "is EventLog.forget (GDPR body scrub in place); schema evolution " +
        "is EventLog.migrate (copy-replace with revision fencing)")
  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean =
    true // reach deleteWhere so the refusal can name the sanctioned paths
  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    throw new UnsupportedOperationException(
      "graft-events is an append-only event log: rows are never deleted. " +
        "Use EventLog.forget for GDPR redaction (scrubs bodies in place, " +
        "keeps the stream's shape) or EventLog.migrate to copy-replace " +
        "events under a new revision; retention pruning is EventLog.prune")
}

class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  private def conf = spark.sessionState.newHadoopConf()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def warehouseDir(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$warehouse/", "/", "")

  /** A `LOCATION`-created table leaves a one-line pointer file in its
    * warehouse slot, so later sessions resolve the same identifier to the
    * same external root without any metastore.
    */
  private def pointerPath(ident: Identifier): Path =
    new Path(warehouseDir(ident), "_graft_location")

  private def rootOf(ident: Identifier): String = {
    val ptr = pointerPath(ident)
    val fs = ptr.getFileSystem(conf)
    if (fs.exists(ptr)) {
      val in = fs.open(ptr)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    } else warehouseDir(ident)
  }

  private def isLog(root: String): Boolean =
    GraftMeta.numBuckets(spark, s"$root/events").isDefined

  /** The envelope with every column nullable: minted columns (id, hash,
    * version, flags) are dropped and re-minted on write, so SQL INSERTs may
    * carry NULL placeholders for them without tripping writability checks.
    */
  private def relaxedEnvelope: StructType =
    StructType(graft.core.EventSchema.events.fields.map(_.copy(nullable = true)))

  private def eventsTable(ident: Identifier, root: String,
      declared: Option[StructType] = None): GraftSqlTable = {
    val eventsDir = s"$root/events"
    val hasFiles = {
      val p = new Path(eventsDir)
      val fs = p.getFileSystem(conf)
      fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("bucket="))
    }
    // CTAS resolves its AppendData against the schema createTable declared;
    // an empty (just-created) log has no parquet to infer from, so present
    // the canonical envelope. With files on disk, present envelope +
    // disc_* columns EXPLICITLY (inferred from data ∪ declared in the meta
    // marker): single-file footer inference could miss a disc column that
    // newer files carry, and an ALTER-declared key must read as null from
    // pre-ALTER files instead of being invisible until compaction.
    val schema = declared.orElse {
      if (!hasFiles) Some(relaxedEnvelope)
      else {
        val inferredDisc =
          try spark.read.parquet(eventsDir).schema.fields.toSeq
            .filter(_.name.toLowerCase.startsWith("disc_"))
          catch { case scala.util.control.NonFatal(_) => Seq.empty }
        val metaOnly = GraftMeta.discKeys(spark, eventsDir)
          .map(k => s"disc_$k") -- inferredDisc.map(_.name.toLowerCase)
        Some(StructType(relaxedEnvelope.fields ++ inferredDisc ++
          metaOnly.toSeq.sorted.map(org.apache.spark.sql.types.StructField(_,
            org.apache.spark.sql.types.StringType, nullable = true))))
      }
    }
    new GraftSqlTable(new GraftEventsTable(ident.toString, spark,
      CaseInsensitiveStringMap.empty(), Seq(eventsDir), schema),
      root = Some(root), sparkOpt = Some(spark))
  }

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    if (!isLog(root)) throw new NoSuchTableException(ident)
    eventsTable(ident, root)
  }

  override def tableExists(ident: Identifier): Boolean = isLog(rootOf(ident))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-events tables are bucketed by the log itself — PARTITIONED BY is not supported")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = {
      import scala.jdk.CollectionConverters._
      properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap
    }
    // DDL-declared columns would be ignored (the envelope is fixed and ids/
    // versions are minted) — refuse rather than surprise, except (CTAS)
    // ingest-shaped query output or anything carrying the envelope core
    // (e.g. `SELECT *` from another log, bucket column and all)
    val declared = Some(schema).filter(_.nonEmpty)
    declared.foreach { sch =>
      val names = sch.fieldNames.map(_.toLowerCase).toSet
      val core = Set("aggregate_id", "aggregate_kind", "kind", "body")
      val ok = core.subsetOf(names) &&
        (names.contains("seq") || names.contains("aggregate_version"))
      require(ok,
        s"graft-events DDL: either declare no columns, or (CTAS) rows carrying " +
          s"${core.mkString("(", ", ", ")")} plus a per-stream order column " +
          s"(seq or aggregate_version); got ${sch.fieldNames.mkString(", ")}")
    }
    // OPTIONS(...) surface as both bare and "option."-prefixed properties
    // depending on the DDL path — accept either
    def prop(k: String): Option[String] =
      props.get(k).orElse(props.get(s"option.$k"))
    val root = props.get(TableCatalog.PROP_LOCATION) match {
      case Some(loc) =>
        // LOCATION may point at an EXISTING log — that's the "register an
        // external log into the catalog" move, and the log's on-disk meta,
        // not the DDL, owns the physical layout: an unconditional
        // GraftMeta.write would keep the disk marker but force-cache the
        // DDL's numBuckets (default 32) for the whole session, and a wrong
        // modulus prunes point scans to the wrong bucket directory —
        // queries silently miss rows. Validate instead of clobbering.
        GraftMeta.numBuckets(spark, s"$loc/events").foreach { actual =>
          prop("numbuckets").map(_.toInt).filter(_ != actual).foreach { declared =>
            throw new IllegalArgumentException(
              s"graft-events: the log at $loc is bucketed with numBuckets=$actual; " +
                s"the DDL declared numBuckets=$declared. Re-issue without the " +
                "numBuckets option to adopt the existing layout (rebucketing is " +
                "EventLog.rebucket, not DDL)")
          }
        }
        val ptr = pointerPath(ident)
        val fs = ptr.getFileSystem(conf)
        val out = fs.create(ptr, false)
        try out.write(loc.getBytes("UTF-8")) finally out.close()
        loc
      case None => warehouseDir(ident)
    }
    val existing = GraftMeta.numBuckets(spark, s"$root/events")
    val numBuckets = existing.getOrElse(prop("numbuckets").getOrElse("32").toInt)
    val mode = prop("commitmode").map(_.toLowerCase) match {
      case Some("lock") => graft.log.CommitMode.Lock
      case _ => graft.log.CommitMode.Manifest // multi-writer-safe default
    }
    // initialize the empty log: the meta marker IS table existence, and the
    // EventLog constructor path is what native writers will discover. For an
    // adopted existing log this is a no-op on disk and caches the DISK value
    // (numBuckets above resolved from the meta, never the DDL default).
    GraftMeta.write(spark, s"$root/events", numBuckets)
    if (existing.isEmpty && mode == graft.log.CommitMode.Manifest) {
      // materialize the chain dir so GraftWriteSupport auto-detects the mode
      // (only for a FRESH log — an adopted one already chose its mode)
      val chain = new Path(root, graft.log.ManifestCommitLog.CommitDir)
      chain.getFileSystem(conf).mkdirs(chain): Unit
    }
    eventsTable(ident, root, declared)
  }

  /** The ONE legal ALTER: `ADD COLUMNS (disc_<key> STRING)` declares a
    * discriminator key (the reference's `WithDiscriminatorKeys` +
    * physical `ALTER TABLE ... ADD disc_<key>`,
    * store/postgresql/store.go:74-80,712-726). The key persists in the
    * meta marker, so subsequent INSERTs carrying `discriminator` map
    * entries materialize the column even before any row exists. Every
    * other change hits the fixed-envelope refusal.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = rootOf(ident)
    if (!isLog(root)) throw new NoSuchTableException(ident)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val legal = changes.nonEmpty && adds.size == changes.size && adds.forall { a =>
      a.fieldNames.length == 1 &&
        a.fieldNames()(0).toLowerCase.startsWith("disc_") &&
        a.dataType == org.apache.spark.sql.types.StringType
    }
    if (!legal) throw new UnsupportedOperationException(
      "graft-events tables have a fixed envelope — the only supported ALTER " +
        "is ADD COLUMNS (disc_<key> STRING), which declares a discriminator " +
        "key; body evolution is upcasters/EventLog.migrate, layout changes " +
        "are EventLog.rebucket")
    GraftMeta.addDiscKeys(spark, s"$root/events",
      adds.map(_.fieldNames()(0).toLowerCase.stripPrefix("disc_")).toSet)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val ptr = pointerPath(ident)
    val fs = ptr.getFileSystem(conf)
    val root = rootOf(ident)
    if (!isLog(root)) false
    else {
      val rp = new Path(root)
      rp.getFileSystem(conf).delete(rp, true)
      if (fs.exists(ptr)) fs.delete(ptr, true)
      GraftMeta.invalidate(s"$root/events") // drop the cached modulus too
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft-events: rename is a filesystem move — perform it with storage tooling")

  // ── CALL surface: fenced index-maintenance procedures ────────────────────
  // The same guarded Scala bodies (mutation fence, pending-build choke
  // point, batch-id guard), reachable from pure SQL; identifiers resolve by
  // NAME only — the procedure's path ARGUMENT names the index, not the
  // catalog namespace (indexes are directories, same as the log tables).
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    graft.ops.Procedures.load(ident.name())

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    graft.ops.Procedures.names.map(Identifier.of(namespace, _)).toArray

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((warehouse +: namespace).mkString("/"))
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter { n =>
        val id = Identifier.of(namespace, n)
        isLog(rootOf(id))
      }
      .map(Identifier.of(namespace, _))
  }

  // ── namespaces: directories under the warehouse ─────────────────────────
  override def listNamespaces(): Array[Array[String]] = {
    val dir = new Path(warehouse)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val dir = new Path((warehouse +: namespace).mkString("/"))
      val fs = dir.getFileSystem(conf)
      if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
      fs.listStatus(dir).filter(_.isDirectory)
        .map(s => namespace :+ s.getPath.getName)
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    val dir = new Path((warehouse +: namespace).mkString("/"))
    if (!dir.getFileSystem(conf).exists(dir)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val dir = new Path((warehouse +: namespace).mkString("/"))
    dir.getFileSystem(conf).mkdirs(dir): Unit
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = new Path((warehouse +: namespace).mkString("/"))
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) false
    else if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    else fs.delete(dir, true)
  }
}
