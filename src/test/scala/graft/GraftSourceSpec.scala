package graft

import graft.log.{AppendRecord, EventDetail, EventLog}
import graft.sources.GraftBucketDerivation
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 facade (`spark.read.format("graft-events")`) and the V1
  * bucket-pruning optimizer rule: external readers must get the layout's
  * point-scan pruning without knowing the layout.
  */
class GraftSourceSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graftsource").toFile.getAbsolutePath
    val log = new EventLog(spark, dir, numBuckets = 8, ulidSeed = Some(11L))
    (1 to 40).foreach { i =>
      log.append(Seq(AppendRecord(s"acct-$i", "Account", 0, Map.empty,
        Seq(EventDetail("Created", s"""{"owner":"o$i"}"""),
          EventDetail("Deposited", """{"amount":5}""")))))
    }
    dir
  }
  private lazy val log = new EventLog(spark, root, numBuckets = 8)

  private def facade = spark.read.format("graft-events").load(root)

  /** The files the scan node actually selects after partition pruning —
    * `df.inputFiles` would list the whole relation and prove nothing.
    */
  private def prunedFiles(df: DataFrame): Seq[String] =
    stripAqe(df.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files.map(_.getPath.toString)).toSeq
      case b: BatchScanExec => b.scan match {
        case fs: FileScan =>
          fs.fileIndex.listFiles(fs.partitionFilters, fs.dataFilters)
            .flatMap(_.files.map(_.getPath.toString)).toSeq
        case other => fail(s"unexpected scan: $other")
      }
    }.getOrElse(fail(s"no scan node in:\n${df.queryExecution.executedPlan}"))

  private def stripAqe(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => stripAqe(a.executedPlan)
      case other => other
    }

  test("facade reads the whole log with the layout's schema") {
    assert(facade.count() === 80L)
    assert(facade.columns.contains("bucket"), "partition column surfaces")
    val cols = log.eventsWithBucket.columns
    val viaLog = log.eventsWithBucket.select(cols.map(col): _*).orderBy("id").collect().toSeq
    val viaFacade = facade.select(cols.map(col): _*).orderBy("id").collect().toSeq
    assert(viaFacade === viaLog)
  }

  test("facade point scan matches streamEvents and prunes to one bucket directory") {
    val filtered = facade.filter(col("aggregate_id") === "acct-7" && col("migration") === 0)
      .drop("bucket")
    assert(filtered.orderBy("aggregate_version").collect().map(_.getString(0)).toSeq ===
      log.streamEvents("acct-7").collect().map(_.getString(0)).toSeq)
    val b = GraftBucketDerivation.bucketFor("acct-7", 8)
    val files = prunedFiles(filtered)
    assert(files.nonEmpty && files.forall(_.contains(s"bucket=$b")),
      s"scan listed beyond bucket=$b:\n${files.mkString("\n")}")
  }

  test("facade IN-list scan prunes to the union of buckets") {
    val ids = Seq("acct-3", "acct-19", "acct-31")
    val bs = ids.map(GraftBucketDerivation.bucketFor(_, 8)).toSet
    assert(bs.size < 8, "fixture should not cover every bucket")
    val df = facade.filter(col("aggregate_id").isin(ids: _*))
    assert(df.count() === 6L)
    val files = prunedFiles(df)
    assert(files.nonEmpty && files.forall(f => bs.exists(b => f.contains(s"bucket=$b"))),
      s"scan listed beyond $bs:\n${files.mkString("\n")}")
  }

  test("facade append routes through the commit protocol: claim in the chain, versions minted") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftsrcwrite").toFile.getAbsolutePath
    val mlog = new EventLog(s, dir, numBuckets = 4, ulidSeed = Some(43L),
      commitMode = graft.log.CommitMode.Manifest)
    mlog.append(Seq(AppendRecord("wx-a", "Account", 0, Map.empty,
      Seq(EventDetail("Created", """{"owner":"a"}""")))))
    // an EXTERNAL Spark job appends ingest-shaped rows through the facade:
    // wx-a continues from version 1, wx-b is new — versions/ids are minted
    Seq(("wx-a", "Account", "Deposited", """{"amount":5}""", 1L),
        ("wx-b", "Account", "Created", """{"owner":"b"}""", 1L),
        ("wx-b", "Account", "Deposited", """{"amount":7}""", 2L))
      .toDF("aggregate_id", "aggregate_kind", "kind", "body", "seq")
      .write.format("graft-events").mode("append").save(dir)
    val versions = mlog.events.groupBy(col("aggregate_id"))
      .agg(max(col("aggregate_version")).as("v"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(versions === Map("wx-a" -> 2, "wx-b" -> 2))
    // the write left a DONE claim on the chain (commit-fenced, not raw parquet)
    val claims = new graft.log.ManifestCommitLog(s, dir).claims()
    assert(claims.size === 2 && claims.forall(_.done),
      s"facade append must claim-fence: $claims")
    // and the facade read-committed view sees exactly the committed rows
    assert(spark.read.format("graft-events").load(dir).count() === 4L)
  }

  test("facade ErrorIfExists bootstraps a new log via bulkImport") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graftsrcimport").toFile.getAbsolutePath
    Seq(("im-1", "Account", "Created", "{}", 1L),
        ("im-1", "Account", "Deposited", "{}", 2L))
      .toDF("aggregate_id", "aggregate_kind", "kind", "body", "seq")
      .write.format("graft-events").option("numBuckets", "4").save(dir)
    val got = new EventLog(s, dir, numBuckets = 4).streamEvents("im-1")
      .select("aggregate_version", "kind").orderBy("aggregate_version")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "Created"), (2, "Deposited")))
    // re-importing the same streams violates all-new and fails
    intercept[graft.log.ConcurrentModificationException] {
      Seq(("im-1", "Account", "Created", "{}", 1L))
        .toDF("aggregate_id", "aggregate_kind", "kind", "body", "seq")
        .write.format("graft-events").mode("error").save(dir)
    }
  }

  test("facade refuses destructive or raw writes") {
    val s = spark
    import s.implicits._
    val rows = Seq(("ow-1", "Account", "Created", "{}", 1L))
      .toDF("aggregate_id", "aggregate_kind", "kind", "body", "seq")
    val e = intercept[Exception] {
      rows.write.format("graft-events").mode("overwrite").save(root)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("destructive")), e.toString)
    // input with neither a seq column nor the envelope's version column is
    // rejected before anything touches the log (envelope-shaped frames are
    // LEGAL since the SQL surface landed: aggregate_version orders them)
    val e2 = intercept[Exception] {
      facade.limit(1).drop("aggregate_version")
        .write.format("graft-events").mode("append").save(root)
    }
    assert(messages(e2).exists(_.contains("order column")), e2.toString)
  }

  test("snapshots table is addressable via option") {
    val snapRoot = Files.createTempDirectory("graftsnap").toFile.getAbsolutePath
    val snapLog = new EventLog(spark, snapRoot, numBuckets = 4, ulidSeed = Some(12L))
    snapLog.append(Seq(AppendRecord("s-1", "Account", 0, Map.empty,
      Seq(EventDetail("Created", "{}")))))
    snapLog.saveSnapshot(graft.core.SnapshotRow("01HXSNAP00000000000000001", "s-1",
      1, "Account", "{\"balance\":1}", new java.sql.Timestamp(0L), Map.empty))
    val snapDf = spark.read.format("graft-events")
      .option("table", "snapshots").load(snapRoot)
    assert(snapDf.count() === 1L)
    assert(snapDf.select("aggregate_id").head().getString(0) === "s-1")
  }

  test("V1 rule: plain parquet reads through EventLog prune on derived bucket filters") {
    Graft.enable(spark)
    val df = log.events.filter(col("aggregate_id") === "acct-23")
    assert(df.count() === 2L)
    val b = GraftBucketDerivation.bucketFor("acct-23", 8)
    val files = prunedFiles(df)
    assert(files.nonEmpty && files.forall(_.contains(s"bucket=$b")),
      s"V1 scan listed beyond bucket=$b:\n${files.mkString("\n")}")
  }

  test("V1 rule leaves non-graft parquet tables alone") {
    Graft.enable(spark)
    val plain = Files.createTempDirectory("plainpq").toFile.getAbsolutePath + "/t"
    spark.range(10).withColumn("aggregate_id", concat(lit("a-"), col("id")))
      .withColumn("bucket", (col("id") % 2).cast("int"))
      .write.partitionBy("bucket").parquet(plain)
    val df = spark.read.parquet(plain).filter(col("aggregate_id") === "a-3")
    assert(df.count() === 1L)
    // without the marker nothing is derived: both bucket dirs stay listed
    val files = prunedFiles(df)
    assert(files.exists(_.contains("bucket=0")) && files.exists(_.contains("bucket=1")))
  }

  test("facade is read-committed on manifest logs (raw view on request)") {
    val dir = Files.createTempDirectory("graftsrcmanifest").toFile.getAbsolutePath
    val mlog = new graft.log.EventLog(spark, dir, numBuckets = 4,
      ulidSeed = Some(41L), commitMode = graft.log.CommitMode.Manifest)
    mlog.append(Seq(graft.log.AppendRecord("fm-a", "Account", 0, Map.empty,
      Seq(graft.log.EventDetail("Created", "{}")))))
    mlog.append(Seq(graft.log.AppendRecord("fm-b", "Account", 0, Map.empty,
      Seq(graft.log.EventDetail("Created", "{}")))))
    // simulate an in-flight writer: drop claim 2's done marker
    assert(new java.io.File(s"$dir/${graft.log.ManifestCommitLog.CommitDir}/v2.done").delete())
    val committed = spark.read.format("graft-events").load(dir)
    assert(committed.count() === 1L, "pending claim files must be hidden")
    val raw = spark.read.format("graft-events").option("committed", "false").load(dir)
    assert(raw.count() === 2L, "raw view on request")
  }

  test("SQL DDL surface: CREATE/INSERT/CTAS/DROP through the graft catalog, claim-fenced") {
    val s = spark
    val wh = Files.createTempDirectory("graftwh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.graftsql", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graftsql.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE graftsql.ns")
      s.sql("CREATE TABLE graftsql.ns.orders USING `graft-events` OPTIONS (numBuckets 4)")
      assert(s.sql("SELECT count(*) FROM graftsql.ns.orders").collect()(0).getLong(0) === 0L)

      // ingest via column list: minted columns stay NULL placeholders,
      // aggregate_version doubles as the per-stream order column
      s.sql(
        """INSERT INTO graftsql.ns.orders
          |  (aggregate_id, aggregate_kind, kind, body, aggregate_version)
          |SELECT concat('s', id), 'User', 'Evt',
          |       to_json(named_struct('i', id)), 1
          |FROM range(20)""".stripMargin)
      assert(s.sql("SELECT count(*) FROM graftsql.ns.orders").collect()(0).getLong(0) === 20L)
      // ids/versions were MINTED by the log, not taken from the insert
      val minted = s.sql(
        "SELECT id, aggregate_version FROM graftsql.ns.orders WHERE aggregate_id = 's3'").collect()
      assert(minted.length === 1 && minted(0).getString(0).length === 26 &&
        minted(0).getInt(1) === 1)

      // the write went through the commit protocol: a claim in the chain
      val chain = new graft.log.ManifestCommitLog(s, s"$wh/ns/orders")
      assert(chain.claims().exists(_.done), "SQL insert must commit through a claim")

      // a second insert CONTINUES the stream's versions (minted, not copied)
      s.sql(
        """INSERT INTO graftsql.ns.orders
          |  (aggregate_id, aggregate_kind, kind, body, aggregate_version)
          |SELECT 's3', 'User', 'Evt', '{}', 2""".stripMargin)
      assert(s.sql(
        "SELECT max(aggregate_version) FROM graftsql.ns.orders WHERE aggregate_id = 's3'")
        .collect()(0).getInt(0) === 2)

      // point queries prune to the stream's bucket directory through SQL
      val plan = s.sql("SELECT kind FROM graftsql.ns.orders WHERE aggregate_id = 's3'")
        .queryExecution.executedPlan.toString
      assert(plan.contains("bucket"), "derived bucket predicate must reach the scan:\n" +
        plan.take(1500))

      // CTAS: a log-to-log copy in one statement
      s.sql(
        """CREATE TABLE graftsql.ns.copy USING `graft-events` OPTIONS (numBuckets 2) AS
          |SELECT * FROM graftsql.ns.orders""".stripMargin)
      assert(s.sql("SELECT count(*) FROM graftsql.ns.copy").collect()(0).getLong(0) === 21L)
      assert(s.sql("SHOW TABLES IN graftsql.ns").collect().map(_.getString(1)).toSet ===
        Set("orders", "copy"))

      // the SQL-written log IS a native log: EventLog reads it directly
      val native = new EventLog(s, s"$wh/ns/orders", numBuckets = 4,
        commitMode = graft.log.CommitMode.Manifest)
      assert(native.committedEvents.count() === 21L)
      assert(native.streamEvents("s3").count() === 2L)

      // ALTER declares a discriminator key (the one legal envelope change);
      // the next INSERT's discriminator map materializes the column, and
      // pre-ALTER rows read it as null
      s.sql("ALTER TABLE graftsql.ns.orders ADD COLUMNS (disc_tenant STRING)")
      s.sql(
        """INSERT INTO graftsql.ns.orders
          |  (aggregate_id, aggregate_kind, kind, body, aggregate_version, discriminator)
          |SELECT 't1', 'User', 'Evt', '{}', 1, map('tenant', 'acme')""".stripMargin)
      assert(s.sql(
        "SELECT disc_tenant FROM graftsql.ns.orders WHERE aggregate_id = 't1'")
        .collect()(0).getString(0) === "acme")
      assert(s.sql(
        "SELECT count(*) FROM graftsql.ns.orders WHERE disc_tenant IS NULL")
        .collect()(0).getLong(0) === 21L,
        "pre-ALTER rows must read the declared column as null")
      // every other ALTER refuses with the fixed-envelope message
      val ae = intercept[Exception](
        s.sql("ALTER TABLE graftsql.ns.orders ADD COLUMNS (extra INT)"))
      assert(ae.getMessage.contains("fixed envelope"), ae.getMessage)
      // DESCRIBE EXTENDED surface: log stats ride the table properties
      val props = s.sql("SHOW TBLPROPERTIES graftsql.ns.orders").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.numBuckets").contains("4"), props.toString)
      assert(props.get("graft.commitMode").contains("manifest"))
      assert(props("graft.events.files").toInt > 0)
      assert(props("graft.claims.done").toInt >= 2)
      assert(props.get("graft.discKeys").contains("tenant"))
      // TRUNCATE / DELETE refuse by naming the sanctioned mutations
      val te = intercept[Exception](s.sql("TRUNCATE TABLE graftsql.ns.orders"))
      assert(te.getMessage.contains("EventLog.forget"), te.getMessage)
      val de = intercept[Exception](
        s.sql("DELETE FROM graftsql.ns.orders WHERE aggregate_id = 't1'"))
      assert(de.getMessage.contains("EventLog.forget"), de.getMessage)

      s.sql("DROP TABLE graftsql.ns.copy")
      assert(s.sql("SHOW TABLES IN graftsql.ns").collect().map(_.getString(1)).toSet ===
        Set("orders"))
      intercept[Exception](s.sql("SELECT * FROM graftsql.ns.copy").collect())
    } finally {
      s.conf.unset("spark.sql.catalog.graftsql")
      s.conf.unset("spark.sql.catalog.graftsql.warehouse")
    }
  }

  test("CREATE TABLE ... LOCATION adopts an existing log's layout, refuses a mismatch") {
    val s = spark
    val wh = Files.createTempDirectory("graftwhloc").toFile.getAbsolutePath
    val ext = Files.createTempDirectory("graftextlog").toFile.getAbsolutePath
    val extLog = new EventLog(s, ext, numBuckets = 8, ulidSeed = Some(17L))
    (1 to 12).foreach { i =>
      extLog.append(Seq(AppendRecord(s"ext-$i", "Account", 0, Map.empty,
        Seq(EventDetail("Created", "{}")))))
    }
    s.conf.set("spark.sql.catalog.graftloc", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graftloc.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE graftloc.ns")
      // a numBuckets that contradicts the on-disk layout must refuse: the
      // old behavior force-cached the DDL's modulus, so bucket-pruned point
      // scans silently read the WRONG directory for the whole session
      val e = intercept[Exception] {
        s.sql(s"CREATE TABLE graftloc.ns.ext USING `graft-events` " +
          s"OPTIONS (numBuckets 4) LOCATION '$ext'")
      }
      assert(e.getMessage.contains("numBuckets=8"),
        s"mismatch must name the real modulus, got: ${e.getMessage}")
      // without the option the existing layout is adopted verbatim
      s.sql(s"CREATE TABLE graftloc.ns.ext USING `graft-events` LOCATION '$ext'")
      assert(s.sql("SELECT count(*) FROM graftloc.ns.ext").collect()(0).getLong(0) === 12L)
      // the poisoning symptom was a point scan pruned with the wrong
      // modulus returning zero rows — assert the adopted modulus serves it
      assert(s.sql(
        "SELECT count(*) FROM graftloc.ns.ext WHERE aggregate_id = 'ext-3'")
        .collect()(0).getLong(0) === 1L)
    } finally {
      s.conf.unset("spark.sql.catalog.graftloc")
      s.conf.unset("spark.sql.catalog.graftloc.warehouse")
    }
  }

  test("Graft.enable is idempotent") {
    Graft.enable(spark); Graft.enable(spark)
    val n = spark.experimental.extraOptimizations
      .count(_.isInstanceOf[graft.plans.GraftBucketPruning])
    assert(n === 1)
  }
}
