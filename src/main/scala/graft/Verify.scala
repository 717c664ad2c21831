package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev aid: GRAFT_VERIFY_ONLY=q1,q2 dumps a subset (driver never sets it)
    val only = sys.env.get("GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"GRAFT_VERIFY_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failures = selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
      }
    }
    def q(s: String): String = JsonEscape.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // declared-query manifest: a sweep (check.py) fails when a DECLARED
    // query is absent from it instead of silently shrinking the set — the
    // r12 sf1 artifact covered 120 of 121 because the sweep ran against an
    // older HEAD's dump and nothing noticed (ADVICE r13 input)
    val declared = SparkEntry.queries.keySet.toSeq.sorted
    Files.writeString(Paths.get(s"$outDir/declared.json"),
      declared.map(q).mkString("[", ",", "]"))
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    if (noOracle.nonEmpty)
      System.err.println("[verify] WARNING: queries with no oracle (driver " +
        s"records a weaker rows-only check): ${noOracle.toSeq.sorted.mkString(",")}")
    // Machine-readable failure record beside the dumps: an empty round
    // artifact must never again read as a quiet success (round-7 lesson).
    val failJson = failures
      .map { case (k, m) => s"${q(k)}: ${q(m)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"), failJson)
    spark.stop()
    // >10% of queries failing is a harness/environment break, not a few
    // flaky operators — exit non-zero so the driver sees a red round.
    if (failures.size * 10 > selected.size) {
      System.err.println(
        s"[verify] ${failures.size}/${selected.size} queries failed — exiting non-zero")
      sys.exit(1)
    }
  }
}
