package graft.tools

import graft.streaming.ReadModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the staged read-model maintenance (r14): a 10M-key
  * model with two stored versions per key (20M rows), compacted and then
  * GDPR-forgotten for a 1% key sliver, at the DEFAULT heap.
  *
  * The r13 shape staged the WHOLE surviving model through
  * `localCheckpoint()` — the corpus-sized block-storage pin that OOM'd
  * FullPipelineSmoke at 5M docs; the staged side-directory rewrite keeps
  * nothing model-sized on-heap or in block storage, so this must pass
  * where that shape could not. Asserts, not just times: resolved state
  * after compact, victim erasure to zero stored rows, survivor count, and
  * the post-forget model still merging and resolving.
  */
object ReadModelScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nKeys = sys.env.getOrElse("RM_KEYS", "10000000").toLong
    val dir = java.nio.file.Files.createTempDirectory("rmscale").toFile.getAbsolutePath
    val rm = new ReadModel(spark, s"$dir/rm", "k")

    def time[A](name: String)(f: => A): A = {
      val s0 = System.nanoTime(); val r = f
      println(f"RMSCALE $name%-28s ${(System.nanoTime() - s0) / 1e9}%.2f s"); r
    }

    // two versioned merges: every key's v1 superseded by v2
    time(s"merge v1 ($nKeys keys)") {
      rm.merge(spark.range(nKeys).select(concat(lit("k"), col("id")).as("k"),
        col("id").as("v"), lit("pii").as("who")), version = Some(1L))
    }
    time("merge v2") {
      rm.merge(spark.range(nKeys).select(concat(lit("k"), col("id")).as("k"),
        (col("id") * 2).as("v"), lit("pii").as("who")), version = Some(2L))
    }
    val resolved = time("current (pre-compact)")(rm.current().count())
    require(resolved == nKeys, s"latest-wins must resolve $nKeys keys, got $resolved")

    time("compact")(rm.compact(gcRetentionMs = 0L))
    val stored = spark.read.parquet(s"$dir/rm").count()
    require(stored == nKeys, s"compact must leave one row per key, got $stored")
    val v2 = rm.current().filter($"k" === "k7").select("v").as[Long].head()
    require(v2 == 14L, s"compacted state must be v2's, got $v2")

    // forget a 1% sliver (every 100th key) — staged rewrite of the model
    val victims = spark.range(0, nKeys, 100)
      .select(concat(lit("k"), col("id")).as("k"))
    val nVictims = nKeys / 100 + (if (nKeys % 100 > 0) 1 else 0)
    val removed = time(s"forget ($nVictims keys)")(rm.forget(victims))
    require(removed == nVictims, s"expected $nVictims victims, got $removed")
    require(spark.read.parquet(s"$dir/rm").count() == nKeys - nVictims,
      "every victim row erased, every survivor kept")
    require(rm.current().filter($"k" === "k100").count() == 0L,
      "victim keys must be gone")

    // the model keeps working after the swap
    rm.merge(Seq(("k100", 5L, "new")).toDF("k", "v", "who"), version = Some(3L))
    require(rm.current().filter($"k" === "k100").count() == 1L)
    println(s"RMSCALE OK: $nKeys keys, $nVictims forgotten, default heap")
    spark.stop()
  }
}
