package graft.tools

import graft.ops.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tier evidence for the intake ROUTER — the sniff+route first pass a
  * 100 TB intake runs over every blob. Blobs are REAL containers
  * (png/bmp/gif images, PCM and µ-law WAVs, truncated headers, raw text)
  * pre-materialized to parquet OUTSIDE the timed region (the
  * PhashBuildLinearitySmoke lesson: never time the synthesis fixture),
  * so the timed region is exactly what production pays: parquet scan →
  * magic sniff → header parse → route verdict.
  *
  * Three fences:
  *  1. the route CENSUS is exact — every planted class lands on its
  *     route, counted at tier scale (one wrong verdict in 240k blobs
  *     fails loudly);
  *  2. the plan carries ZERO exchanges (the router's scale claim: a
  *     partition-local pass, shuffle-free by construction);
  *  3. per-blob route cost stays flat across the tier step
  *     (≤ 1.5×/decade — scan-shaped, no accumulating term).
  *
  * Emits one JSON line (`ROUTE {...}`) for the committed artifact.
  */
object RouteScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tiers = sys.env.getOrElse("ROUTE_TIERS", "40000,240000")
      .split(",").map(_.trim.toInt).toSeq
    require(tiers.size >= 2 && tiers.last > tiers.head,
      s"linearity needs at least two increasing tiers, got ROUTE_TIERS=$tiers")
    require(tiers.forall(_ % 10 == 0), "tiers must divide the 10-class mix")
    val root = java.nio.file.Files.createTempDirectory("routesmoke").toFile
      .getAbsolutePath

    def time[A](name: String)(f: => A): (A, Double) = {
      val s0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - s0) / 1e9
      println(f"ROUTE $name%-44s $sec%.2f s"); (r, sec)
    }
    def textOf(idc: org.apache.spark.sql.Column) = {
      val formula = concat_ws(" ", (0 until 12).map { j =>
        concat(lit("w"), pmod(xxhash64(idc * 31 + j), lit(5000)))
      }: _*)
      rpad(formula, lit(300), formula)
    }

    val perBlob = tiers.map { n =>
      val matPath = s"$root/blobs_$n"
      time(s"pre-materialize $n mixed blobs (UNTIMED region)") {
        val docs = spark.range(0, n.toLong)
          .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
        val packed = Multimodal.pack(docs, "doc_id", "text", "raw")
        def cls(lo: Int, hi: Int) = packed.filter(
          pmod(col("media_id"), lit(10)) >= lo &&
            pmod(col("media_id"), lit(10)) < hi)
        // the 10-class mix: 4 png/bmp, 1 gif, 2 pcm wav, 1 µ-law,
        // 1 truncated header, 1 raw text
        val img = Multimodal.synthImages(cls(0, 4))
          .select(col("media_id"), col("img").as("content"))
        val gif = Multimodal.synthImages(cls(4, 5), format = "gif")
          .select(col("media_id"), col("img").as("content"))
        val wav = Multimodal.synthAudio(cls(5, 7), nSamples = 512)
          .select(col("media_id"), col("audio").as("content"))
        val ulaw = Multimodal.synthAudio(cls(7, 8), nSamples = 512)
          .select(col("media_id"),
            overlay(col("audio"), lit(Array[Byte](7, 0)), lit(21)).as("content"))
        val corrupt = Multimodal.synthImages(cls(8, 9))
          .select(col("media_id"), substring(col("img"), 1, 14).as("content"))
        val unknown = cls(9, 10)
          .select(col("media_id"), col("content"))
        img.unionByName(gif).unionByName(wav).unionByName(ulaw)
          .unionByName(corrupt).unionByName(unknown)
          .write.mode("overwrite").parquet(matPath)
      }
      val routed = Multimodal.routeIntake(spark.read.parquet(matPath), "content")
      // fence 2: shuffle-free by construction
      val plan = routed.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange"),
        "the router must add ZERO exchanges, plan:\n" + plan)
      // timed region: the full route pass (noop sink executes every row)
      val (_, wall) = time(s"sniff+route $n pre-materialized blobs") {
        routed.write.format("noop").mode("overwrite").save()
      }
      // fence 1: exact census — every planted class on its route
      val counts = routed.groupBy(col("route")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val unit = n / 10L
      val expect = Map("image" -> 5 * unit, "audio" -> 2 * unit,
        "quarantine:wav-ulaw" -> unit, "corrupt" -> unit, "unknown" -> unit)
      require(counts == expect,
        s"route census must equal the planted mix at n=$n: got $counts, want $expect")
      val us = wall * 1e6 / n
      println(f"ROUTE per-blob route cost at $n%d: $us%.3f µs")
      org.apache.hadoop.fs.FileSystem.get(new java.net.URI(s"file://$root"),
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(matPath), true): Unit
      (n, wall, us)
    }

    val decades = math.log10(tiers.last.toDouble / tiers.head)
    val ratioPerDecade = math.pow(
      perBlob.last._3 / perBlob.head._3, 1.0 / decades)
    // locale-independent number formatting (f"" would emit comma decimals
    // under a comma-decimal LANG — invalid JSON)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    println("ROUTE " + perBlob.map { case (n, wall, us) =>
      s""""n_$n":{"wall_sec":${r3(wall)},"per_blob_us":${r3(us)}}"""
    }.mkString("{", ",",
      s""","per_blob_ratio_per_decade":${r3(ratioPerDecade)}}"""))
    // fence 3: scan-shaped cost
    require(ratioPerDecade <= 1.5,
      f"per-blob route cost must be flat across the tier step, " +
        f"got $ratioPerDecade%.3f×/decade")
    // the per-tier matPaths are deleted in the loop; remove the (now
    // empty) createTempDirectory root too — one leaked dir per run
    // otherwise (ADVICE r15)
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(s"file://$root"),
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true): Unit
    println("ROUTE OK")
    spark.stop()
  }
}
