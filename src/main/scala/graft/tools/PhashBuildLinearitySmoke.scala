package graft.tools

import graft.ops.{Multimodal, PhashIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-cost LINEARITY proof for the perceptual-hash index, on
  * pre-materialized input — the r14 4M-image smoke honestly recorded the
  * build wall growing 22×/decade and ATTRIBUTED it to the synthesis
  * fixture (text→raster encode + its GC churn executing lazily inside the
  * timed region), but attribution isn't proof. Here the images are
  * encoded to parquet OUTSIDE the timed region at every tier, so the
  * timed build is exactly what a production ingest pays: parquet scan →
  * decode → dHash → 4×grid partitioned write.
  *
  * Tiers default to 400k and 4M (a full decade); the fence is per-image
  * build cost flat across the decade (≤ 1.5×/decade — the index's claim
  * that the build is scan-shaped, no quadratic term). Emits one JSON line
  * (`PHLIN {...}`) for the committed artifact.
  */
object PhashBuildLinearitySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tiers = sys.env.getOrElse("PH_TIERS", "400000,4000000")
      .split(",").map(_.trim.toInt).toSeq
    require(tiers.size >= 2 && tiers.last > tiers.head,
      s"linearity needs at least two increasing tiers, got PH_TIERS=$tiers")
    val root = java.nio.file.Files.createTempDirectory("phlin").toFile
      .getAbsolutePath

    def time[A](name: String)(f: => A): (A, Double) = {
      val s0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - s0) / 1e9
      println(f"PHLIN $name%-44s $sec%.2f s"); (r, sec)
    }
    // the PhashIndexScaleSmoke fixture: 40 seeded-hash tokens padded past
    // one full raster; distinct ids → distinct rasters
    def textOf(idc: org.apache.spark.sql.Column) = {
      val formula40 = concat_ws(" ", (0 until 40).map { j =>
        concat(lit("w"), pmod(xxhash64(idc * 31 + j), lit(5000)))
      }: _*)
      rpad(formula40, lit(1400), formula40)
    }

    val perImage = tiers.map { n =>
      val matPath = s"$root/images_$n"
      time(s"pre-materialize $n images (UNTIMED region)") {
        Multimodal.synthImages(Multimodal.pack(
            spark.range(0, n.toLong)
              .select(col("id").as("doc_id"), textOf(col("id")).as("text")),
            "doc_id", "text", "raw"), format = "bmp")
          .select(col("media_id").as("img_id"), col("img"))
          .write.mode("overwrite").parquet(matPath)
      }
      val imgs = spark.read.parquet(matPath)
      val idxPath = s"$root/idx_$n"
      val (_, wall) = time(s"build index ($n pre-encoded images)") {
        PhashIndex.build(imgs, "img_id", "img", idxPath, sigBuckets = 64)
      }
      val us = wall * 1e6 / n
      println(f"PHLIN per-image build cost at $n%d: $us%.3f µs")
      // free the tier's materialized bytes before the next one
      org.apache.hadoop.fs.FileSystem.get(new java.net.URI(s"file://$root"),
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(matPath), true): Unit
      (n, wall, us)
    }

    val decades = math.log10(tiers.last.toDouble / tiers.head)
    val ratioPerDecade = math.pow(
      perImage.last._3 / perImage.head._3, 1.0 / decades)
    // locale-independent number formatting (f"" would emit comma decimals
    // under a comma-decimal LANG — invalid JSON)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    println("PHLIN " + perImage.map { case (n, wall, us) =>
      s""""n_$n":{"wall_sec":${r3(wall)},"per_image_us":${r3(us)}}"""
    }.mkString("{", ",",
      s""","per_image_ratio_per_decade":${r3(ratioPerDecade)}}"""))
    require(ratioPerDecade <= 1.5,
      f"per-image build cost must be flat across the decade, " +
        f"got $ratioPerDecade%.3f×/decade")
    println("PHLIN OK")
    spark.stop()
  }
}
