package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` content
  * plus a typed metadata struct, with decode / feature-extraction / resize /
  * frame-sampling as partition-parallel batched transforms.
  *
  * The actual media codecs are NOT available in this container, so the decode
  * kernel is a clearly-marked deterministic STUB — but the Spark-side
  * plumbing is real and what matters at 100 TB: binary columns ride Parquet
  * untouched, metadata predicates prune without touching bytes, and the
  * batched `mapPartitions` shape is exactly where a JNI/Python codec slots in
  * (mapInPandas/Arrow on the PySpark side, batch-iterated rows here).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = false)))

  /** Pack an id + payload column into the multimodal shape. Width/height are
    * derived deterministically from the payload bytes (STUB for real header
    * parsing).
    */
  def pack(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame = {
    val content = col(payloadCol).cast("binary")
    df.select(
      col(idCol).cast("long").as("media_id"),
      content.as("content"),
      struct(
        lit(format).as("format"),
        length(content).cast("long").as("n_bytes"),
        (pmod(crc32(content), lit(1024)) + 1).cast("int").as("width"), // STUB: header parse
        (pmod(crc32(content), lit(768)) + 1).cast("int").as("height") // STUB: header parse
      ).as("meta"))
  }

  /** Deterministic first-k-bytes "frame sample" (STUB for real frame
    * extraction — the slicing/batching plumbing is the real part).
    */
  def frameSample(df: DataFrame, frameBytes: Int = 16): DataFrame =
    df.withColumn("frame", substring(col("content"), 1, frameBytes))
      .withColumn("frame_fp", md5(col("frame")))

  /** Batched feature extraction over partitions: iterates rows in fixed-size
    * batches exactly like an Arrow/mapInPandas kernel would, calling
    * `decodeBatch` once per batch. The decode itself is a STUB (bytes →
    * deterministic pseudo-embedding); swap `decodeBatch` for a real codec
    * binding without touching the plumbing.
    */
  def extractFeatures(df: DataFrame, dim: Int = 8, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val out = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val features = decodeBatch(batch.map(_.getAs[Array[Byte]](contentIdx)), dim)
        batch.iterator.zip(features.iterator).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f)
        }
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** STUB decode kernel: a real implementation binds an image/audio library
    * here (one call per batch, vectorized). This fake is deterministic in the
    * bytes so tests and oracles are stable.
    */
  private def decodeBatch(contents: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
    contents.map { bytes =>
      val f = new Array[Float](dim)
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) {
          f(i % dim) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
      }
      f
    }
}
