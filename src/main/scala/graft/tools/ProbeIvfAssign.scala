package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Head-to-head probe of the two corpus→cell assignment shapes at 1M×64
  * (SCALE_VECS / SCALE_NLIST to override): the historical broadcast-join +
  * per-id window (exchanges and sorts corpus×nlist rows) versus the packed
  * argmax fold (zero shuffle, interpreted HOF lambda). Asserts the two
  * produce identical assignments, then times three alternating repeats of
  * each — the measurement behind choosing the fold as assignCells' nCells=1
  * path.
  */
object ProbeIvfAssign {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("SCALE_VECS", "1000000").toInt
    val nlist = sys.env.getOrElse("SCALE_NLIST", "64").toInt
    val emb = spark.range(n.toLong).select(
      col("id").as("vec_id"),
      array((0 until 64).map(j =>
        (pmod(xxhash64(col("id") * 67 + j), lit(1000)) / 500.0 - 1.0)
          .cast("float")): _*).as("embedding"))
      .localCheckpoint()
    val cents = Similarity.defaultCentroids(emb, "vec_id", "embedding", nlist)
      .localCheckpoint()

    def windowForm() = {
      val w = Window.partitionBy(col("vid")).orderBy(col("csim").desc, col("cent_id"))
      emb.select(col("vec_id").as("vid"), Similarity.asDouble(col("embedding")).as("ve"))
        .join(broadcast(cents), lit(true))
        .withColumn("csim", round(Similarity.cosine(col("ve"), col("cent")), 6))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") === 1)
        .select(col("vid"), col("cent_id").as("cell"))
    }
    // the interpreted HOF fold, replicated verbatim — the middle contender
    def foldAssign() = {
      val packed = cents
        .agg(array_sort(collect_list(struct(col("cent_id"), col("cent")))).as("__cl"))
      def sim(vec: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
        round(Similarity.cosine(vec, c.getField("cent")), 6)
      val first = element_at(col("__cl"), 1)
      emb.select(col("vec_id").as("vid"), Similarity.asDouble(col("embedding")).as("ve"))
        .crossJoin(broadcast(packed))
        .select(col("vid"), aggregate(col("__cl"),
          struct(first.getField("cent_id").as("cent_id"), sim(col("ve"), first).as("csim")),
          (acc, c) => {
            val s = sim(col("ve"), c)
            when(s > acc.getField("csim") ||
                (s === acc.getField("csim") &&
                  c.getField("cent_id") < acc.getField("cent_id")),
              struct(c.getField("cent_id").as("cent_id"), s.as("csim")))
              .otherwise(acc)
          }).getField("cent_id").as("cell"))
    }
    // the shipped shape: the codegen'd NearestCentroid kernel over the
    // collected centroid matrix — zero shuffle AND whole-stage codegen
    def exprAssign() = {
      val rows = cents.orderBy(col("cent_id")).collect()
      val mat = rows.map(_.getSeq[Double](1).toArray)
      val ids = array(rows.map(r => lit(r.getLong(0))): _*)
      emb.select(col("vec_id").as("vid"), Similarity.asDouble(col("embedding")).as("ve"))
        .select(col("vid"), element_at(ids,
          graft.functions.nearest_centroid(col("ve"), mat).getField("idx") + 1)
          .as("cell"))
    }

    // equality first: all three forms elect the same cell per vector
    val diff = windowForm().withColumnRenamed("cell", "cw")
      .join(foldAssign().withColumnRenamed("cell", "cf"), Seq("vid"))
      .join(exprAssign().withColumnRenamed("cell", "ce"), Seq("vid"))
      .filter(col("cw") =!= col("cf") || col("cw") =!= col("ce")).count()
    require(diff == 0L, s"assignment mismatch on $diff vectors")

    // force the cell column's evaluation (a bare count() would let the
    // optimizer prune the fold away and time an empty scan)
    def consume(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(hash(col("cell"))).as("h"), count(lit(1)).as("n"))
        .collect()(0).getLong(1)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$c)")
    }
    (1 to 3).foreach { i =>
      time(s"window+shuffle form (rep $i)")(consume(windowForm()))
      time(s"interpreted fold   (rep $i)")(consume(foldAssign()))
      time(s"codegen kernel     (rep $i)")(consume(exprAssign()))
    }
    spark.stop()
  }
}
