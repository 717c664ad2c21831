package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeD10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"D10 $n%-30s ${(System.nanoTime()-t0)/1e9}%.2f"); r }
    val sig = graft.ops.Dedup.simhash32(docs, "doc_id", "text")
    t("simhash only")(println("  n=" + sig.count()))
    val bands = sig.select(col("sh_id"), col("simhash"), explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("byte", expr("shiftright(simhash, band * 8)").bitwiseAND(255))
    t("bands")(println("  n=" + bands.count()))
    val buckets = bands.groupBy(col("band"), col("byte"))
      .agg(collect_list(struct(col("sh_id"), col("simhash"))).as("xs"))
      .filter(size(col("xs")) > 1).withColumn("xs", array_sort(col("xs")))
    t("buckets")(println("  n=" + buckets.count()))
    val pairs = buckets.select(explode(flatten(transform(
        sequence(lit(1), size(col("xs")) - 1),
        i => transform(
          slice(col("xs"), i + 1, size(col("xs")) - i),
          b => struct(element_at(col("xs"), i).as("a"), b.as("b")))))).as("p"))
    t("pair expansion")(println("  n=" + pairs.count()))
    t("full")(println("  n=" + graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", 2).count()))
    spark.stop()
  }
}
