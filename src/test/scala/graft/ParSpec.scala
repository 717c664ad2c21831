package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins ops.Par.fanOut's scale-adaptive contract: repartition ONLY when
  * the input plans below cluster parallelism; already-parallel frames pass
  * through untouched (the 100 TB multi-split case pays no exchange).
  */
class ParSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("fanOut lifts a single-partition input to default parallelism") {
    val one = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
    assert(one.rdd.getNumPartitions === 1)
    val fanned = graft.ops.Par.fanOut(one)
    assert(fanned.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // content identical (round-robin repartition moves rows, loses none)
    assert(fanned.agg(sum(col("id"))).head.getLong(0) ===
      one.agg(sum(col("id"))).head.getLong(0))
    assert(fanned.count() === 1000L)
  }

  test("fanOut is a no-op on an already-parallel input") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000, 1, numPartitions = target + 2).toDF("id")
    val out = graft.ops.Par.fanOut(wide)
    // same frame back: no repartition node added
    assert(out eq wide)
  }

  test("substringDedup results are unchanged by fan-out partitioning") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"), // exact duplicate of 1
      (3L, "z y x w v u t s r q"),
      (4L, "a b c d e f g h zz qq")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.substringDedup(docs, "doc_id", "text",
        windowTokens = 8)
      .orderBy("doc_id").collect()
    assert(out.length === 4)
    // doc 1 is canonical: keeps everything
    assert(out(0).getAs[Long]("n_dropped") === 0L)
    // doc 2 duplicated every window: all positions dropped, text null
    assert(out(1).getAs[Long]("n_dropped") === 10L)
    assert(out(1).isNullAt(out(1).fieldIndex("kept_text")))
    // doc 3 unique: untouched
    assert(out(2).getAs[Long]("n_dropped") === 0L)
  }
}
