package graft

import graft.codec.{Codec, Upcaster}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Column-level codec: decode + upcast entirely inside Catalyst (F7/M3). */
class CodecColumnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val v1Schema = StructType(Seq(
    StructField("money", LongType), StructField("owner", StringType)))
  private val v2Schema = StructType(Seq(
    StructField("money", LongType),
    StructField("owner", StructType(Seq(
      StructField("firstName", StringType), StructField("lastName", StringType))))))

  /** Column form of the name-split upcast (first half / second half of the
    * space-split tokens — same rule as the row-level fixture).
    */
  private def liftV1toV2(c: Column): Column = {
    val toks = split(c.getField("owner"), " ")
    val n = floor(size(toks) / 2).cast("int")
    struct(
      c.getField("money").as("money"),
      struct(
        array_join(slice(toks, lit(1), n), " ").as("firstName"),
        array_join(slice(toks, n + 1, size(toks) - n), " ").as("lastName")).as("owner"))
  }

  test("decoded() lifts V1 bodies to the V2 shape inside Catalyst") {
    val s = spark
    import s.implicits._
    val codec = new Codec()
      .register("AccountCreated", v1Schema)
      .register("AccountCreated_V2", v2Schema)
      .registerUpcaster(Upcaster("AccountCreated", "AccountCreated_V2",
        n => n, columnLift = Some(liftV1toV2)))

    val df = Seq(
      ("AccountCreated", """{"money":100,"owner":"Paulo Pereira"}"""),
      ("AccountCreated", """{"money":7,"owner":"Paulo Quintans Pereira"}"""),
      ("AccountCreated_V2", """{"money":55,"owner":{"firstName":"Ana","lastName":"Silva"}}"""))
      .toDF("kind", "body")

    val out = df.select(col("kind"),
      codec.decodedAny(col("kind"), col("body"),
        Seq("AccountCreated", "AccountCreated_V2")).as("d"))
      .select(col("d.money").as("money"),
        col("d.owner.firstName").as("fn"), col("d.owner.lastName").as("ln"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    assert(out == Set(
      (100L, "Paulo", "Pereira"),
      (7L, "Paulo", "Quintans Pereira"), // golden split rule (3 tokens → 1 + 2)
      (55L, "Ana", "Silva")))
  }

  test("decoded() stays inside whole-stage codegen (no UDFs in the plan)") {
    val s = spark
    import s.implicits._
    val codec = new Codec()
      .register("AccountCreated", v1Schema)
      .registerUpcaster(Upcaster("AccountCreated", "AccountCreated_V2",
        n => n, columnLift = Some(liftV1toV2)))
    val df = Seq(("AccountCreated", """{"money":1,"owner":"A B"}""")).toDF("kind", "body")
      .select(codec.decoded(col("kind"), col("body"), "AccountCreated").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }
}
