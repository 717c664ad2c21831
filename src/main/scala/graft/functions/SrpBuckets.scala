package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All SRP-LSH bucket keys of one vector as ONE codegen'd expression:
  * `signs` is the seeded ±1 hyperplane matrix `[table][bit][dim]`; output is
  * `array<int>` with one bucket per table (bit i of a bucket = sign of the
  * i-th projection, packed MSB-first).
  *
  * Replaces the unrolled `when(±e₁ ± e₂ … ≥ 0, …)` column chains: at
  * 8 tables × 8 bits × 64 dims those are ~4k expression nodes PER SIDE of
  * the ANN join — enough to stall the optimizer and overflow codegen method
  * limits (measured 40 s of mostly driver time for e5 at sf0.1). Here the
  * matrix lives in one referenced object and the loop is tight generated
  * code. Arithmetic is the identical left-to-right double accumulation
  * (±element in index order), so results stay bit-identical to the chain
  * form and to the DuckDB oracle's generated SQL.
  */
case class SrpBuckets(child: Expression, signs: Array[Array[Array[Int]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_buckets requires array<double> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  override def nullSafeEval(v: Any): Any =
    SrpBuckets.compute(v.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpSigns", signs, "int[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.SrpBuckets$$.MODULE$$.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {
  /** A vector shorter than the hyperplanes makes every projection NULL in
    * the chain/SQL form (element_at past the end), which unsets every bit —
    * mirrored here as bucket 0.
    */
  def compute(x: ArrayData, signs: Array[Array[Array[Int]]]): ArrayData = {
    val tables = signs.length
    val out = new Array[Int](tables)
    val n = x.numElements()
    var t = 0
    while (t < tables) {
      val tb = signs(t)
      val bits = tb.length
      var bucket = 0
      if (bits > 0 && n >= tb(0).length) {
        var i = 0
        while (i < bits) {
          val row = tb(i)
          var acc = 0.0
          var j = 0
          while (j < row.length) {
            val e = x.getDouble(j)
            acc += (if (row(j) > 0) e else -e)
            j += 1
          }
          if (acc >= 0) bucket |= 1 << (bits - 1 - i)
          i += 1
        }
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
