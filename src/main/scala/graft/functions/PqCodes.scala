package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder as ONE codegen'd expression: an
  * `array<double>` vector becomes `m` 1-based codes — per subspace `s`, the
  * index of the nearest codebook centroid by `round(squared-L2, 6)`, ties
  * to the LOWEST index. Bit-identical to the declarative
  * `aggregate(zip_with(slice(...)))` + `array_position(array_min(...))`
  * form the e12/e13 oracles mirror (same left-to-right accumulation, same
  * HALF_UP rounding, same first-wins tie), but evaluated as a single tight
  * loop inside whole-stage codegen instead of `m × kc` interpreted HOF
  * trees — this is the corpus-wide encode scan of [[graft.ops.Similarity
  * .pqEncode]] and the IVF-PQ build/append/ingest path, the hot projection
  * at 100 TB.
  */
case class PqCodes(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(books.nonEmpty && books(0).nonEmpty, "pq_codes requires codebooks")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<double> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def nullSafeEval(v: Any): Any =
    PqCodes.compute(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqCodes$$.MODULE$$.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  /** Rounded squared-L2 of the subspace slice `[off, off+sub)` to one
    * centroid — the same left-to-right fold as the declarative
    * `aggregate(zip_with(...), 0d, _ + _)`, so sums are bit-identical on
    * well-formed input (dims == m·sub, the precondition [[graft.ops
    * .Similarity.pqCodebooks]] enforces at build).
    */
  private def distAt(x: ArrayData, off: Int, cent: Array[Double]): Double = {
    val n = math.min(x.numElements() - off, cent.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(off + i) - cent(i)
      acc += d * d
      i += 1
    }
    NearestCentroid.round6(acc)
  }

  def compute(x: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val sub = books(0)(0).length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val bs = books(s)
      var best = 0
      var bestD = distAt(x, s * sub, bs(0))
      var c = 1
      while (c < bs.length) {
        val d = distAt(x, s * sub, bs(c))
        // strict: a tie keeps the earlier (lower) code, like array_position
        // of array_min (Spark's total order; NaN compares greatest)
        if (java.lang.Double.compare(d, bestD) < 0) { best = c; bestD = d }
        c += 1
      }
      out(s) = best + 1 // 1-based, the array_position convention
      s += 1
    }
    new GenericArrayData(out)
  }
}
