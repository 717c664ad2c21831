package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity of two `array<double>` columns as ONE codegen'd loop.
  *
  * Replaces the higher-order `aggregate(zip_with(...))` chains in the
  * similarity operators: same arithmetic — dot, |a|², |b|² accumulated
  * left-to-right in index order, result `dot / (sqrt(na) * sqrt(nb))` — so
  * results are bit-identical to the HOF formulation (and to the DuckDB
  * oracle), but the three passes collapse into one tight loop inside
  * whole-stage codegen instead of three interpreted lambda traversals.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<double> inputs, got ${l.catalogString}, ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    CosineSim.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSim$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Prefix cosine on length mismatch: dot AND both norms run over the
    * common prefix only (embedding corpora are fixed-dimension; the guard
    * just prevents out-of-bounds on malformed rows).
    */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val a = x.getDouble(i)
      val b = y.getDouble(i)
      dot += a * b
      na += a * a
      nb += b * b
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
