package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two DISTINCT `array<string>` sets in one pass:
  * |A∩B| / (|A| + |B| − |A∩B|). Replaces the `array_intersect` +
  * `array_union` pair (two hash-set builds and an extra array
  * materialization) in the dedup verify path. Inputs are assumed
  * deduplicated (`array_distinct`), matching the SQL-oracle formulation —
  * same integers, same division, bit-identical result.
  */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim requires two array<string> inputs, got ${l.catalogString}, ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardSim$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  def compute(x: ArrayData, y: ArrayData): Double = {
    val na = x.numElements()
    val nb = y.numElements()
    if (na == 0 && nb == 0) return 0.0
    val set = new java.util.HashSet[UTF8String](math.max(16, na * 2))
    var i = 0
    while (i < na) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) {
      if (set.contains(y.getUTF8String(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}
