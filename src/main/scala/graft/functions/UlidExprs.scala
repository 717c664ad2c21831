package graft.functions

import graft.core.Ulid
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Millisecond epoch timestamp encoded in a ULID's first 10 chars.
  * Codegen-friendly so `ulid_millis(id) between a and b` predicates stay in
  * whole-stage codegen (reference semantics: eventid/eventid.go:89-97).
  */
case class UlidMillis(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ulid_millis requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "ulid_millis"

  override def nullSafeEval(input: Any): Any =
    Ulid.timestampMs(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.core.Ulid$$.MODULE$$.timestampMs($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): UlidMillis =
    copy(child = newChild)
}
