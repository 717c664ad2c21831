package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 32-bit hash of a string's UTF-8 bytes, with the sign bit cleared so
  * the result is a non-negative Int usable for modulo partitioning.
  *
  * Bit-compatible with the reference's `util.HashToInt` + `Int32ring`
  * (reference: util/common.go:40-56). Spark's built-in `hash()` is Murmur3, so
  * stored `aggregate_id_hash` values would not line up across engines without
  * this expression. Implements `doGenCode` so it stays inside whole-stage
  * codegen on the hot path (scan → hash → pmod partition pruning).
  */
case class Fnv1a32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv1a32 requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "fnv1a32"

  override def nullSafeEval(input: Any): Any =
    Fnv1a32.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a32$$.MODULE$$.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a32 =
    copy(child = newChild)
}

object Fnv1a32 {
  private final val OffsetBasis = 0x811c9dc5 // 2166136261
  private final val Prime = 16777619

  /** FNV-1a over raw bytes; sign bit cleared (equivalent to the reference's
    * "if negative, mask with 0x7fffffff" since masking a non-negative value
    * is the identity).
    */
  def hashBytes(bytes: Array[Byte]): Int = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff)
      h *= Prime
      i += 1
    }
    h & 0x7fffffff
  }

  def hashString(s: String): Int =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
