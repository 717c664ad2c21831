package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The packed `width`-bit SimHash of a token array as ONE codegen'd
  * expression: per bit b, sum ±1 over every token whose md5-derived hash has
  * bit b set/unset; bit b of the output is set iff the sum is positive.
  *
  * Replaces the explode → 64-sum-columns → groupBy formulation: the hash per
  * token is the identical little-endian read of the first `width/8` md5
  * bytes (== DuckDB's `md5_number % 2^width`), bit-sums are commutative
  * integers, and the two's-complement packing matches the aggregate form
  * bit for bit — but fingerprinting becomes a pure per-row projection with
  * NO shuffle at all (the former plan shuffled `width` longs per document),
  * i.e. scan-speed work on a 100 TB corpus.
  *
  * Reference: the document-fingerprint component of the dedup family
  * (SURVEY.md §2; near-dup banding in [[graft.ops.Dedup.simhashPairs]]).
  */
case class SimhashPacked(child: Expression, width: Int) extends UnaryExpression {
  require(width == 32 || width == 64, "simhash width must be 32 or 64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_packed requires array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_packed"

  override def nullSafeEval(v: Any): Any =
    SimhashPacked.compute(v.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimhashPacked$$.MODULE$$.compute($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): SimhashPacked =
    copy(child = newChild)
}

object SimhashPacked {
  def compute(tokens: ArrayData, width: Int): Long = {
    val sums = new Array[Int](width)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // a NULL element behaves like the aggregate form it replaced: the
      // null hash failed every bit test there and fell to the -1 branch on
      // every bit — exactly what h = 0 contributes
      val t = tokens.getUTF8String(i)
      val h = if (t == null) 0L else Md5Low.hash(t.getBytes, width)
      var b = 0
      while (b < width) {
        sums(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < width) {
      if (sums(b) > 0) packed |= 1L << b
      b += 1
    }
    packed
  }
}
