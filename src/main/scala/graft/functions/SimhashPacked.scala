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
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Low `width` bits of a token's md5 (little-endian over the first
    * width/8 digest bytes — equal to `md5_number(t) % 2^width` and to
    * [[graft.ops.TextAnalysis.tokenHash32]]/`tokenHash64`).
    */
  private def tokenHash(bytes: Array[Byte], width: Int): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = 0L
    var i = width / 8 - 1
    while (i >= 0) {
      h = (h << 8) | (dig(i) & 0xffL)
      i -= 1
    }
    h
  }

  def compute(tokens: ArrayData, width: Int): Long = {
    val sums = new Array[Int](width)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // split() never yields null elements; a null would NPE here like the
      // aggregate form's hash projection did
      val h = tokenHash(tokens.getUTF8String(i).getBytes, width)
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
