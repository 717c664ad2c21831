package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All MinHash band signatures of one shingle array as ONE codegen'd
  * expression: per band b, `min over shingles of (a_b·x + c_b) mod p` with
  * `x = tokenHash32(shingle) mod p` (the md5-low-32 universal-hash family of
  * [[graft.ops.Dedup.minhashSignatures]]). Output `array<long>`, one
  * signature per band; EMPTY for an empty shingle array — `posexplode` then
  * emits no rows, exactly like the explode→groupBy form it replaces (a doc
  * with no shingles never had signature rows).
  *
  * Like [[SimhashPacked]], this turns the signature stage into a pure
  * per-row projection: the former plan exploded every shingle and
  * partial-aggregated band minima through a groupBy — correct, but a
  * shuffle (bands longs per doc) plus explode/agg machinery on the hot
  * dedup path. Min is duplicate- and order-invariant, so values are
  * identical.
  */
case class MinhashSigs(child: Expression, a: Array[Long], c: Array[Long], p: Long)
    extends UnaryExpression {
  require(a.length == c.length && a.nonEmpty, "one (a, c) pair per band")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(v: Any): Any =
    MinhashSigs.compute(v.asInstanceOf[ArrayData], a, c, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val cRef = ctx.addReferenceObj("minhashC", c, "long[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.MinhashSigs$$.MODULE$$.compute($v, $aRef, $cRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

/** [[MinhashSigs]] with the n-gram SHINGLING fused into the expression: the
  * child is the TOKEN array (one reference — safe against CollapseProject
  * inlining the tokenizer, the documented O(tokens²) trap that a separate
  * shingle-array projection reintroduced: the shingle lambda references the
  * token array ~3× per shingle, and collapsing the projections re-evaluates
  * `split()` per reference). Shingle strings are never materialized at all:
  * each window's tokens stream into the digest with single-space separators,
  * byte-identical to md5(concat_ws(" ", …)).
  */
case class MinhashShingleSigs(child: Expression, shingleSize: Int,
    a: Array[Long], c: Array[Long], p: Long) extends UnaryExpression {
  require(a.length == c.length && a.nonEmpty, "one (a, c) pair per band")
  require(shingleSize >= 1, "shingleSize >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_shingle_sigs requires array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingle_sigs"

  override def nullSafeEval(v: Any): Any =
    MinhashSigs.computeFromTokens(v.asInstanceOf[ArrayData], shingleSize, a, c, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val cRef = ctx.addReferenceObj("minhashC", c, "long[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.MinhashSigs$$.MODULE$$.computeFromTokens($v, $shingleSize, $aRef, $cRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashShingleSigs =
    copy(child = newChild)
}

object MinhashSigs {
  private val Space = Array[Byte](' ')

  /** Band minima over the n-gram shingles of `tokens` (fewer than n tokens →
    * empty output, mirroring the `size(ws) >= n` guard).
    */
  def computeFromTokens(tokens: ArrayData, n: Int, a: Array[Long], c: Array[Long],
      p: Long): ArrayData = {
    val nTok = tokens.numElements()
    if (nTok < n)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val bands = a.length
    val mins = Array.fill(bands)(Long.MaxValue)
    // token bytes fetched once per token, reused across the n windows; a
    // NULL token nulls the shingles containing it, which the old min()
    // aggregation skipped — mirrored by skipping those windows
    val toks = new Array[Array[Byte]](nTok)
    var k = 0
    while (k < nTok) {
      val t = tokens.getUTF8String(k)
      toks(k) = if (t == null) null else t.getBytes
      k += 1
    }
    var i = 0
    while (i <= nTok - n) {
      val d = Md5Low.digest()
      var j = 0
      var hasNull = false
      while (j < n) {
        val tb = toks(i + j)
        if (tb == null) hasNull = true
        else {
          if (j > 0) d.update(Space)
          d.update(tb)
        }
        j += 1
      }
      if (!hasNull) {
        val x = Md5Low.bits(d.digest(), 32) % p
        var b = 0
        while (b < bands) {
          val t = (a(b) * x + c(b)) % p
          if (t < mins(b)) mins(b) = t
          b += 1
        }
      }
      i += 1
    }
    if (mins(0) == Long.MaxValue) // every window contained a null token
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Empty output for an empty array: no shingles → no signature rows after
    * the caller's posexplode (the explode→groupBy form's behavior).
    */
  def compute(shingles: ArrayData, a: Array[Long], c: Array[Long], p: Long): ArrayData = {
    val n = shingles.numElements()
    val bands = a.length
    if (n == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val mins = Array.fill(bands)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val sh = shingles.getUTF8String(i)
      // the old min() aggregation skipped null-hash shingles
      if (sh != null) {
        val x = Md5Low.hash(sh.getBytes, 32) % p
        var b = 0
        while (b < bands) {
          val t = (a(b) * x + c(b)) % p
          if (t < mins(b)) mins(b) = t
          b += 1
        }
      }
      i += 1
    }
    if (mins(0) == Long.MaxValue) // nothing hashable
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
