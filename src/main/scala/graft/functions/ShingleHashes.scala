package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 60-bit hashes of word n-gram shingles, as one native expression.
  *
  * Semantically identical to
  * `array_distinct(transform(shingles, s => conv(substr(md5(s),1,15),16,10)))`
  * over `wordShingles(text, n)` (TextFunctions) — i.e., the hash of shingle
  * `w_i … w_{i+n-1}` is the first 15 hex digits of md5 of the space-joined
  * shingle, parsed as an unsigned long (= the 128-bit digest's first 8 bytes
  * big-endian, logically shifted right by 4). Any SQL oracle reproduces it
  * with `('0x' || substr(md5(s), 1, 15))::BIGINT`.
  *
  * Why native: near-dup pipelines evaluate this per document on the hot path
  * feeding an explode→join; the composable form walks three interpreted
  * higher-order lambdas (slice/concat/conv) per shingle and shuffles 20+-char
  * strings. This emits longs straight from the digest — one MessageDigest per
  * row, no intermediate strings except the shingle bytes themselves — and the
  * downstream join/shuffle carries 8-byte keys.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($toks, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val Space = " ".getBytes("UTF-8")

  private[functions] def hashAt(md: MessageDigest, tokens: ArrayData,
                                i: Int, n: Int): Long = {
    md.reset()
    var k = 0
    while (k < n) {
      if (k > 0) md.update(Space)
      val t = tokens.getUTF8String(i + k)
      md.update(if (t == null) Array.empty[Byte] else t.getBytes)
      k += 1
    }
    val d = md.digest()
    var acc = 0L
    var b = 0
    while (b < 8) { acc = (acc << 8) | (d(b) & 0xffL); b += 1 }
    acc >>> 4 // first 15 hex digits of the md5
  }

  /** Called from generated code — must stay public and static-shaped. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val numTokens = tokens.numElements()
    if (numTokens < n) return new GenericArrayData(Array.empty[Long])
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= numTokens - n) {
      seen.add(hashAt(md, tokens, i, n))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def apply(tokens: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n))
  }
}

/** POSITIONAL (non-distinct) variant of [[ShingleHashes]]: element `p`
  * (0-based) is the 60-bit hash of the shingle starting at token `p+1`
  * (1-based), order and multiplicity preserved — the input to alignment
  * operators (d31's aligned-run detection) where a gram's POSITION carries
  * the signal that [[ShingleHashes]]'s set semantics discard. Same digest
  * and truncation as ShingleHashes, so any SQL oracle reproduces element
  * values with `('0x' || substr(md5(s), 1, 15))::BIGINT`.
  */
case class PositionalShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positional_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    PositionalShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.PositionalShingleHashes.compute($toks, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PositionalShingleHashes {

  /** Called from generated code — must stay public and static-shaped. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val numTokens = tokens.numElements()
    if (numTokens < n) return new GenericArrayData(Array.empty[Long])
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Long](numTokens - n + 1)
    var i = 0
    while (i <= numTokens - n) {
      out(i) = ShingleHashes.hashAt(md, tokens, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(tokens: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PositionalShingleHashes(ColumnBridge.expression(tokens), n))
  }
}
