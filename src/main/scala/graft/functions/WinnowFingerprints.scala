package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed fingerprints (Schleimer, Wilkerson & Aiken 2003) of a token
  * array, as one native expression: the distinct minima of every width-`w`
  * window over the positional md5 hex digests of word `n`-grams, in first
  * occurrence order.
  *
  * Semantically identical to the composable form
  * {{{
  *   array_distinct(transform(sequence(1, m - (n - 1) - (w - 1)),
  *     p => array_min(slice(grams, p, w))))
  * }}}
  * over `grams = transform(sequence(1, m - (n-1)), i => md5(concat_ws(" ",
  * w_i … w_{i+n-1})))`, with the `m >= n + w - 1` guard folded in (shorter
  * documents yield an empty array, matching the original `when(...)` wrap).
  * Any SQL oracle reproduces it with the same list_transform/list_min
  * pipeline — md5 hex minima compare identically under ASCII and binary
  * collation.
  *
  * Why native: Catalyst does NOT hoist a non-trivial subexpression that a
  * higher-order-function lambda closes over — in the composable form the
  * whole `grams` subtree (an md5 per gram, over an unmaterialized token
  * split) is re-evaluated at EVERY window position p, making fingerprint
  * selection O(m·w·cost(grams)) ≈ quadratic per document. Measured: 724.8 s
  * at sf0.1 for d26 vs 3.96 s for d02's same-shaped pairing over the same
  * corpus (round-8 verdict). This kernel computes the digests once and runs
  * a monotonic-deque sliding minimum — O(m) md5 calls and O(m) comparisons
  * per row, one MessageDigest per row, inside whole-stage codegen.
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($toks, $n, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val Space = " ".getBytes("UTF-8")
  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, tokens: ArrayData, i: Int, n: Int): String = {
    md.reset()
    var k = 0
    while (k < n) {
      if (k > 0) md.update(Space)
      val t = tokens.getUTF8String(i + k)
      md.update(if (t == null) Array.empty[Byte] else t.getBytes)
      k += 1
    }
    val d = md.digest()
    val out = new Array[Char](32)
    var b = 0
    while (b < 16) {
      out(2 * b) = HexDigits((d(b) >> 4) & 0xf)
      out(2 * b + 1) = HexDigits(d(b) & 0xf)
      b += 1
    }
    new String(out)
  }

  /** Called from generated code — must stay public and static-shaped. */
  def compute(tokens: ArrayData, n: Int, w: Int): ArrayData = {
    val m = tokens.numElements()
    val g = m - n + 1 // number of positional n-grams
    if (g < w) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val grams = new Array[String](g)
    var i = 0
    while (i < g) { grams(i) = md5Hex(md, tokens, i, n); i += 1 }
    // monotonic deque of gram indices: front is the window minimum; strict
    // less-than on eviction keeps the EARLIEST index among equal minima,
    // matching array_min (value-identical either way)
    val deque = new Array[Int](g)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i < g) {
      while (tail > head && grams(deque(tail - 1)).compareTo(grams(i)) > 0) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(grams(deque(head)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  def apply(tokens: org.apache.spark.sql.Column, n: Int, w: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(tokens), n, w))
  }
}
