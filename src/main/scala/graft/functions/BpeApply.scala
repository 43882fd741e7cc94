package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-apply over a fixed merge vocabulary, as one native codegen'd pass.
  *
  * Semantics are rank-ordered non-overlapping replacement — exactly how BPE
  * applies its learned merges: for each vocab entry in rank order, every
  * (left-to-right, non-overlapping) occurrence in the current string is
  * collapsed to a single unit. Earlier merges consume characters, so later
  * entries see the already-merged string ("the" merged at rank 0 prevents
  * "th"+"er" matches inside it) — authentic BPE behavior, and reproducible
  * in any SQL engine as nested `replace(text, tok, chr(placeholder))`
  * because `replace` is the same left-to-right non-overlapping scan.
  * Placeholders live in the Unicode private-use area (U+E000+rank), which
  * no corpus text or vocab entry contains, so merges never cascade through
  * placeholders.
  *
  * Returns `[n_units, n_merges]`: the encoded length in units (merged
  * pieces count 1, residual characters 1 each — code points, matching SQL
  * `length`) and the number of merge events applied.
  */
case class BpeApply(child: Expression, vocab: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  private lazy val vocabArr: Array[String] = vocab.toArray

  override def nullSafeEval(input: Any): Any =
    BpeApply.compute(input.asInstanceOf[UTF8String], vocabArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("bpeVocab", vocabArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeApply.compute($t, $vocabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeApply {

  /** The fixed demonstration merge table, in rank order. Multi-character
    * English fragments a tiny learned BPE would produce; order matters (and
    * is part of the contract — the oracle nests replaces in this order).
    */
  val Vocab: Seq[String] =
    Seq("the", "ing", "ion", "ent", "and", "er", "th", "in", "on", "an", "re", "at")

  /** Called from generated code — must stay public and static-shaped. */
  def compute(text: UTF8String, vocab: Array[String]): ArrayData = {
    var s = text.toString
    var merges = 0L
    var i = 0
    while (i < vocab.length) {
      val tok = vocab(i)
      var idx = s.indexOf(tok)
      if (idx >= 0) {
        val ph = (0xE000 + i).toChar
        val sb = new java.lang.StringBuilder(s.length)
        var from = 0
        while (idx >= 0) {
          sb.append(s, from, idx).append(ph)
          merges += 1
          from = idx + tok.length
          idx = s.indexOf(tok, from)
        }
        sb.append(s, from, s.length)
        s = sb.toString
      }
      i += 1
    }
    new GenericArrayData(
      Array(s.codePointCount(0, s.length).toLong, merges))
  }

  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    apply(text, Vocab)

  /** Encode with a caller-supplied merge table (e.g. one learned by
    * [[graft.operators.BpeLearn]]), in rank order.
    */
  def apply(text: org.apache.spark.sql.Column,
            vocab: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BpeApply(ColumnBridge.expression(text), vocab))
  }
}
