package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RAKE keyword extraction over one document's token array, as a single
  * native pass — the whole per-document pipeline (stopword-delimited runs,
  * per-word deg/freq, floor-scaled word scores, phrase scores, top-k by
  * (score DESC, phrase ASC)) in one kernel call.
  *
  * Replaces t29's relational form (posexplode → run-id window → phrase agg
  * → two joins → two aggregates → rank window: six doc-keyed exchanges for
  * work that never leaves the document) with zero shuffles — each document
  * is already one row, so RAKE is a projection, not a dataflow. Semantics
  * are bit-identical to the relational form (and the unchanged DuckDB
  * oracle): exact integer scoring (deg·10⁶ floor-div freq, phrase score an
  * integer sum), ties by binary UTF-8 phrase order, one candidate row per
  * RUN (duplicate phrase texts stay distinct rows, exactly like the
  * (doc_id, grp) key).
  *
  * Returns array<struct<rk, phrase, n_words, score_scaled>> of the top
  * [[k]] phrases.
  */
case class RakeTopK(child: Expression, stops: Seq[String], k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rk", LongType, nullable = false),
    StructField("phrase", StringType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("score_scaled", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "rake_topk"

  private lazy val stopsArr: Array[UTF8String] =
    stops.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    RakeTopK.compute(input.asInstanceOf[ArrayData], stopsArr, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("rakeStops", stopsArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.RakeTopK.compute($t, $stopsRef, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RakeTopK {

  private def isStop(w: UTF8String, stops: Array[UTF8String]): Boolean = {
    var i = 0
    while (i < stops.length) {
      if (stops(i).equals(w)) return true
      i += 1
    }
    false
  }

  /** Called from generated code — must stay public and static-shaped. */
  def compute(toks: ArrayData, stops: Array[UTF8String], k: Int): ArrayData = {
    val n = toks.numElements()
    // 1. maximal runs of non-stop tokens: (start, len) per run
    val runStart = new java.util.ArrayList[Int]()
    val runLen = new java.util.ArrayList[Int]()
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i)
      if (!isStop(w, stops)) {
        val s0 = i
        var j = i + 1
        while (j < n && !isStop(toks.getUTF8String(j), stops)) j += 1
        runStart.add(s0)
        runLen.add(j - s0)
        i = j
      } else i += 1
    }
    val nRuns = runStart.size()
    if (nRuns == 0) return new GenericArrayData(Array.empty[Any])
    // 2. per-word freq and deg (deg = Σ run length over the word's
    //    occurrences) — exact integers
    val freq = new java.util.HashMap[UTF8String, Array[Long]]()
    var r = 0
    while (r < nRuns) {
      val s0 = runStart.get(r); val len = runLen.get(r)
      var p = 0
      while (p < len) {
        val w = toks.getUTF8String(s0 + p)
        var cell = freq.get(w)
        if (cell == null) { cell = Array(0L, 0L); freq.put(w, cell) }
        cell(0) += 1L      // freq
        cell(1) += len.toLong // deg
        p += 1
      }
      r += 1
    }
    // 3. phrase scores: Σ over occurrences of (deg·10⁶ DIV freq); phrase
    //    text joined by single spaces (binary UTF-8, same as the SQL form)
    val sep = UTF8String.fromString(" ")
    val phrases = new Array[UTF8String](nRuns)
    val scores = new Array[Long](nRuns)
    r = 0
    while (r < nRuns) {
      val s0 = runStart.get(r); val len = runLen.get(r)
      var sc = 0L
      val parts = new Array[UTF8String](len)
      var p = 0
      while (p < len) {
        val w = toks.getUTF8String(s0 + p)
        val cell = freq.get(w)
        sc += (cell(1) * 1000000L) / cell(0)
        parts(p) = w
        p += 1
      }
      phrases(r) = UTF8String.concatWs(sep, parts: _*)
      scores(r) = sc
      r += 1
    }
    // 4. top-k by (score DESC, phrase ASC — binary order, like the window)
    val idx = Array.range(0, nRuns).sortWith { (a, b) =>
      if (scores(a) != scores(b)) scores(a) > scores(b)
      else phrases(a).compareTo(phrases(b)) < 0
    }
    val m = math.min(k, nRuns)
    val out = new Array[Any](m)
    var o = 0
    while (o < m) {
      val ri = idx(o)
      out(o) = new GenericInternalRow(Array[Any](
        (o + 1).toLong, phrases(ri), runLen.get(ri).toLong, scores(ri)))
      o += 1
    }
    new GenericArrayData(out)
  }
}
