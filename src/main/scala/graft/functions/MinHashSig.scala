package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k MinHash values of a shingle-hash set, as one native expression.
  *
  * Semantics (identical to MinHashLSH's documented hash family, and to any
  * SQL oracle reproducing it):
  *   h1  = s mod 2³²,  h2 = (s >> 28) | 1   per 60-bit shingle hash s
  *   m_j = min over shingles of (h1 + j·h2) mod 2³²,  j = 0..k-1
  *
  * Why native: a document's signature depends only on its own shingle set,
  * so it belongs on the per-row path (no explode→groupBy shuffle). But the
  * composable per-row form `array_min(transform(...))` × k is a
  * higher-order function — Spark evaluates the lambda interpreted, outside
  * whole-stage codegen, re-walking the array k times. This expression stays
  * inside codegen and computes all k minima in ONE pass over the array with
  * the incremental recurrence h_{j} = (h_{j-1} + h2) mod 2³².
  *
  * Empty input yields an empty array (callers filter docs with no shingles,
  * matching the grouped form which emits no row for an empty group).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sh =>
      s"${ev.value} = graft.functions.MinHashSig.compute($sh, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val M32 = 4294967296L // 2^32

  /** Called from generated code — must stay public and static-shaped. */
  def compute(sh: ArrayData, k: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = sh.getLong(i)
      val h2 = (s >>> 28) | 1L
      var h = s % M32
      var j = 0
      while (j < k) {
        if (h < mins(j)) mins(j) = h
        // h2 < 2³², so one conditional subtract keeps h ≡ h1 + j·h2 (mod 2³²)
        h += h2
        if (h >= M32) h -= M32
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def apply(shingleHashes: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingleHashes), k))
  }
}
