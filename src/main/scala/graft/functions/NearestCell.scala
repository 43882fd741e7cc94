package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Nearest-centroid id of a quantized vector against a FIXED codebook, as
  * ONE native expression (the [[LshBandSig]] pattern applied to k-means
  * cell assignment).
  *
  * Semantics are identical to the Catalyst fold `KMeans.nearest` it
  * accelerates: exact integer L2² argmin with ties broken toward the
  * smaller c_id (the candidate arrays are c_id-sorted and the scan uses
  * strict less-than). The per-row self-dot ‖v‖² is a constant offset across
  * candidates, so the scan minimizes ‖c‖² − 2·v·c — the argmin and every
  * tie are unchanged, one dot product per candidate saved.
  *
  * Why native: the fold is a higher-order function Spark evaluates
  * INTERPRETED (~1.2 ms/row at 64 centroids — fine for a bounded verify
  * corpus, two orders of magnitude too slow for a 100k/s admission
  * stream), and the typed-map alternative costs an Encoder round-trip that
  * drops the event-time watermark tag and breaks whole-stage codegen. This
  * expression keeps assignment inside codegen: the codebook rides along as
  * reference objects, the scan is a tight JVM loop.
  */
case class NearestCell(child: Expression, cIds: Array[Long],
                       cvs: Array[Array[Long]], withD2: Boolean = false)
  extends UnaryExpression {
  require(cIds.length == cvs.length && cIds.nonEmpty,
    "codebook must be non-empty with one id per centroid")
  require((1 until cIds.length).forall(i => cIds(i - 1) < cIds(i)),
    "codebook must be c_id-sorted (strictly ascending) for the tie rule")

  /** ‖c‖² per centroid, precomputed once and shipped with the expression. */
  private lazy val c2s: Array[Long] = cvs.map { cv =>
    var s = 0L; var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    s
  }

  override def dataType: DataType =
    if (withD2)
      StructType(Seq(StructField("c_id", LongType, nullable = false),
        StructField("d2", LongType, nullable = false)))
    else LongType
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(input: Any): Any =
    if (withD2)
      NearestCell.computeWithD2(input.asInstanceOf[ArrayData], cIds, cvs, c2s)
    else NearestCell.compute(input.asInstanceOf[ArrayData], cIds, cvs, c2s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("cellIds", cIds, "long[]")
    val vs = ctx.addReferenceObj("cellVecs", cvs, "long[][]")
    val n2 = ctx.addReferenceObj("cellNorms", c2s, "long[]")
    val fn = if (withD2) "computeWithD2" else "compute"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCell.$fn($v, $ids, $vs, $n2);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCell {

  /** Called from generated code — must stay public and static-shaped. */
  def compute(v: ArrayData, cIds: Array[Long], cvs: Array[Array[Long]],
              c2s: Array[Long]): Long = {
    var best = Long.MaxValue
    var bestC = -1L
    var i = 0
    while (i < cvs.length) {
      val cv = cvs(i)
      val n = math.min(v.numElements(), cv.length)
      var dot = 0L
      var j = 0
      while (j < n) { dot += v.getLong(j) * cv(j); j += 1 }
      // strict less + ascending ids == smaller c_id wins ties, matching
      // ROW_NUMBER(ORDER BY d2, c_id) and KMeans.nearest exactly
      val score = c2s(i) - 2L * dot
      if (score < best) { best = score; bestC = cIds(i) }
      i += 1
    }
    bestC
  }

  /** `(c_id, d2)` form for callers that also need the exact distance
    * (KMeans.assign → s10's inertia): d2 = ‖v‖² − 2·v·c + ‖c‖², the same
    * identity as the fold, every term an exact integer.
    */
  def computeWithD2(v: ArrayData, cIds: Array[Long], cvs: Array[Array[Long]],
                    c2s: Array[Long]): org.apache.spark.sql.catalyst.InternalRow = {
    var best = Long.MaxValue
    var bestC = -1L
    var xx = 0L
    var j = 0
    val vn = v.numElements()
    while (j < vn) { val x = v.getLong(j); xx += x * x; j += 1 }
    var i = 0
    while (i < cvs.length) {
      val cv = cvs(i)
      val n = math.min(vn, cv.length)
      var dot = 0L
      j = 0
      while (j < n) { dot += v.getLong(j) * cv(j); j += 1 }
      val score = c2s(i) - 2L * dot
      if (score < best) { best = score; bestC = cIds(i) }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestC, xx + best))
  }

  def apply(vQuantized: org.apache.spark.sql.Column, cIds: Array[Long],
            cvs: Array[Array[Long]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      NearestCell(ColumnBridge.expression(vQuantized), cIds, cvs))
  }

  /** Column form returning struct(c_id, d2). */
  def withD2(vQuantized: org.apache.spark.sql.Column, cIds: Array[Long],
             cvs: Array[Array[Long]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      NearestCell(ColumnBridge.expression(vQuantized), cIds, cvs, withD2 = true))
  }
}
