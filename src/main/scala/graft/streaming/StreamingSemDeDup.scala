package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.config.Duration
import graft.operators.KMeans

/** One cell-assigned doc event: a document carrying its quantized embedding
  * and the k-means cell the broadcast codebook put it in.
  */
case class CellDoc(doc_id: Long, ts: Timestamp, c_id: Long, v: Seq[Long])

/** Admission verdict: kept iff no live representative of the doc's cell had
  * cosine ≥ τ. `max_cos_milli` is the highest cosine seen (×1000, rounded;
  * −1000 when the cell had no live representatives).
  */
case class SemVerdict(doc_id: Long, ts: Timestamp, c_id: Long, kept: Boolean,
                      max_cos_milli: Long)

/** One admitted representative: vector, precomputed norm, admission time. */
case class CellRep(docId: Long, v: Seq[Long], nrm: Double, at: Long)

/** Per-cell state: admitted representatives, newest first, capped. */
case class CellReps(reps: List[CellRep])

/** Streaming SemDeDup — the semantic analog of [[StreamingNearDup]], and
  * the streaming form of the batch d15 curation stage: drop documents that
  * are semantic near-copies (cosine ≥ τ) of anything already admitted,
  * online, without ever holding the corpus.
  *
  * Two stages, mirroring how a production pipeline splits the work:
  *
  *  1. '''Cell assignment''' ([[assignCells]]): a stream-static broadcast
  *     of a FIXED k-means codebook (fit offline with [[KMeans.cluster]]
  *     over a corpus snapshot, refreshed out of band — the standard
  *     arrangement for online semantic indexing) + the per-row argmin fold
  *     [[KMeans.nearest]]. Pure projection: no shuffle before the stateful
  *     stage.
  *  2. '''Greedy cell admission''' ([[admit]]): `flatMapGroupsWithState`
  *     keyed by cell id. Each cell keeps a bounded list of admitted
  *     representatives; an arriving doc is rejected iff its cosine against
  *     any LIVE rep reaches τ, and becomes a rep itself when kept. Reps
  *     lapse after `window` (event time) and the newest `maxReps` are
  *     retained, so state is bounded by cells × maxReps × vector size
  *     regardless of stream length — the same discipline as the band-claim
  *     operator, with vectors instead of 16-byte owners.
  *
  * Greedy-sequential semantics: docs are processed in (ts, doc_id) order
  * within each cell, so the FIRST of a near-dup pair is admitted and the
  * second rejected — exactly d15's keep-lowest eviction direction under
  * arrival order. `streaming = false` runs the identical group function
  * over a batch Dataset (NoTimeout, each cell's history complete), which is
  * what the batch==streaming agreement spec pins.
  *
  * Cosines are exact integer dot products over the quantized vectors
  * divided by precomputed norms — the same arithmetic as d15, so a kept/
  * rejected verdict never depends on summation order.
  */
object StreamingSemDeDup {

  /** Stream-static cell assignment. The codebook is FIXED and tiny (≤ a few
    * thousand centroids), so it is materialized ONCE on the driver at plan
    * build and shipped inside a [[graft.functions.NearestCell]] codegen
    * expression: assignment is a pure PROJECTION that stays in whole-stage
    * codegen — no Encoder round-trip, no shuffle, and an upstream
    * event-time watermark tag survives. (The batch queries use the Catalyst
    * fold [[KMeans.nearest]] — interpreted, ~1.2 ms/row at 64 centroids:
    * fine for a bounded verify corpus, two orders of magnitude too slow for
    * a 100k/s admission stream. Same arithmetic, same (d2, c_id) tie rule —
    * spec-pinned against the fold. A previous typed-`map` form of this
    * stage cleared ~28k docs/s; the deserialize/serialize round-trip per
    * event was the whole gap.) `codebook` is [[KMeans.codebook]] output.
    *
    * Watermarks may be attached before or after this call; the
    * batch==streaming agreement spec attaches after, matching the README
    * snippet.
    */
  def assignCells(docs: DataFrame, codebook: DataFrame, docId: Column,
                  tsCol: Column, vCol: Column): Dataset[CellDoc] = {
    val cands: Array[(Long, Array[Long])] = codebook
      .select(explode(col("cands")).as("c"))
      .select(col("c.c_id"), col("c.cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    implicit val enc: Encoder[CellDoc] = Encoders.product[CellDoc]
    docs.select(docId.as("doc_id"), tsCol.as("ts"),
        graft.functions.NearestCell(vCol, cands.map(_._1), cands.map(_._2))
          .as("c_id"),
        vCol.as("v"))
      .as[CellDoc]
  }

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The stateful admission stage. For streaming input the caller must have
    * set a watermark on `ts`; pass `streaming = false` to run the identical
    * logic over a batch Dataset. `tauMilli` is the rejection threshold as
    * cosine × 1000 (950 = the 0.95 SemDeDup operating point).
    */
  def admit(cells: Dataset[CellDoc], window: Duration, tauMilli: Int = 950,
            maxReps: Int = 128, streaming: Boolean = true): Dataset[SemVerdict] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[CellReps] = Encoders.product[CellReps]
    implicit val outEnc: Encoder[SemVerdict] = Encoders.product[SemVerdict]
    val windowMs = window.millis
    val tau = tauMilli / 1000.0

    // Per-event work runs on primitive arrays and an ArrayDeque (oldest
    // rep first: lapse-eviction pops the head, cap-eviction too, admission
    // appends the tail — all O(1)). The boxed-Seq/List version of this loop
    // cost ~65 µs/event in allocation and unboxing alone and capped the
    // whole operator at ~15k docs/s.
    final class LiveRep(val docId: Long, val v: Array[Long], val nrm: Double,
                        val at: Long)

    // watermark clamp and timeout plumbing owned by SketchEngine; the
    // Drop verdict replaces the old in-place state.remove() for an
    // emptied cell
    val sketch = new SketchEngine.Sketch[Long, CellDoc, CellReps,
      SemVerdict] {
      override def init: CellReps = CellReps(Nil)
      override def onSlice(key: Long, evs: Iterator[CellDoc], st: CellReps,
                           wmMs: Long,
                           out: scala.collection.mutable.ArrayBuffer[SemVerdict])
        : SketchEngine.Next[CellReps] = {
        val seq = evs.toSeq
        val sorted =
          if (seq.lengthCompare(2) < 0) seq
          else seq.sortBy(e => (e.ts.getTime, e.doc_id))
        val live = new java.util.ArrayDeque[LiveRep]()
        // state keeps reps newest-first; the deque wants oldest-first
        st.reps.reverseIterator.foreach(r =>
          live.addLast(new LiveRep(r.docId, r.v.toArray, r.nrm, r.at)))
        sorted.foreach { e =>
          val tms = e.ts.getTime
          while (!live.isEmpty && live.peekFirst.at + windowMs <= tms)
            live.removeFirst()
          val ev = e.v.toArray
          val en = math.sqrt(dot(ev, ev).toDouble)
          var maxCos = -1.0
          val it = live.iterator()
          while (it.hasNext) {
            val r = it.next()
            val c =
              if (en == 0 || r.nrm == 0) 0.0
              else dot(ev, r.v).toDouble / (en * r.nrm)
            if (c > maxCos) maxCos = c
          }
          val kept = maxCos < tau
          if (kept) {
            live.addLast(new LiveRep(e.doc_id, ev, en, tms))
            if (live.size > maxReps) live.removeFirst()
          }
          out += SemVerdict(e.doc_id, e.ts, key, kept, math.round(maxCos * 1000))
        }
        if (live.isEmpty) SketchEngine.Drop
        else {
          var reps = List.empty[CellRep] // newest-first, as stored
          val it = live.iterator()
          while (it.hasNext) {
            val r = it.next()
            reps = CellRep(r.docId, r.v.toSeq, r.nrm, r.at) :: reps
          }
          SketchEngine.Update(CellReps(reps))
        }
      }
      override def horizonMs(st: CellReps): Long =
        // reps are stored newest-first — the head's `at` is the newest
        st.reps.head.at + windowMs
    }
    SketchEngine.run(cells, (_: CellDoc).c_id, sketch, expiring = streaming)
  }
}
