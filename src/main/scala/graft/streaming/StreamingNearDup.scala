package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.config.Duration
import graft.functions.{ShingleHashes, TextFunctions}
import graft.operators.MinHashLSH

/** One banded doc event: a document presenting one of its LSH band keys. */
case class BandEvent(doc_id: Long, ts: Timestamp, band_idx: Int, band_val: Long)

/** Outcome of presenting a band: `owned` iff this doc holds the band's
  * claim (it was the first presenter in the active window, or IS the
  * recorded owner re-presenting).
  */
case class BandClaim(doc_id: Long, ts: Timestamp, band_idx: Int, owned: Boolean)

/** Per-band-key state: the claiming doc and when its window opened. */
case class BandOwner(ownerId: Long, openedAt: Long)

/** Streaming near-duplicate suppression — the LSH analog of
  * `StreamingDedup` for a 100-TB ingest pipeline: drop documents that are
  * near-copies of anything already admitted, online, without ever holding
  * the corpus.
  *
  * Greedy band-claim semantics (the streaming-feasible form of MinHash LSH
  * dedup): every admitted-or-seen document claims each of its LSH band keys
  * for `window`; a document is a near-duplicate iff ANY of its bands is
  * already claimed by a DIFFERENT document. Claims are made by the FIRST
  * presenter in event-time order whether or not that presenter was itself
  * kept — the conservative Bloom-filter-style variant, which makes every
  * band key's state independent (one `flatMapGroupsWithState` keyed by
  * (band_idx, band_val), no cross-key coordination) and therefore
  * arbitrarily partitionable across executors. State per key is 16 bytes,
  * evicted by event-time timeout when the watermark passes the claim window
  * — the same bound as StreamingDedup's.
  *
  * Batch equivalence (spec-pinned): with an unbounded window and arrival
  * order (ts, doc_id), `claims` + `combine` equals the one-pass batch form
  * "owner(band) = min doc; keep docs owning all their bands" (query
  * d12_greedy_band_dedup).
  *
  * The per-doc verdict needs all of a doc's band claims — a second grouping.
  * `combine` runs it per micro-batch via `foreachBatch` (claims for one doc
  * are emitted atomically in its batch, so batch-local combining is exact).
  */
object StreamingNearDup {

  /** doc stream → band-key event stream, entirely per-row (signature via
    * the codegen'd MinHashSig, bands via a row-local explode of k/r
    * structs): no shuffle before the stateful stage itself.
    */
  def bandStream(df: DataFrame, docId: Column, tsCol: Column, text: Column,
                 shingleN: Int = 3, k: Int = 8, r: Int = 2): Dataset[BandEvent] = {
    implicit val enc: Encoder[BandEvent] = Encoders.product[BandEvent]
    df.select(docId.as("doc_id"), tsCol.as("ts"),
        ShingleHashes(TextFunctions.tokens(text), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("ts"),
        graft.functions.MinHashSig(col("sh"), k).as("sig"))
      .select(col("doc_id") +: col("ts") +: MinHashLSH.mCols(col("sig"), k): _*)
      .select(col("doc_id"), col("ts"),
        explode(MinHashLSH.bandArray(k, r)).as("band"))
      .select(col("doc_id"), col("ts"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
      .as[BandEvent]
  }

  /** The stateful claim stage. For streaming input the caller must have set
    * a watermark on `ts`; pass `streaming = false` to run the identical
    * logic over a batch Dataset (NoTimeout, each group complete).
    */
  def claims(events: Dataset[BandEvent], window: Duration,
             streaming: Boolean = true): Dataset[BandClaim] = {
    implicit val keyEnc: Encoder[(Int, Long)] = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    implicit val stEnc: Encoder[BandOwner] = Encoders.product[BandOwner]
    implicit val outEnc: Encoder[BandClaim] = Encoders.product[BandClaim]
    val windowMs = window.millis

    // watermark clamp and timeout plumbing owned by SketchEngine
    val sketch = new SketchEngine.Sketch[(Int, Long), BandEvent, BandOwner,
      BandClaim] {
      override def init: BandOwner = BandOwner(Long.MinValue, Long.MinValue)
      override def onSlice(key: (Int, Long), evs: Iterator[BandEvent],
                           st0: BandOwner, wmMs: Long,
                           out: scala.collection.mutable.ArrayBuffer[BandClaim])
        : SketchEngine.Next[BandOwner] = {
        // fast path: most band keys see exactly one event per batch — skip
        // the sort's tuple-key allocations for singleton groups
        val seq = evs.toSeq
        val sorted =
          if (seq.lengthCompare(2) < 0) seq
          else seq.sortBy(e => (e.ts.getTime, e.doc_id))
        var st = Option(st0).filter(_.openedAt != Long.MinValue)
        sorted.foreach { e =>
          val t = e.ts.getTime
          out += (st match {
            case Some(o) if t < o.openedAt + windowMs =>
              BandClaim(e.doc_id, e.ts, e.band_idx, owned = e.doc_id == o.ownerId)
            case _ => // no claim, or the previous claim's window has lapsed
              st = Some(BandOwner(e.doc_id, t))
              BandClaim(e.doc_id, e.ts, e.band_idx, owned = true)
          })
        }
        st.map(SketchEngine.Update(_)).getOrElse(SketchEngine.Unchanged)
      }
      override def horizonMs(st: BandOwner): Long = st.openedAt + windowMs
    }
    SketchEngine.run(events, (e: BandEvent) => (e.band_idx, e.band_val),
      sketch, expiring = streaming)
  }

  /** Batch combiner: per-doc verdict over its band claims. Kept iff every
    * band is self-owned. Run inside `foreachBatch` in a streaming pipeline.
    */
  def combine(claims: DataFrame): DataFrame =
    claims.groupBy(col("doc_id"))
      .agg(bool_and(col("owned")).as("kept"),
        sum(when(!col("owned"), 1L).otherwise(0L)).as("n_foreign_bands"))
}
