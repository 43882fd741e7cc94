package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.config.Duration

/** Rotating-generation Bloom state for ONE shard: `gen` is the newest
  * event-time generation seen (floor(event-time / window)); `cur`, `prev`,
  * `prev2` are the bitmaps of generations `gen`, `gen-1`, `gen-2`. Top-level
  * for encoder codegen.
  *
  * STATE-FORMAT NOTE: `prev2` was added in round 9 (the two-bitmap layout
  * forgot the pre-skip generation). The flatMapGroupsWithState encoder
  * schema changed with it, so a streaming query restarted from a checkpoint
  * written by the two-bitmap layout cannot restore its state — restarting
  * across that upgrade requires a fresh checkpoint directory (the admission
  * stream re-opens its suppression horizon, exactly as a fresh deploy
  * would).
  */
case class BloomGen(gen: Long, cur: Array[Byte], prev: Array[Byte],
                    prev2: Array[Byte])

/** Approximate windowed dedup with CONSTANT state — the admission path for
  * key cardinalities where exact per-key state (StreamingDedup: one state
  * row per distinct key in the window) cannot fit even in RocksDB. State
  * here is `shards × 3 bitmaps` regardless of key count: each shard keeps a
  * Bloom filter per time GENERATION (floor(ts/window)), tagged by
  * generation index and rotated as event time advances — the classic
  * rotating-Bloom windowed-membership construction. Probing is by the
  * EVENT'S generation, not blindly by the newest two bitmaps: an event in
  * generation g checks the bitmaps of g and g-1 (its window horizon), so
  * the guarantee survives event-time disorder across micro-batches and a
  * generation SKIP (g advancing by ≥2 keeps the pre-skip bitmap alive in
  * the third slot — the round-8 two-bitmap layout discarded it and could
  * falsely admit a one-generation-late duplicate after a skip).
  *
  * Error trade, stated precisely:
  *  - NO false admits of true duplicates inside the window, whenever the
  *    duplicate arrives at most ONE generation behind its shard's newest
  *    seen generation (in-order streams trivially satisfy this; so does
  *    ≤1 generation of cross-micro-batch disorder, even across a single
  *    skip — StreamingBloomDedupSpec pins all three paths). A duplicate
  *    arriving exactly two generations late is still checked against its
  *    own generation's surviving bitmap; arrivals older than that are
  *    beyond the retained horizon and admit unchecked — UNLESS the input
  *    stream declares a watermark, in which case they are dropped instead
  *    (next bullet).
  *  - WATERMARK INTEGRATION: when the input stream carries an event-time
  *    watermark (`ds.withWatermark(...)` upstream), arrivals older than the
  *    current watermark are DROPPED — the same late-data contract Spark's
  *    built-in stateful operators apply — never admitted unchecked. With a
  *    watermark delay ≤ window this makes the bounded-disorder guarantee
  *    PROVABLE rather than assumed: a surviving event's generation g
  *    satisfies g ≥ floor(wm/window), while a shard's newest generation is
  *    at most floor((wm + delay)/window) (the watermark is the stream max
  *    at the previous batch minus delay, and within a batch events are
  *    processed in ascending ts order), so the probe lag is ≤
  *    delay/window + 1 ≤ 2 — always inside the three retained bitmaps.
  *    Every admitted event is then probed against its full window horizon;
  *    unchecked admission is impossible. The drop applies to EVERY
  *    sub-watermark arrival, including ones still inside the retained
  *    3-bitmap horizon: with delay < 2·window an event one generation
  *    behind but older than the max delay is dropped here while a batch
  *    invocation would check-and-admit it. Batch invocations and streams
  *    without a watermark see no dropping, so batch==streaming agreement
  *    holds exactly for arrivals at or above the watermark; below it the
  *    streaming side drops (Spark's standard stateful-operator late-data
  *    contract), whatever the batch side would have decided.
  *  - In-generation suppression horizon is [window, 2·window), bracketing
  *    the exact operator's semantics.
  *  - Novel keys may be falsely suppressed at the Bloom false-positive
  *    rate (1 − e^(−kn/m))^k — the knob-bounded price of constant state;
  *    size `bitsPerShard` to the expected keys/shard/window.
  *
  * Scale shape: groups are hash-sharded (`shards` fixed), so state is
  * hash-partitioned and CONSTANT-SIZED; per-event work is k bit probes.
  * No timeouts and no per-key entries — the state store never grows with
  * the stream.
  */
object StreamingBloomDedup {

  /** Admit first occurrences per key within `window`, suppress duplicates,
    * with constant per-shard Bloom state. The same call works on a batch
    * Dataset (one invocation per shard, empty initial state — the
    * batch==streaming agreement spec drives both paths).
    */
  def admit[T](ds: Dataset[T], key: T => String, ts: T => Timestamp,
               window: Duration, bitsPerShard: Int = 1 << 20,
               numHashes: Int = 5, shards: Int = 64)
              (implicit et: Encoder[T]): Dataset[T] = {
    require(Integer.bitCount(bitsPerShard) == 1, "bitsPerShard must be 2^n")
    implicit val stateEnc: Encoder[BloomGen] = Encoders.product[BloomGen]
    implicit val keyEnc: Encoder[Int] = Encoders.scalaInt
    val windowMs = window.millis
    val mask = bitsPerShard - 1
    val nBytes = bitsPerShard / 8

    def bitPositions(k: String): Array[Int] = {
      val h1 = scala.util.hashing.MurmurHash3.stringHash(k, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(k, 0x85ebca6b) | 1
      Array.tabulate(numHashes)(i => (h1 + i * h2) & mask)
    }
    def allSet(bm: Array[Byte], pos: Array[Int]): Boolean =
      bm.length == nBytes && pos.forall(p => (bm(p >> 3) & (1 << (p & 7))) != 0)
    def set(bm: Array[Byte], pos: Array[Int]): Unit =
      pos.foreach(p => bm(p >> 3) = (bm(p >> 3) | (1 << (p & 7))).toByte)

    // the engine hands the fold the current event-time watermark (or
    // Long.MinValue on batch invocations and unwatermarked streams —
    // both mean "drop nothing"); Unchanged on an all-late slice keeps
    // the store write-free where the old early-return did
    val sketch = new SketchEngine.Sketch[Int, T, BloomGen, T] {
      private def empty() = new Array[Byte](nBytes)
      override def init: BloomGen =
        BloomGen(Long.MinValue, Array.empty, Array.empty, Array.empty)
      override def onSlice(shard: Int, events: Iterator[T], st0: BloomGen,
                           wmMs: Long,
                           out: scala.collection.mutable.ArrayBuffer[T])
        : SketchEngine.Next[BloomGen] = {
        val sorted = events.filter(e => ts(e).getTime >= wmMs)
          .toSeq.sortBy(e => (ts(e).getTime, key(e)))
        if (sorted.isEmpty) return SketchEngine.Unchanged
        var st =
          if (st0.gen == Long.MinValue)
            BloomGen(ts(sorted.head).getTime / windowMs,
              empty(), empty(), empty())
          else st0
        sorted.foreach { e =>
          val g = ts(e).getTime / windowMs
          if (g > st.gen) {
            // rotate by the ACTUAL generation delta, keeping bitmaps aligned
            // to their generation tags — a skip (delta 2) parks the pre-skip
            // bitmap in prev2 instead of forgetting it
            st = (g - st.gen) match {
              case 1 => BloomGen(g, empty(), st.cur, st.prev)
              case 2 => BloomGen(g, empty(), empty(), st.cur)
              case _ => BloomGen(g, empty(), empty(), empty())
            }
          }
          val pos = bitPositions(key(e))
          // the event's own window horizon: generations g and g-1, resolved
          // against the retained slots (g may trail st.gen after disorder)
          val lag = st.gen - g
          val own = lag match {
            case 0 => st.cur
            case 1 => st.prev
            case 2 => st.prev2
            case _ => null
          }
          val older = lag match {
            case 0 => st.prev
            case 1 => st.prev2
            case _ => null
          }
          val seen = (own != null && allSet(own, pos)) ||
            (older != null && allSet(older, pos))
          if (!seen) {
            // record the key in its OWN generation's bitmap (an event beyond
            // the retained horizon admits unchecked and unrecorded)
            if (own != null) set(own, pos)
            out += e
          }
        }
        SketchEngine.Update(st)
      }
    }
    SketchEngine.run(ds, (e: T) =>
        math.floorMod(scala.util.hashing.MurmurHash3
          .stringHash(key(e), 0x1b873593), shards),
      sketch, expiring = false)
  }
}
