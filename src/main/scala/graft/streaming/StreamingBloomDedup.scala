package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.config.Duration

/** Rotating-generation Bloom state for ONE shard: the generation index
  * (floor(event-time / window)), the current-generation bitmap, and the
  * previous-generation bitmap. Top-level for encoder codegen.
  */
case class BloomGen(gen: Long, cur: Array[Byte], prev: Array[Byte])

/** Approximate windowed dedup with CONSTANT state — the admission path for
  * key cardinalities where exact per-key state (StreamingDedup: one state
  * row per distinct key in the window) cannot fit even in RocksDB. State
  * here is `shards × 2 bitmaps` regardless of key count: each shard keeps a
  * Bloom filter per time GENERATION (floor(ts/window)) and rotates it as
  * event time advances — the classic rotating-Bloom windowed-membership
  * construction (two live generations give a suppression horizon of
  * [window, 2·window), bracketing the exact operator's semantics).
  *
  * Error trade, stated precisely:
  *  - NO false admits of true duplicates inside the window: a duplicate at
  *    t' < t0 + window lands in the same or next generation as its
  *    original, whose bits are still live in `cur` or `prev` — Bloom
  *    membership has no false negatives, so the duplicate is always
  *    suppressed (StreamingBloomDedupSpec pins this across micro-batch
  *    boundaries and rotations).
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

    def fn(shard: Int, events: Iterator[T], state: GroupState[BloomGen])
      : Iterator[T] = {
      val sorted = events.toSeq.sortBy(e => (ts(e).getTime, key(e)))
      if (sorted.isEmpty) return Iterator.empty
      var st = state.getOption.getOrElse(
        BloomGen(ts(sorted.head).getTime / windowMs,
          new Array[Byte](nBytes), new Array[Byte](nBytes)))
      val kept = Seq.newBuilder[T]
      sorted.foreach { e =>
        val g = ts(e).getTime / windowMs
        if (g > st.gen) {
          // rotate: the previous generation stays probe-able (suppression
          // horizon >= window); older generations are forgotten
          st = BloomGen(g,
            new Array[Byte](nBytes),
            if (g == st.gen + 1) st.cur else new Array[Byte](nBytes))
        }
        val pos = bitPositions(key(e))
        val seen = allSet(st.cur, pos) || allSet(st.prev, pos)
        if (!seen) {
          set(st.cur, pos)
          kept += e
        }
      }
      state.update(st)
      kept.result().iterator
    }

    val timeout = GroupStateTimeout.NoTimeout
    ds.groupByKey(e =>
        math.floorMod(scala.util.hashing.MurmurHash3
          .stringHash(key(e), 0x1b873593), shards))
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }
}
