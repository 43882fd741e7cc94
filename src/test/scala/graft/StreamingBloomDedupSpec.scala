package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config.Duration
import graft.streaming.StreamingBloomDedup

/** Contracts for the constant-state Bloom dedup:
  *
  *  - duplicates within the window are ALWAYS suppressed (Bloom membership
  *    has no false negatives), across micro-batch boundaries and across a
  *    generation rotation;
  *  - novel keys pay only the false-positive rate — near-zero at the spec's
  *    load factor;
  *  - state is shard-count-bounded: the store holds one row per touched
  *    shard with fixed-size bitmaps, regardless of key cardinality (the
  *    property exact per-key dedup cannot have).
  */
class StreamingBloomDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
  private def tmp() = java.nio.file.Files.createTempDirectory("graft_bd").toString

  private val window = Duration.parse("1h")

  test("duplicates suppressed across batches and rotation; novel keys admitted") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingBloomDedup.admit[Ev](in.toDS(), _.event_id, _.ts,
      window, bitsPerShard = 1 << 16, shards = 8)
    val q = out.toDF().writeStream.format("memory").queryName("bd1")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      // batch 1: 200 novel keys + in-batch dups of 50 of them
      val b1 = (0 until 200).map(i => Ev(s"k$i", t(i), "new")) ++
        (0 until 50).map(i => Ev(s"k$i", t(i + 300), "dup"))
      in.addData(b1: _*)
      q.processAllAvailable()
      // batch 2: cross-batch dups of the first 100, 100 more novel keys
      in.addData((0 until 100).map(i => Ev(s"k$i", t(i + 600), "dup2")) ++
        (200 until 300).map(i => Ev(s"k$i", t(i), "new2")): _*)
      q.processAllAvailable()
      // batch 3: next generation (ts + 1h) — dups of keys first seen late
      // in the previous generation must STILL be suppressed via the
      // rotated previous bitmap
      in.addData((250 until 300).map(i =>
        Ev(s"k$i", t(3600 + i), "dup-after-rotate")): _*)
      q.processAllAvailable()

      val rows = spark.table("bd1").collect()
      val admitted = rows.map(_.getAs[String]("event_id"))
      assert(admitted.length == admitted.distinct.length,
        "no key is ever admitted twice within the suppression horizon")
      assert(rows.forall(r => r.getAs[String]("payload").startsWith("new")),
        "only first occurrences are admitted")
      // all 300 distinct keys admitted, minus Bloom false drops — at load
      // factor 300·5/65536 the expected false-drop count is << 1
      assert(admitted.length >= 298,
        s"false-drop rate must be near zero at this load (got ${admitted.length}/300)")
    } finally q.stop()
  }

  test("a generation skip keeps a late original's bits probe-able (disorder regression)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    // one shard so the skip event and the late pair share state
    val out = StreamingBloomDedup.admit[Ev](in.toDS(), _.event_id, _.ts,
      window, bitsPerShard = 1 << 16, shards = 1)
    val q = out.toDF().writeStream.format("memory").queryName("bd_skip")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      // batch 1: original lands LATE in generation G
      in.addData(Ev("k_late", t(3500), "new"))
      q.processAllAvailable()
      // batch 2: an event two generations ahead (G+2) forces a rotation
      // SKIP — the two-bitmap layout cleared both bitmaps here
      in.addData(Ev("k_skip", t(2 * 3600 + 10), "new"))
      q.processAllAvailable()
      // batch 3: duplicate of the original with ts in G+1 — 200 s after its
      // original, well inside the window — arriving one generation late.
      // It must probe generation G's surviving bitmap and be suppressed.
      in.addData(Ev("k_late", t(3600 + 100), "dup"))
      q.processAllAvailable()

      val admitted = spark.table("bd_skip").collect()
        .map(r => r.getAs[String]("event_id") -> r.getAs[String]("payload"))
      assert(admitted.count(_._1 == "k_late") == 1,
        "a within-window duplicate arriving <=1 generation late must be " +
          s"suppressed even across a generation skip (got $admitted)")
      assert(admitted.forall(_._2 == "new"), "only first occurrences admit")
    } finally q.stop()
  }

  test("a watermarked stream DROPS beyond-horizon arrivals instead of admitting unchecked") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    // watermark delay == window: the contract's provable regime (probe lag
    // <= 2, always inside the retained bitmaps; older arrivals drop)
    val out = StreamingBloomDedup.admit[Ev](
      in.toDS().withWatermark("ts", "1 hour"), _.event_id, _.ts,
      window, bitsPerShard = 1 << 16, shards = 1)
    val q = out.toDF().writeStream.format("memory").queryName("bd_wm")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      // batch 1: original in generation 0
      in.addData(Ev("k_old", t(100), "new"))
      q.processAllAvailable()
      // batch 2: stream advances to generation 3 — after this batch the
      // watermark is maxTs - 1h ~= generation 2
      in.addData(Ev("k_ahead", t(3 * 3600 + 100), "new"))
      q.processAllAvailable()
      // batch 3: two arrivals BEYOND the watermark (3 generations old) —
      // a duplicate of k_old and a novel key. The unwatermarked operator
      // would admit the duplicate unchecked (beyond the retained horizon);
      // the watermark contract drops both instead.
      in.addData(Ev("k_old", t(200), "dup-beyond-horizon"),
        Ev("k_never", t(300), "late-novel"))
      q.processAllAvailable()

      val admitted = spark.table("bd_wm").collect()
        .map(r => r.getAs[String]("event_id") -> r.getAs[String]("payload"))
      assert(admitted.count(_._1 == "k_old") == 1,
        s"the beyond-horizon duplicate must not re-admit (got $admitted)")
      assert(!admitted.exists(_._1 == "k_never"),
        s"beyond-watermark arrivals are dropped, not admitted (got $admitted)")
      assert(admitted.forall(_._2 == "new"), "only first occurrences admit")
    } finally q.stop()
  }

  test("state is shard-bounded with fixed-size bitmaps at 10k keys") {
    // batch mode drives the exact same state function; at 10k keys the
    // admitted count shows the state never needed per-key entries
    val events = (0 until 10000).map(i => Ev(s"u$i", t(i % 3000), "p")).toDS()
    val admitted = StreamingBloomDedup.admit[Ev](events, _.event_id, _.ts,
      window, bitsPerShard = 1 << 20, shards = 16)
    val n = admitted.count()
    assert(n >= 9990L && n <= 10000L,
      s"10k novel keys admit ~all through 16 constant-size shards (got $n)")
    // shard function spreads keys: no shard owns more than ~3x the mean
    val spread = events
      .groupByKey(e => math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(e.event_id, 0x1b873593), 16))
      .count().collect().map(_._2)
    assert(spread.length == 16 && spread.max < 3 * (10000 / 16),
      "hash sharding must spread keys")
  }

  test("batch and streaming agree on the admitted key set") {
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 120).map { i =>
      Ev(s"k${i % 40}", t(i), if (i < 40) "first" else "later")
    }
    val batchKeys = StreamingBloomDedup.admit[Ev](events.toDS(), _.event_id,
        _.ts, window, bitsPerShard = 1 << 16, shards = 4)
      .collect().map(_.event_id).toSet

    val in = MemoryStream[Ev]
    val q = StreamingBloomDedup.admit[Ev](in.toDS(), _.event_id, _.ts,
        window, bitsPerShard = 1 << 16, shards = 4)
      .toDF().writeStream.format("memory").queryName("bd3")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      events.grouped(30).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val streamKeys = spark.table("bd3").collect()
        .map(_.getAs[String]("event_id")).toSet
      assert(streamKeys == batchKeys,
        "micro-batch boundaries must not change admissions")
      assert(batchKeys.size == 40, "exactly the 40 distinct keys admit")
    } finally q.stop()
  }
}
