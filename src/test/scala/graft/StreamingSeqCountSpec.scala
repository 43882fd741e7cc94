package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{SeqEvent, StreamingSeqCount}

/** Streaming greedy sequence counting (StreamingSeqCount, r30's live
  * form): non-overlapping view→click journeys counted with three longs of
  * state per user; ordered delivery agrees with r30's single-lag batch
  * census.
  */
class StreamingSeqCountSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_sseq_$n").toString
  }

  test("greedy non-overlapping matching: events are never reused") {
    // V C V V C C -> 2 matches (second C of the last run finds no open view)
    val evs = Seq(
      SeqEvent(1L, t(0), 1, 1), SeqEvent(1L, t(1), 2, 2),
      SeqEvent(1L, t(2), 1, 3), SeqEvent(1L, t(3), 1, 4),
      SeqEvent(1L, t(4), 2, 5), SeqEvent(1L, t(5), 2, 6),
      // user 2: click first — nothing to complete, then one journey
      SeqEvent(2L, t(0), 2, 7), SeqEvent(2L, t(1), 1, 8),
      SeqEvent(2L, t(2), 2, 9))
    val out = StreamingSeqCount.detect(evs.toDS()).collect()
    assert(out.filter(_.user_id == 1L).map(_.n).sorted.toSeq == Seq(1L, 2L))
    assert(out.filter(_.user_id == 2L).map(_.n).toSeq == Seq(1L))
    // match 2 of user 1 completes at the FIRST click of the final run
    assert(out.find(m => m.user_id == 1L && m.n == 2L).get.ts == t(4))
  }

  test("ordered delivery: match counts equal the r30 batch census") {
    val dir = sf("sf0.001")
    val raw = Tables.events(spark, dir)
    val typed = StreamingSeqCount.seqEvents(raw, col("user_id"), col("ts"),
        col("event_type"), col("event_id"), "view", "click")
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SeqEvent]
    val q = StreamingSeqCount.detect(in.toDS())
      .writeStream.format("memory").queryName("sseq_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val matches = try {
      typed.grouped(500).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      spark.table("sseq_agree").as[graft.streaming.SeqMatch].collect()
    } finally q.stop()
    // per-user final count = max n (deltas are 1..count in order)
    val live = matches.groupBy(_.user_id).view.mapValues(_.map(_.n).max).toMap
    val censusLive = live.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val r30 = SparkEntry.queries("r30_sequence_count")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    censusLive.foreach { case (cnt, users) =>
      assert(r30.getOrElse(cnt, 0L) == users, s"count $cnt census mismatch")
    }
    // users active in the pattern but with zero journeys reconcile with
    // the batch matches=0 row
    val active = typed.map(_.user_id).distinct.length.toLong
    assert(r30.getOrElse(0L, 0L) == active - live.size,
      "zero-match users = pattern-active users minus matched users")
    assert(r30.values.sum == active, "r30 censuses exactly the active users")
  }

  test("a late batch of older events cannot pull the expiry horizon earlier") {
    // the round-14 ADVICE fix: the horizon is maxTs + delay over the
    // user's WHOLE history (maxTs persisted in state), not over the
    // latest batch. User A anchors a journey at 200 s (horizon 230 s),
    // then receives an OLDER view at 180 s — above the 170 s watermark,
    // so it is delivered, but below A's maxTs. Without the persisted
    // maxTs the timeout would recompute from 180 s (horizon 210 s) and
    // the watermark passing 215 s would expire the in-flight journey —
    // the completing click at 220 s would count nothing. With the fix
    // the horizon stays 230 s and the match lands.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SeqEvent]
    val q = StreamingSeqCount.detectExpiring(in.toDS(),
        watermarkDelayMs = 30000L)
      .writeStream.format("memory").queryName("sseq_monotone")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(SeqEvent(1L, t(200), 1, 1), // A: open view, horizon 230 s
        SeqEvent(2L, t(140), 1, 2))          // wm after this batch: 170 s
      q.processAllAvailable()
      in.addData(SeqEvent(1L, t(180), 1, 3)) // A: older-than-maxTs view, above wm
      q.processAllAvailable()
      in.addData(SeqEvent(2L, t(245), 2, 4)) // B completes; wm -> 215 s
      q.processAllAvailable()
      in.addData(SeqEvent(2L, t(246), 1, 5)) // timeout sweep at wm 215 s:
      q.processAllAvailable()                // A (230 s) must survive
      in.addData(SeqEvent(1L, t(220), 2, 6)) // A's click completes the journey
      q.processAllAvailable()
      val a = spark.table("sseq_monotone").as[graft.streaming.SeqMatch]
        .collect().filter(_.user_id == 1L)
      assert(a.map(_.n).toSeq == Seq(1L) && a.head.ts == t(220),
        "the in-flight journey must survive the late batch and complete")
    } finally q.stop()
  }

  test("detectExpiring drops idle users; machine position is the only loss") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SeqEvent]
    val q = StreamingSeqCount.detectExpiring(in.toDS(), watermarkDelayMs = 1000L)
      .writeStream.format("memory").queryName("sseq_expire")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(SeqEvent(1L, t(0), 1, 1), SeqEvent(1L, t(1), 2, 2), // 1 match
        SeqEvent(2L, t(0), 1, 3)) // open view, never completed
      q.processAllAvailable()
      in.addData(SeqEvent(3L, t(7200), 1, 4)) // watermark advances 2 h
      q.processAllAvailable()
      in.addData(SeqEvent(4L, t(7201), 1, 5)) // timeouts fire
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 2L, s"idle users must drop (state rows: $stateRows)")
      // user 1 returns: a bare click completes nothing (position reset),
      // a fresh view+click counts — numbered from 1 again
      in.addData(SeqEvent(1L, t(7202), 2, 6),
        SeqEvent(1L, t(7203), 1, 7), SeqEvent(1L, t(7204), 2, 8))
      q.processAllAvailable()
      val u1 = spark.table("sseq_expire").as[graft.streaming.SeqMatch]
        .collect().filter(_.user_id == 1L).map(_.n).sorted.toSeq
      assert(u1 == Seq(1L, 1L),
        "post-expiry numbering restarts; the stray click completes nothing")
    } finally q.stop()
  }
}
