package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{RetentionEvent, StreamingRetention}

/** Streaming conditioned retention (StreamingRetention, r28's live form):
  * exactly-once (user, offset) credits, pending pre-signup purchases,
  * bounded state, and ordered delivery agrees with the r28 batch query
  * row for row through the census fold.
  */
class StreamingRetentionSpec extends SparkSpecBase {
  import spark.implicits._

  // Mondays: 2023-11-13 is a Monday (epoch day 19674, (19674-4)%7==0)
  private val monday = 1699833600000L // 2023-11-13T00:00:00Z
  private def t(weeks: Int, sec: Long): Timestamp =
    new Timestamp(monday + weeks * 7L * 86400000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_sret_$n").toString
  }

  test("credits are exactly-once per (user, offset); horizon respected") {
    val evs = Seq(
      RetentionEvent(1L, t(0, 10), 1),  // cohort week 0
      RetentionEvent(1L, t(0, 20), 2),  // offset 0
      RetentionEvent(1L, t(0, 30), 2),  // duplicate week: no new delta
      RetentionEvent(1L, t(1, 10), 2),  // offset 1
      RetentionEvent(1L, t(5, 10), 2),  // offset 5 >= nOffsets: dropped
      RetentionEvent(2L, t(0, 40), 1),  // cohort only, never purchases
      RetentionEvent(2L, t(1, 0), 1))   // second signup: no re-cohort
    val out = StreamingRetention.detect(evs.toDS(), nOffsets = 4).collect()
    val sizes = out.filter(_.offset == StreamingRetention.SizeDelta)
    assert(sizes.map(_.user_id).sorted.toSeq == Seq(1L, 2L),
      "one size delta per user, second signup emits nothing")
    val credits = out.filter(_.offset >= 0)
    assert(credits.map(d => (d.user_id, d.offset)).sorted.toSeq ==
      Seq((1L, 0), (1L, 1)),
      "offsets credited once each, nothing at or past the horizon")
    assert(out.forall(_.cohort_ts.getTime == monday),
      "cohort is the Monday week start of the first signup")
  }

  test("a purchase arriving before the signup is held pending and credited") {
    val evs = Seq(
      // disorder: the same-week purchase and even a NEXT-week purchase
      // arrive before the signup (all in one batch, sorted by ts — the
      // purchase at t(0,5) genuinely precedes the signup in event time)
      RetentionEvent(3L, t(0, 5), 2),   // same week as the coming signup
      RetentionEvent(3L, t(0, 50), 1),  // signup fixes cohort week 0
      RetentionEvent(3L, t(2, 0), 2))   // offset 2
    val out = StreamingRetention.detect(evs.toDS(), nOffsets = 4).collect()
    val credits = out.filter(_.offset >= 0).map(_.offset).sorted.toSeq
    assert(credits == Seq(0, 2),
      "the pre-signup same-week purchase must credit offset 0 via pending")
  }

  test("ordered delivery: census over the delta stream equals r28") {
    val raw = Tables.events(spark, sf("sf0.001"))
    val typed = StreamingRetention.retentionEvents(raw, col("user_id"),
        col("ts"), col("event_type"), "signup", "purchase")
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.kind, e.user_id))
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[RetentionEvent]
    val q = StreamingRetention.detect(in.toDS(), nOffsets = 4)
      .writeStream.format("memory").queryName("sret_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val deltas = try {
      typed.grouped(500).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      spark.table("sret_agree")
        .as[graft.streaming.RetentionDelta].collect()
    } finally q.stop()
    val live = StreamingRetention.census(deltas.toSeq.toDS().toDF())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val batch = SparkEntry.queries("r28_retention")(spark, sf("sf0.001"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(live.nonEmpty, "sf0.001 must produce retention rows")
    assert(live.toSeq == batch.toSeq,
      "census over ordered streaming deltas must equal the r28 batch matrix")
  }

  test("detectExpiring drops users past the offset horizon; return re-cohorts") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[RetentionEvent]
    val q = StreamingRetention.detectExpiring(in.toDS(), nOffsets = 1,
        watermarkDelayMs = 1000L)
      .writeStream.format("memory").queryName("sret_expire")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(
        RetentionEvent(1L, t(0, 0), 1), RetentionEvent(1L, t(0, 10), 2),
        RetentionEvent(2L, t(0, 0), 1))
      q.processAllAvailable()
      // nOffsets=1 → horizon is maxTs + 1 week + delay; jump 4 weeks out
      in.addData(RetentionEvent(9L, t(4, 0), 1)) // watermark advances
      q.processAllAvailable()
      in.addData(RetentionEvent(8L, t(4, 1), 1)) // timeouts fire
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 2L,
        s"users idle past the offset horizon must drop (state rows: $stateRows)")
      in.addData(RetentionEvent(1L, t(4, 2), 1)) // expired user returns
      q.processAllAvailable()
      val sizes = spark.table("sret_expire").collect()
        .filter(r => r.getLong(2) == 1L &&
          r.getInt(1) == StreamingRetention.SizeDelta)
      assert(sizes.length == 2, "a returning expired user re-enters as a NEW cohort member")
    } finally q.stop()
  }
}
