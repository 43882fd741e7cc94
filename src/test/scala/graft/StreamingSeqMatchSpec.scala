package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SequenceMatch
import graft.operators.SequenceMatch._
import graft.streaming.{PatternEvent, StreamingSeqMatch}

/** Streaming sequenceMatch (StreamingSeqMatch, the live form of r32's
  * pattern engine): on ordered delivery the hit set equals the batch
  * matchesPerUser matched-user set for EVERY gap kind; chains and
  * adjacency survive micro-batch boundaries; hits emit at most once;
  * state is constant per user.
  */
class StreamingSeqMatchSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_ssm_$n").toString
  }

  private def et(s: String) = col("event_type") === s

  /** r32's five patterns — the live engine must agree on all of them. */
  private val patterns: Seq[(String, Pattern)] = Seq(
    "p1_vcp_any" -> Pattern(
      Seq(et("view"), et("click"), et("purchase")), Seq(AnyGap, AnyGap)),
    "p2_vc_within_1h" -> Pattern(
      Seq(et("view"), et("click")), Seq(Within(3600L))),
    "p3_sp_within_24h" -> Pattern(
      Seq(et("signup"), et("purchase")), Seq(Within(86400L))),
    "p4_vc_adjacent" -> Pattern(
      Seq(et("view"), et("click")), Seq(Adjacent)),
    "p5_vp_after_1h" -> Pattern(
      Seq(et("view"), et("purchase")), Seq(AtLeast(3600L))))

  test("ordered replay: hit users == batch matchesPerUser for every gap kind") {
    val dir = sf("sf0.001")
    val raw = Tables.events(spark, dir)
    val batchInput = raw.select(col("user_id"), col("event_type"),
      col("event_id"), unix_micros(col("ts")).as("tsu"))
    patterns.foreach { case (name, p) =>
      val typed = StreamingSeqMatch.patternEvents(raw, col("user_id"),
          col("ts"), col("event_id"), p.steps)
        .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[PatternEvent]
      val q = StreamingSeqMatch.detect(in.toDS(), p.gaps)
        .writeStream.format("memory").queryName(s"ssm_$name")
        .outputMode("append").option("checkpointLocation", tmp()).start()
      val hits = try {
        typed.grouped(400).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
        spark.table(s"ssm_$name").as[graft.streaming.PatternHit].collect()
      } finally q.stop()
      val live = hits.map(_.user_id).toSet
      assert(hits.length == live.size, s"$name: at most one hit per user")
      val want = SequenceMatch.matchesPerUser(batchInput, "user_id", "tsu",
          "event_id", p)
        .filter(col("matched")).collect().map(_.getLong(0)).toSet
      assert(live == want, s"$name: live hit set must equal the batch census")
    }
  }

  test("chains and adjacency survive micro-batch boundaries") {
    // pattern view -> click ADJACENT in the filtered subsequence; the
    // view arrives one batch before its click, with a non-pattern event
    // between them in event time (dropped by the codegen filter)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PatternEvent]
    // masks: view = 1, click = 2
    val q = StreamingSeqMatch.detect(in.toDS(), Seq(Adjacent))
      .writeStream.format("memory").queryName("ssm_xbatch")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(PatternEvent(1L, t(0), 1, 1))   // view, batch 1
      q.processAllAvailable()
      in.addData(PatternEvent(1L, t(10), 2, 2))  // click, batch 2 — adjacent
      q.processAllAvailable()
      in.addData(PatternEvent(2L, t(0), 2, 3))   // click first: no chain
      q.processAllAvailable()
      in.addData(PatternEvent(2L, t(10), 2, 4),  // another click breaks
        PatternEvent(2L, t(20), 1, 5))           // view arrives too late
      q.processAllAvailable()
      val hits = spark.table("ssm_xbatch").as[graft.streaming.PatternHit]
        .collect()
      assert(hits.map(_.user_id).toSeq == Seq(1L) && hits.head.ts == t(10),
        "the cross-batch adjacent pair must match; user 2 never does")
    } finally q.stop()
  }

  test("Within bound is inclusive and judged against the running max anchor") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PatternEvent]
    val q = StreamingSeqMatch.detect(in.toDS(), Seq(Within(100L)))
      .writeStream.format("memory").queryName("ssm_within")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      // u1: anchor renewal across batches — first anchor too old, the
      // second (in a later batch) carries the chain
      in.addData(PatternEvent(1L, t(0), 1, 1))
      q.processAllAvailable()
      in.addData(PatternEvent(1L, t(80), 1, 2))
      q.processAllAvailable()
      in.addData(PatternEvent(1L, t(150), 2, 3)) // 150-80=70 <= 100: hit
      // u2: exactly at the bound — inclusive
      in.addData(PatternEvent(2L, t(0), 1, 4), PatternEvent(2L, t(100), 2, 5))
      // u3: one second past the bound — no hit
      in.addData(PatternEvent(3L, t(0), 1, 6), PatternEvent(3L, t(101), 2, 7))
      q.processAllAvailable()
      val hits = spark.table("ssm_within").as[graft.streaming.PatternHit]
        .collect().map(_.user_id).toSet
      assert(hits == Set(1L, 2L))
    } finally q.stop()
  }

  test("expiry forgets partial chains; state stays one row per user") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PatternEvent]
    val q = StreamingSeqMatch.detectExpiring(in.toDS(), Seq(Within(3600L)),
        watermarkDelayMs = 1000L)
      .writeStream.format("memory").queryName("ssm_expire")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(PatternEvent(1L, t(0), 1, 1)) // open anchor, never completed
      q.processAllAvailable()
      in.addData(PatternEvent(2L, t(7200), 1, 2)) // watermark advances 2 h
      q.processAllAvailable()
      in.addData(PatternEvent(3L, t(7201), 1, 3)) // timeout sweep: u1 drops
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 2L, s"idle user must drop (state rows: $stateRows)")
      // u1 returns with a bare click: the old anchor is gone — no hit
      in.addData(PatternEvent(1L, t(7202), 2, 4))
      q.processAllAvailable()
      assert(spark.table("ssm_expire").isEmpty,
        "a forgotten anchor must not complete after expiry")
    } finally q.stop()
  }
}
