package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{FunnelEvent, StreamingFunnel}

/** Streaming windowed funnel (StreamingFunnel): EXISTS semantics live, a
  * Pareto frontier of partial chains per user, and exact agreement with
  * the independent batch step-join computation on ordered delivery.
  */
class StreamingFunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = 1000L * 60 * 60 * 24 // 24 h, r27's window
  private val steps = Seq("view", "click", "purchase")

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_sfun_$n").toString
  }

  test("EXISTS semantics: a later view anchors the chain the earliest view can't") {
    // earliest view at 0s; click only at +25h (outside ITS window) — but a
    // second view at +24h anchors click(+25h) and purchase(+26h). A
    // greedy earliest-anchor funnel reports level 1; EXISTS reports 3.
    val h = 3600L
    val evs = Seq(
      FunnelEvent(7L, t(0), 1, 1L),
      FunnelEvent(7L, t(24 * h), 1, 2L),
      FunnelEvent(7L, t(25 * h), 2, 3L),
      FunnelEvent(7L, t(26 * h), 3, 4L))
    val out = StreamingFunnel.detect(evs.toDS(), W).collect()
    assert(out.map(_.level).sorted.toSeq == Seq(1, 2, 3))
    assert(out.find(_.level == 3).get.ts == t(26 * h))
  }

  test("chain steps must be strictly ordered and inside the anchor window") {
    // click BEFORE any view never chains; purchase with no level-2 chain
    // in window never fires
    val evs = Seq(
      FunnelEvent(1L, t(10), 2, 1L),
      FunnelEvent(1L, t(20), 1, 2L),
      FunnelEvent(1L, t(30), 3, 3L))
    val out = StreamingFunnel.detect(evs.toDS(), W).collect()
    assert(out.map(_.level).toSeq == Seq(1), s"got ${out.toSeq}")
  }

  test("streaming micro-batches agree with the batch EXISTS joins on real events") {
    val raw = Tables.events(spark, sf("sf0.001"))
    val typed = StreamingFunnel.funnelEvents(raw, col("user_id"), col("ts"),
      col("event_type"), col("event_id"), steps).collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.detect(in.toDS(), W)
      .writeStream.format("memory").queryName("sfun_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val streamed = try {
      typed.grouped(500).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      spark.table("sfun_agree").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2))).toSet
    } finally q.stop()
    val batch = StreamingFunnel.batchTransitions(raw, col("user_id"),
        col("ts"), col("event_type"), col("event_id"), steps, W)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("level"),
        r.getAs[Timestamp]("ts"))).toSet
    assert(streamed == batch,
      "ordered streaming transitions must equal the batch EXISTS joins")
    // and the level census equals r27's report on the same corpus
    val census = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).values
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r27 = SparkEntry.queries("r27_window_funnel")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    census.foreach { case (lvl, cnt) =>
      assert(r27.getOrElse(lvl, 0L) == cnt, s"level $lvl census mismatch")
    }
  }

  test("cross-batch disorder within one window still recovers the level set") {
    val h = 3600L
    // the completing click arrives a batch LATE (event time between the
    // view and the purchase, both already processed): the purchase alone
    // can't fire (no level-2 chain yet), but a following purchase after
    // the late click must — the 2-window frontier prune keeps the view's
    // anchor alive for exactly this arrival
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.detect(in.toDS(), W)
      .writeStream.format("memory").queryName("sfun_disorder")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val levels = try {
      in.addData(FunnelEvent(9L, t(0), 1, 1L), FunnelEvent(9L, t(3 * h), 3, 2L))
      q.processAllAvailable()
      in.addData(FunnelEvent(9L, t(1 * h), 2, 3L)) // late by 2 h, inside the window
      q.processAllAvailable()
      in.addData(FunnelEvent(9L, t(4 * h), 3, 4L)) // fires against the late click
      q.processAllAvailable()
      spark.table("sfun_disorder").collect().map(_.getInt(1)).sorted.toSeq
    } finally q.stop()
    assert(levels == Seq(1, 2, 3),
      s"late click must still chain (got levels $levels)")
  }

  test("detectExpiring: agrees in-horizon, drops state past it, re-admits") {
    // 1-minute window, 1 s watermark delay: u1 converts, u2 stays partial;
    // then traffic 10 h later pushes the watermark far past their
    // maxTs + 2·window horizon — both state rows must vanish (the round-11
    // advice leak), later users' rows must remain, and a returning expired
    // user re-reports level 1 (the documented at-least-once TTL trade)
    val Wm = 60000L
    val h = 3600L
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.detectExpiring(in.toDS(), Wm, 1000L)
      .writeStream.format("memory").queryName("sfun_expire")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(
        FunnelEvent(1L, t(0), 1, 1L), FunnelEvent(1L, t(1), 2, 2L),
        FunnelEvent(1L, t(2), 3, 3L), // u1 converted: state is the integer
        FunnelEvent(2L, t(0), 1, 4L)) // u2 partial: state is a frontier
      q.processAllAvailable()
      val inHorizon = spark.table("sfun_expire").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(inHorizon == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1)),
        "in-horizon transitions must match detect()'s")
      in.addData(FunnelEvent(3L, t(10 * h), 1, 5L)) // advances the watermark
      q.processAllAvailable()
      in.addData(FunnelEvent(4L, t(10 * h + 1), 1, 6L)) // timeouts fire here
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 2L,
        s"u1/u2 must be expired, u3/u4 retained (state rows: $stateRows)")
      // the expired converted user returns: level 1 re-reported
      in.addData(FunnelEvent(1L, t(10 * h + 2), 1, 7L))
      q.processAllAvailable()
      val u1L1 = spark.table("sfun_expire").collect()
        .count(r => r.getLong(0) == 1L && r.getInt(1) == 1)
      assert(u1L1 == 2, "an expired user re-reports level 1 on return")
    } finally q.stop()
  }

  test("funnel arm post-filter count: closed form == brute force at any stop") {
    val users = 7L
    for (n <- Seq(0L, 1L, 5L, 13L, 34L, 35L, 36L, 70L, 99L, 105L, 176L)) {
      val brute = (0L until n).count { v =>
        val r = (v / users) % 5; r == 0 || r == 2 || r == 4
      }
      assert(StreamBench.funnelSourceEvents(n, users) == brute.toLong,
        s"n=$n")
    }
  }

  test("mode split on ties: default chains in (ts, event_id) order, strict_increase refuses") {
    // u1: view and click AT THE SAME microsecond, event_id orders the
    // view first — the family's total order chains them in default mode
    // (exactly r27) but strict_increase needs strictly increasing event
    // time and stops at level 1 (exactly r33). u2 has the ids reversed:
    // no mode may chain. Pre-round-17 the live funnel could not chain
    // ties at all (it had no event_id); this pin is the fix's contract.
    val evs = Seq(
      FunnelEvent(1L, t(0), 1, 1L), FunnelEvent(1L, t(0), 2, 2L),
      FunnelEvent(2L, t(0), 2, 1L), FunnelEvent(2L, t(0), 1, 2L))
    def census(strict: Boolean): Map[Long, Int] =
      StreamingFunnel.detect(evs.toDS(), W, strictIncrease = strict)
        .collect().groupBy(_.user_id).view.mapValues(_.map(_.level).max).toMap
    assert(census(strict = false) == Map(1L -> 2, 2L -> 1),
      "default ties chain by event_id like r27")
    assert(census(strict = true) == Map(1L -> 1, 2L -> 1),
      "strict_increase refuses same-microsecond chains like r33")
    // and the batch twin splits identically
    val raw = evs.toDF()
    def batchCensus(strict: Boolean): Map[Long, Int] = {
      val typed = raw.select(col("user_id"), col("ts"),
        when(col("step") === 1, "view").when(col("step") === 2, "click")
          .otherwise("purchase").as("event_type"), col("event_id"))
      StreamingFunnel.batchTransitions(typed, col("user_id"), col("ts"),
          col("event_type"), col("event_id"), steps, W, strict)
        .collect().groupBy(_.getAs[Long]("user_id")).view
        .mapValues(_.map(_.getAs[Int]("level")).max).toMap
    }
    assert(batchCensus(strict = false) == Map(1L -> 2, 2L -> 1))
    assert(batchCensus(strict = true) == Map(1L -> 1, 2L -> 1))
  }

  test("strict_increase mode: ordered replay agrees with batchTransitions and r33's census") {
    // the r33 live twin (round-16 verdict task 3): same machine, strict
    // comparison — streamed transitions equal the strict batch joins row
    // for row, and the per-user census equals the registered r33 query
    val raw = Tables.events(spark, sf("sf0.001"))
    val typed = StreamingFunnel.funnelEvents(raw, col("user_id"), col("ts"),
      col("event_type"), col("event_id"), steps).collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.detect(in.toDS(), W, strictIncrease = true)
      .writeStream.format("memory").queryName("sfun_strict_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val streamed = try {
      typed.grouped(500).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      spark.table("sfun_strict_agree").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2))).toSet
    } finally q.stop()
    val batch = StreamingFunnel.batchTransitions(raw, col("user_id"),
        col("ts"), col("event_type"), col("event_id"), steps, W,
        strictIncrease = true)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("level"),
        r.getAs[Timestamp]("ts"))).toSet
    assert(streamed == batch,
      "ordered strict-increase transitions must equal the strict batch joins")
    val census = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).values
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r33 = SparkEntry.queries("r33_strict_increase_funnel")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    census.foreach { case (lvl, cnt) =>
      assert(r33.getOrElse(lvl.toLong, 0L) == cnt, s"level $lvl census mismatch vs r33")
    }
  }

  test("state collapses after conversion and frontiers stay window-bounded") {
    val h = 3600L
    // a user who converts immediately, then floods views
    val flood = (0 until 200).map(i =>
      FunnelEvent(5L, t(100 * h + i), 1, 10L + i))
    val evs = Seq(
      FunnelEvent(5L, t(0), 1, 1L), FunnelEvent(5L, t(1), 2, 2L),
      FunnelEvent(5L, t(2), 3, 3L)) ++ flood
    val out = StreamingFunnel.detect(evs.toDS(), W).collect()
    assert(out.map(_.level).sorted.toSeq == Seq(1, 2, 3),
      "no re-emission after conversion, whatever arrives later")
  }
}
