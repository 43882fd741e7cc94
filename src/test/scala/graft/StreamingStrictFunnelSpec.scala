package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingStrictFunnel, StrictFunnelEvent}

/** Streaming STRICT-ORDER windowed funnel (StreamingStrictFunnel, r29's
  * live form): any intervening event breaks the chain, state is six
  * numbers per user, and ordered delivery agrees with the independent
  * batch lag-window computation row for row.
  */
class StreamingStrictFunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = 1000L * 60 * 60 * 24 // 24 h, r29's window
  private val steps = Seq("view", "click", "purchase")

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_ssfun_$n").toString
  }

  test("an intervening event of ANY type breaks the chain (A->B->D->C)") {
    val evs = Seq(
      // user 1: view, click, NOISE, purchase — the noise kills level 3
      StrictFunnelEvent(1L, t(0), 1, 1L), StrictFunnelEvent(1L, t(10), 2, 2L),
      StrictFunnelEvent(1L, t(20), 0, 3L), StrictFunnelEvent(1L, t(30), 3, 4L),
      // user 2: the uninterrupted chain
      StrictFunnelEvent(2L, t(0), 1, 5L), StrictFunnelEvent(2L, t(10), 2, 6L),
      StrictFunnelEvent(2L, t(20), 3, 7L),
      // user 3: a SECOND view between click and purchase also breaks it
      StrictFunnelEvent(3L, t(0), 1, 8L), StrictFunnelEvent(3L, t(10), 2, 9L),
      StrictFunnelEvent(3L, t(20), 1, 10L), StrictFunnelEvent(3L, t(30), 3, 11L))
    val out = StreamingStrictFunnel.detect(evs.toDS(), W).collect()
    def levels(u: Long) = out.filter(_.user_id == u).map(_.level).sorted.toSeq
    assert(levels(1L) == Seq(1, 2), "noise between click and purchase breaks strict order")
    assert(levels(2L) == Seq(1, 2, 3), "uninterrupted chain completes")
    assert(levels(3L) == Seq(1, 2), "a second view intervening also breaks it")
  }

  test("the chain must complete within the window of its anchoring view") {
    val h = 3600L
    val evs = Seq(
      StrictFunnelEvent(7L, t(0), 1, 12L),
      StrictFunnelEvent(7L, t(23 * h), 2, 13L),
      StrictFunnelEvent(7L, t(25 * h), 3, 14L)) // 25 h after the anchor: too late
    val out = StreamingStrictFunnel.detect(evs.toDS(), W).collect()
    assert(out.map(_.level).sorted.toSeq == Seq(1, 2),
      "purchase outside the anchor window must not fire")
  }

  test("same-microsecond ties resolve by event_id in BOTH forms (round-12 advice)") {
    // user 9: view@t0, then purchase(id 21) and click(id 22) at the SAME
    // timestamp t10. The shared (ts, event_id) order sequences purchase
    // BEFORE click — view, purchase, click — so the chain never completes
    // (purchase's predecessor is the view, the click's is the purchase).
    // The former (ts, step) streaming sort would have sequenced
    // view, click, purchase and claimed level 3: this corpus discriminates
    // the two orders, and streaming and batch must agree on it.
    val evs = Seq(
      StrictFunnelEvent(9L, t(0), 1, 20L),
      StrictFunnelEvent(9L, t(10), 3, 21L),
      StrictFunnelEvent(9L, t(10), 2, 22L))
    val streamed = StreamingStrictFunnel.detect(evs.toDS(), W).collect()
      .map(_.level).sorted.toSeq
    assert(streamed == Seq(1),
      "(ts, event_id) order: the tied purchase precedes the click, no chain")
    val raw = evs.toDF()
      .select(col("user_id"), col("ts"),
        element_at(array(lit("noise"), lit("view"), lit("click"),
          lit("purchase")), col("step") + 1).as("event_type"),
        col("event_id"))
    val batch = StreamingStrictFunnel.batchTransitions(raw, col("user_id"),
        col("ts"), col("event_type"), col("event_id"), steps, W)
      .collect().map(_.getAs[Int]("level")).sorted.toSeq
    assert(batch == Seq(1), "batch lag windows share the (ts, event_id) order")
  }

  test("streaming micro-batches agree with the batch lag windows and r29") {
    val raw = Tables.events(spark, sf("sf0.001"))
    val typed = StreamingStrictFunnel.strictEvents(raw, col("user_id"),
        col("ts"), col("event_type"), col("event_id"), steps)
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StrictFunnelEvent]
    val q = StreamingStrictFunnel.detect(in.toDS(), W)
      .writeStream.format("memory").queryName("ssfun_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val streamed = try {
      typed.grouped(500).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      spark.table("ssfun_agree").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2))).toSet
    } finally q.stop()
    val batch = StreamingStrictFunnel.batchTransitions(raw, col("user_id"),
        col("ts"), col("event_type"), col("event_id"), steps, W)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("level"),
        r.getAs[Timestamp]("ts"))).toSet
    assert(streamed == batch,
      "ordered streaming transitions must equal the batch lag windows")
    // and the furthest-level census equals r29's report — r29 counts
    // level-0 users too, so compare on levels >= 1 and pin the user total
    val census = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).values
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r29 = SparkEntry.queries("r29_strict_funnel")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    census.foreach { case (lvl, cnt) =>
      assert(r29.getOrElse(lvl.toLong, 0L) == cnt, s"level $lvl census mismatch")
    }
    val nUsers = raw.select(col("user_id")).distinct().count()
    assert(r29.values.sum == nUsers, "r29 censuses every user incl. level 0")
  }

  test("detectExpiring drops idle users losslessly and re-admits") {
    val Wm = 60000L // 1-minute window
    val h = 3600L
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StrictFunnelEvent]
    val q = StreamingStrictFunnel.detectExpiring(in.toDS(), Wm, 1000L)
      .writeStream.format("memory").queryName("ssfun_expire")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(
        StrictFunnelEvent(1L, t(0), 1, 15L), StrictFunnelEvent(1L, t(1), 2, 16L),
        StrictFunnelEvent(1L, t(2), 3, 17L), // converted
        StrictFunnelEvent(2L, t(0), 1, 18L)) // partial
      q.processAllAvailable()
      in.addData(StrictFunnelEvent(3L, t(10 * h), 1, 19L)) // watermark advances
      q.processAllAvailable()
      in.addData(StrictFunnelEvent(4L, t(10 * h + 1), 1, 20L)) // timeouts fire
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 2L,
        s"idle users past window+delay must be expired (state rows: $stateRows)")
      in.addData(StrictFunnelEvent(1L, t(10 * h + 2), 1, 21L))
      q.processAllAvailable()
      val u1L1 = spark.table("ssfun_expire").collect()
        .count(r => r.getLong(0) == 1L && r.getInt(1) == 1)
      assert(u1L1 == 2, "an expired user re-reports level 1 on return")
    } finally q.stop()
  }
}
