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
      StrictFunnelEvent(1L, t(0), 1), StrictFunnelEvent(1L, t(10), 2),
      StrictFunnelEvent(1L, t(20), 0), StrictFunnelEvent(1L, t(30), 3),
      // user 2: the uninterrupted chain
      StrictFunnelEvent(2L, t(0), 1), StrictFunnelEvent(2L, t(10), 2),
      StrictFunnelEvent(2L, t(20), 3),
      // user 3: a SECOND view between click and purchase also breaks it
      StrictFunnelEvent(3L, t(0), 1), StrictFunnelEvent(3L, t(10), 2),
      StrictFunnelEvent(3L, t(20), 1), StrictFunnelEvent(3L, t(30), 3))
    val out = StreamingStrictFunnel.detect(evs.toDS(), W).collect()
    def levels(u: Long) = out.filter(_.user_id == u).map(_.level).sorted.toSeq
    assert(levels(1L) == Seq(1, 2), "noise between click and purchase breaks strict order")
    assert(levels(2L) == Seq(1, 2, 3), "uninterrupted chain completes")
    assert(levels(3L) == Seq(1, 2), "a second view intervening also breaks it")
  }

  test("the chain must complete within the window of its anchoring view") {
    val h = 3600L
    val evs = Seq(
      StrictFunnelEvent(7L, t(0), 1),
      StrictFunnelEvent(7L, t(23 * h), 2),
      StrictFunnelEvent(7L, t(25 * h), 3)) // 25 h after the anchor: too late
    val out = StreamingStrictFunnel.detect(evs.toDS(), W).collect()
    assert(out.map(_.level).sorted.toSeq == Seq(1, 2),
      "purchase outside the anchor window must not fire")
  }

  test("streaming micro-batches agree with the batch lag windows and r29") {
    val raw = Tables.events(spark, sf("sf0.001"))
    val typed = StreamingStrictFunnel.strictEvents(raw, col("user_id"),
        col("ts"), col("event_type"), steps)
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.step))
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
        col("ts"), col("event_type"), steps, W)
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
        StrictFunnelEvent(1L, t(0), 1), StrictFunnelEvent(1L, t(1), 2),
        StrictFunnelEvent(1L, t(2), 3), // converted
        StrictFunnelEvent(2L, t(0), 1)) // partial
      q.processAllAvailable()
      in.addData(StrictFunnelEvent(3L, t(10 * h), 1)) // watermark advances
      q.processAllAvailable()
      in.addData(StrictFunnelEvent(4L, t(10 * h + 1), 1)) // timeouts fire
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 2L,
        s"idle users past window+delay must be expired (state rows: $stateRows)")
      in.addData(StrictFunnelEvent(1L, t(10 * h + 2), 1))
      q.processAllAvailable()
      val u1L1 = spark.table("ssfun_expire").collect()
        .count(r => r.getLong(0) == 1L && r.getInt(1) == 1)
      assert(u1L1 == 2, "an expired user re-reports level 1 on return")
    } finally q.stop()
  }
}
