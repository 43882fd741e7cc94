package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingDedupFunnel, StrictFunnelEvent}

/** Streaming dedup-strict windowed funnel (StreamingDedupFunnel, r31's
  * live form): a repeated held condition interrupts the single live
  * chain, unrelated events pass, state is five numbers, and ordered
  * delivery agrees with r31's census.
  */
class StreamingDedupFunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = 1000L * 60 * 60 * 24 // 24 h, r31's window
  private val steps = Seq("view", "click", "purchase")

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_sdfun_$n").toString
  }

  test("a repeated HELD condition interrupts; unrelated events pass") {
    val evs = Seq(
      // u1: V C C P — the second click kills the chain at level 2
      StrictFunnelEvent(1L, t(0), 1, 1), StrictFunnelEvent(1L, t(10), 2, 2),
      StrictFunnelEvent(1L, t(20), 2, 3), StrictFunnelEvent(1L, t(30), 3, 4),
      // u2: V [signup dropped upstream] C P — unrelated types pass: level 3
      StrictFunnelEvent(2L, t(0), 1, 5), StrictFunnelEvent(2L, t(20), 2, 6),
      StrictFunnelEvent(2L, t(30), 3, 7),
      // u3: V V C P — the second view re-anchors, chain completes: 3
      StrictFunnelEvent(3L, t(0), 1, 8), StrictFunnelEvent(3L, t(10), 1, 9),
      StrictFunnelEvent(3L, t(20), 2, 10), StrictFunnelEvent(3L, t(30), 3, 11),
      // u4: V C V P — the view between click and purchase interrupts: 2
      StrictFunnelEvent(4L, t(0), 1, 12), StrictFunnelEvent(4L, t(10), 2, 13),
      StrictFunnelEvent(4L, t(20), 1, 14), StrictFunnelEvent(4L, t(30), 3, 15))
    val out = StreamingDedupFunnel.detect(evs.toDS(), W).collect()
    def lv(u: Long) = out.filter(_.user_id == u).map(_.level).sorted.toSeq
    assert(lv(1L) == Seq(1, 2), "second click (held condition) interrupts")
    assert(lv(2L) == Seq(1, 2, 3), "non-condition events never interrupt")
    assert(lv(3L) == Seq(1, 2, 3), "a second view re-anchors, not kills the user")
    assert(lv(4L) == Seq(1, 2), "a view between click and purchase interrupts")
  }

  test("window discipline: the chain must complete within the anchor window") {
    val h = 3600L
    val evs = Seq(
      StrictFunnelEvent(7L, t(0), 1, 1),
      StrictFunnelEvent(7L, t(23 * h), 2, 2),
      StrictFunnelEvent(7L, t(25 * h), 3, 3)) // 25 h after the anchor
    val out = StreamingDedupFunnel.detect(evs.toDS(), W).collect()
    assert(out.map(_.level).sorted.toSeq == Seq(1, 2),
      "a purchase outside the anchor window must not fire")
  }

  test("ordered delivery: the furthest-level census equals r31") {
    val dir = sf("sf0.001")
    val raw = Tables.events(spark, dir)
    val typed = StreamingDedupFunnel.dedupEvents(raw, col("user_id"),
        col("ts"), col("event_type"), col("event_id"), steps)
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StrictFunnelEvent]
    val q = StreamingDedupFunnel.detect(in.toDS(), W)
      .writeStream.format("memory").queryName("sdfun_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val streamed = try {
      typed.grouped(500).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      spark.table("sdfun_agree").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
    } finally q.stop()
    val census = streamed.groupBy(_._1).view.mapValues(_.map(_._2).max)
      .values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r31 = SparkEntry.queries("r31_dedup_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    census.foreach { case (lvl, cnt) =>
      assert(r31.getOrElse(lvl.toLong, 0L) == cnt, s"level $lvl census mismatch")
    }
    val nUsers = raw.select(col("user_id")).distinct().count()
    assert(r31.values.sum == nUsers, "r31 censuses every user incl. level 0")
  }
}
