package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{FunnelEvent, StreamingDedupFunnelCH, StreamingFunnel,
  StreamingDedupFunnel, StrictFunnelEvent}

/** The ClickHouse-true funnel pair LIVE (round 17): r37's strict_order
  * twin (the default frontier machine with the break flag) and r38's
  * strict_deduplication twin (the literal scan with emit-on-resolution),
  * pinned against their registered batch queries and the modes'
  * discriminator corpora.
  */
class StreamingFunnelCHSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = 1000L * 60 * 60 * 24 // 24 h, the family window
  private val steps = Seq("view", "click", "purchase")

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_fch_$n").toString
  }

  private def fe(u: Long, sec: Long, step: Int, id: Long) =
    FunnelEvent(u, t(sec), step, id)
  private def se(u: Long, sec: Long, step: Int, id: Long) =
    StrictFunnelEvent(u, t(sec), step, id)

  test("strict-order CH: in-family interveners pass, a breaker stops the whole scan") {
    val h = 3600L
    val evs = Seq(
      // u1: view,click,view,purchase — the second view matches condition
      // 1 and passes; level 3 (the divergence corpus vs the repo's
      // strict-order twin, which stops at 2)
      fe(1L, 0, 1, 1), fe(1L, 10, 2, 2), fe(1L, 20, 1, 3), fe(1L, 30, 3, 4),
      // u2: A,B,D,C — the condition-less D (step 0) stops the scan at
      // level 2, and the LATER full chain must not revive it
      fe(2L, 0, 1, 1), fe(2L, 10, 2, 2), fe(2L, 20, 0, 3), fe(2L, 30, 3, 4),
      fe(2L, 40, 1, 5), fe(2L, 50, 2, 6), fe(2L, 60, 3, 7),
      // u3: a breaker BEFORE any anchor is skipped; the chain completes
      fe(3L, 0, 0, 1), fe(3L, 10, 1, 2), fe(3L, 20, 2, 3), fe(3L, 30, 3, 4),
      // u4: anchor renewal still works pre-break (EXISTS over anchors)
      fe(4L, 0, 1, 1), fe(4L, 24 * h, 1, 2), fe(4L, 25 * h, 2, 3),
      fe(4L, 26 * h, 3, 4),
      // u5: V,P,C — the purchase arrives with the click slot unwritten:
      // the SKIP-LEVEL termination (round-18 ADVICE) freezes the scan
      // at level 1; the later click must not raise it
      fe(5L, 0, 1, 1), fe(5L, 10, 3, 2), fe(5L, 20, 2, 3),
      // u6: a purchase BEFORE any anchor is skipped (first_event is
      // false), and the later clean chain completes
      fe(6L, 0, 3, 1), fe(6L, 10, 1, 2), fe(6L, 20, 2, 3),
      fe(6L, 30, 3, 4),
      // u7: V,P,C,P + a later clean chain — dead stays dead after the
      // skip-level stop, exactly like u2's condition-less stop
      fe(7L, 0, 1, 1), fe(7L, 10, 3, 2), fe(7L, 20, 2, 3),
      fe(7L, 30, 3, 4), fe(7L, 40, 1, 5), fe(7L, 50, 2, 6),
      fe(7L, 60, 3, 7))
    val got = StreamingFunnel.detectStrictOrderCH(evs.toDS(), W)
      .collect().groupBy(_.user_id).view.mapValues(_.map(_.level).max).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 3, 4L -> 3, 5L -> 1,
      6L -> 3, 7L -> 1))
  }

  test("strict-order CH: ordered replay censuses to the registered r37 query") {
    val dir = sf("sf0.001")
    val raw = Tables.events(spark, dir)
    val typed = StreamingFunnel.funnelEventsAll(raw, col("user_id"),
      col("ts"), col("event_type"), col("event_id"), steps)
    // batch execution of the identical group function (the family's
    // agreement shortcut): per-user max transition == pre-break default
    // level == r37's level, and users with no transitions are level 0
    val live = StreamingFunnel.detectStrictOrderCH(typed, W)
      .collect().groupBy(_.user_id).view.mapValues(_.map(_.level).max).toMap
    val universe = raw.select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val census = universe.toSeq.map(u => live.getOrElse(u, 0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r37 = SparkEntry.queries("r37_strict_order_ch")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    census.foreach { case (lvl, cnt) =>
      assert(r37.getOrElse(lvl.toLong, 0L) == cnt,
        s"level $lvl census mismatch vs r37")
    }
  }

  test("strict-dedup CH: the literal discriminators resolve as the scan does") {
    val h = 3600L
    def resolve(evs: Seq[StrictFunnelEvent]): Map[Long, (Int, String)] =
      StreamingDedupFunnelCH.detect(evs.toDS(), W)
        .collect().map(r => r.user_id -> (r.level, r.via)).toMap
    // V,C,C: the second click repeats held condition 2 — the literal
    // event_index − 1 = 1, BELOW the level-2 chain already achieved
    assert(resolve(Seq(se(1L, 0, 1, 1), se(1L, 10, 2, 2), se(1L, 20, 2, 3)))
      == Map(1L -> (1, "repeat")))
    // V,C,P,C: completion fires before the later repeat is scanned
    assert(resolve(Seq(se(2L, 0, 1, 1), se(2L, 10, 2, 2), se(2L, 20, 3, 3),
      se(2L, 30, 2, 4))) == Map(2L -> (3, "complete")))
    // V,C,V,C: the second view re-anchors (views never terminate), the
    // second click is still the repeat
    assert(resolve(Seq(se(3L, 0, 1, 1), se(3L, 10, 2, 2), se(3L, 20, 1, 3),
      se(3L, 30, 2, 4))) == Map(3L -> (1, "repeat")))
    // the window gates slot writes: an out-of-window click writes no
    // slot, so the next click chains from the re-anchoring view instead
    // of terminating — no resolution under NoTimeout (pending at 2)
    assert(resolve(Seq(se(4L, 0, 1, 1), se(4L, 25 * h, 2, 2),
      se(4L, 26 * h, 1, 3), se(4L, 27 * h, 2, 4))).isEmpty)
  }

  test("strict-dedup CH: expiring replay + flush censuses to the registered r38 query") {
    val dir = sf("sf0.001")
    val raw = Tables.events(spark, dir)
    val typed = StreamingDedupFunnel.dedupEvents(raw, col("user_id"),
      col("ts"), col("event_type"), col("event_id"), steps).collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StrictFunnelEvent]
    // the watermark delay must exceed the corpus's event-time span: the
    // batch scan never forgets, so NO user may expire (and restart their
    // scan at a provisional flush) before the deliberate end-of-replay
    // flush — a 1 s delay silently re-admitted users idle > window and
    // diverged three users from r38 when this spec was first written
    val tsUs = typed.map(e => graft.streaming.SequenceEngine.micros(e.ts))
    val spanMs = (tsUs.max - tsUs.min) / 1000L + W
    val q = StreamingDedupFunnelCH.detectExpiring(in.toDS(), W, spanMs)
      .writeStream.format("memory").queryName("fch_dedup_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val flushUser = -1L
    val resolved = try {
      typed.grouped(500).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      // far-future traffic pushes the watermark past every horizon
      // (maxTs + window + span-delay), firing every pending flush
      val far = tsUs.max / 1000L + 2 * spanMs + 2 * W
      in.addData(StrictFunnelEvent(flushUser, new Timestamp(far), 1, 1L))
      q.processAllAvailable()
      in.addData(StrictFunnelEvent(flushUser, new Timestamp(far + 1), 1, 2L))
      q.processAllAvailable()
      spark.table("fch_dedup_agree").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
    } finally q.stop()
    val live = resolved - flushUser
    // census over the full user universe (users with no condition events
    // never enter the machine: level 0)
    val universe = raw.select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val census = universe.toSeq.map(u => live.getOrElse(u, 0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r38 = SparkEntry.queries("r38_strict_dedup_ch")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    census.foreach { case (lvl, cnt) =>
      assert(r38.getOrElse(lvl.toLong, 0L) == cnt,
        s"level $lvl census mismatch vs r38")
    }
  }
}
