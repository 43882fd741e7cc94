package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** One event entering the live funnel: `step` is the 1-based position of
  * the event's type in the funnel sequence (events of non-funnel types are
  * filtered out before the stateful stage); `event_id` is the family's
  * deterministic tie-breaker — since round 17 the funnel sequences by the
  * SAME (ts, event_id) total order as r27/r33 and the strict/dedup live
  * forms, so same-microsecond ties resolve identically everywhere (the
  * pre-17 form sorted by (ts, step) and could not chain ties at all).
  */
case class FunnelEvent(user_id: Long, ts: Timestamp, step: Int,
                       event_id: Long)

/** A chain of completed funnel steps: `anchor` is the epoch-MICROSECOND
  * timestamp of its step-1 event (the whole chain must complete within the
  * window of this anchor), (`last`, `lastId`) the (µs, event_id) sequence
  * position of its furthest completed step. Microseconds, not millis:
  * event time carries µs precision and the batch twin's joins compare at
  * full precision — a ms-truncated state would disagree on
  * same-millisecond step pairs. `lastId` makes the default mode's
  * tie-chaining exact: a step at the SAME microsecond chains iff the
  * family order places it after the chain's last step.
  */
case class FunnelChain(anchor: Long, last: Long, lastId: Long)

/** Per-user funnel state: the Pareto frontiers of chains that completed
  * step 1 (`f1`) and step 2 (`f2`) — an entry is kept only if no other
  * chain has BOTH a fresher anchor and an earlier last step (such a chain
  * can extend strictly more future events, so the dominated one is dead
  * weight) — plus the furthest level already reported and the max event
  * time seen. Once a user converts (reached = 3) both frontiers clear:
  * levels only ever increase, so nothing further can emit. `dead` is the
  * strict-order-CH profile's stopped-scan flag (a condition-less event
  * arrived after the first anchor — see [[StreamingFunnel.Machine]]);
  * always false in the default/strict-increase modes.
  */
case class FunnelUserState(f1: Seq[FunnelChain], f2: Seq[FunnelChain],
                           reached: Int, maxTs: Long,
                           dead: Boolean = false)

/** A user's furthest-funnel-level increase: emitted once per level, carrying
  * the event time of the step that completed it.
  */
case class FunnelTransition(user_id: Long, level: Int, ts: Timestamp)

/** Streaming windowed funnel — r27's ClickHouse-windowFunnel shape LIVE,
  * and (round 17) r33's `strict_increase` as the same machine's mode
  * knob: per user, emit a transition the moment the furthest
  * step-1 → step-2 → step-3 chain completing within `windowMs` of its
  * anchoring step-1 event reaches a new level. Same EXISTS semantics as
  * the batch query (ANY step-1 event may anchor a chain, not just the
  * earliest/latest), via a Pareto frontier per partial level instead of
  * the batch side's step joins.
  *
  * The mode knob is ONLY a comparison: the default mode chains a step
  * that follows the chain's last step in the family's (ts, event_id)
  * order (same-microsecond ties chain, exactly r27), while
  * `strictIncrease = true` requires strictly increasing EVENT TIME
  * (same-microsecond pairs refuse, exactly r33) — the live counterpart
  * of the batch engine's ROWS-vs-RANGE frame split. On tie-free corpora
  * the two are identical.
  *
  * Agreement (pinned by StreamingFunnelSpec): for event-time-ordered
  * delivery the transition stream equals [[batchTransitions]] — the
  * r27/r33-style EXISTS joins reporting each level's minimal completion
  * time — row for row, in BOTH modes, including tie corpora; and the
  * per-user census agrees with r27 / r33. Dominance makes the frontier
  * lossless for every FUTURE event: if chain A has anchor ≥ chain B's
  * and an earlier-or-equal sequence position, any event B could extend,
  * A extends too.
  *
  * Disorder contract (one-directional, like every arrival-evaluated
  * stateful operator): a late COMPLETING step still chains — frontiers
  * window-prune at `maxTs − 2·windowMs` (not `− windowMs`), so an event
  * arriving up to one full window late finds every anchor it could
  * legally extend. A late EARLIER step (a view or click arriving after a
  * later-step event was already evaluated) does NOT retroactively
  * re-evaluate that event — steps 2/3 are not retained as state — so the
  * level set can undercount in that direction; events are judged on
  * arrival, the standard streaming contract.
  *
  * Scale shape: state is per-user O(frontier within 2 windows) — the
  * chains inside a user's active funnel window, NOT the user's history —
  * and collapses to a single integer after conversion; the stateful stage
  * keys on user_id, the natural co-partitioning of every funnel system.
  * Since round 17 an instance of [[SequenceEngine]] — the sort, timeout,
  * horizon and emit plumbing are the family's shared core.
  */
object StreamingFunnel {

  /** Funnel depth — the committed shape is the 3-step view→click→purchase
    * sequence r27 reports on.
    */
  val Steps = 3

  /** Project a raw events frame into the funnel's typed input, mapping
    * `steps(i)` (event-type names, length [[Steps]]) to step i+1 and
    * dropping non-funnel types before the stateful stage.
    */
  def funnelEvents(events: DataFrame, userCol: Column, tsCol: Column,
                   typeCol: Column, idCol: Column,
                   steps: Seq[String]): Dataset[FunnelEvent] = {
    require(steps.length == Steps, s"funnel is $Steps steps")
    implicit val enc: Encoder[FunnelEvent] = Encoders.product[FunnelEvent]
    val idx = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (t, i)) =>
      when(typeCol === t, lit(i + 1)).otherwise(acc)
    }
    events.select(userCol.as("user_id"), tsCol.as("ts"), idx.as("step"),
        idCol.cast("long").as("event_id"))
      .filter(col("step") > 0)
      .as[FunnelEvent]
  }

  /** The funnel fold as a [[SequenceEngine.Machine]] — the
    * default/strict-increase knob lives entirely in [[before]], and
    * `breakOnNonStep` turns the SAME frontier machine into the
    * ClickHouse-true strict_order scan (r37's live twin), with BOTH of
    * the published terminations: step-0 events (condition-less, kept by
    * [[StreamingFunnel.funnelEventsAll]]) stop the user's whole scan
    * the first time one arrives after an anchor — exactly the published
    * `if (first_event) break` — and (round-18 ADVICE fix) a step-j
    * event (j ≥ 3) arriving with the level-(j−1) slot never written
    * freezes the scan at the contiguous level, exactly the published
    * skip-level `return first-unfilled-slot` branch. In both cases the
    * frontiers clear and the `dead` flag suppresses every later event.
    * "An anchor has been seen" is `reached ≥ 1` (any step-1 event
    * raises it immediately), and `reached` IS the written-slot count
    * (it advances exactly on window-valid chain writes), so neither
    * rule needs extra state.
    */
  private[streaming] final class Machine(windowMs: Long,
                                         strictIncrease: Boolean,
                                         breakOnNonStep: Boolean = false)
    extends SequenceEngine.Machine[FunnelEvent, FunnelUserState,
      FunnelTransition] {

    private val windowUs = windowMs * 1000L

    override def init: FunnelUserState =
      FunnelUserState(Nil, Nil, 0, Long.MinValue)
    override def eventTimeUs(e: FunnelEvent): Long =
      SequenceEngine.micros(e.ts)
    override def tie(e: FunnelEvent): Long = e.event_id

    /** May an event at sequence position (t, id) extend chain `c`?
      * Default: after it in (ts, event_id) order; strict_increase:
      * strictly later in event time.
      */
    private def before(c: FunnelChain, t: Long, id: Long): Boolean =
      if (strictIncrease) c.last < t
      else c.last < t || (c.last == t && c.lastId < id)

    /** Frontier insert with Pareto pruning (maximize anchor, minimize
      * the (last, lastId) sequence position). Skips the insert when an
      * existing chain dominates the candidate; evicts chains the
      * candidate dominates. Lex position is the right dominance key in
      * both modes: equal-time chains extend identical futures under
      * strict_increase, so preferring the smaller lastId stays lossless.
      */
    private def insert(f: Seq[FunnelChain], c: FunnelChain): Seq[FunnelChain] =
      if (f.exists(e => e.anchor >= c.anchor &&
        (e.last < c.last || (e.last == c.last && e.lastId <= c.lastId)))) f
      else f.filterNot(e => e.anchor <= c.anchor &&
        (e.last > c.last || (e.last == c.last && e.lastId >= c.lastId))) :+ c

    override def onEvent(user: Long, e: FunnelEvent, st: FunnelUserState,
                         out: ArrayBuffer[FunnelTransition])
      : FunnelUserState = {
      val t = SequenceEngine.micros(e.ts)
      if (st.dead || st.reached >= Steps)
        return st.copy(maxTs = math.max(st.maxTs, t))
      if (e.step == 0) {
        // only reachable through funnelEventsAll (the strict-order-CH
        // profile): a condition-less event — before the first anchor it
        // is skipped, after one it stops the scan
        return if (breakOnNonStep && st.reached >= 1)
          FunnelUserState(Nil, Nil, st.reached,
            math.max(st.maxTs, t), dead = true)
        else st.copy(maxTs = math.max(st.maxTs, t))
      }
      // strict-order-CH's SECOND termination (round-18 ADVICE fix): a
      // step-j event (j ≥ 3) arriving after the first anchor with the
      // level-(j−1) slot never written (reached < j−1 — `reached` IS the
      // contiguous slot count, since it advances exactly on window-valid
      // chain writes) freezes the scan at the pre-row contiguous level,
      // exactly the shipped `strict_order && first_event &&
      // !events_timestamp[event_idx - 1].has_value()` branch. Step-2
      // events can never trigger it: reached ≥ 1 is slot 1 itself.
      if (breakOnNonStep && st.reached >= 1 && st.reached < e.step - 1)
        return FunnelUserState(Nil, Nil, st.reached,
          math.max(st.maxTs, t), dead = true)
      var f1 = st.f1
      var f2 = st.f2
      var reached = st.reached
      e.step match {
        case 1 =>
          f1 = insert(f1, FunnelChain(t, t, e.event_id))
          if (reached < 1) { reached = 1; out += FunnelTransition(user, 1, e.ts) }
        case 2 =>
          // extend the freshest-anchored level-1 chain that admits this
          // event: after its last step in the mode's order, within the
          // window of its anchor
          val cand = f1.filter(c =>
            before(c, t, e.event_id) && c.anchor >= t - windowUs)
          if (cand.nonEmpty) {
            f2 = insert(f2, FunnelChain(cand.map(_.anchor).max, t, e.event_id))
            if (reached < 2) { reached = 2; out += FunnelTransition(user, 2, e.ts) }
          }
        case _ =>
          if (f2.exists(c =>
            before(c, t, e.event_id) && c.anchor >= t - windowUs)) {
            reached = Steps
            out += FunnelTransition(user, Steps, e.ts)
          }
      }
      val mx = math.max(st.maxTs, t)
      if (reached >= Steps) { f1 = Nil; f2 = Nil }
      else {
        // 2-window prune: keeps every anchor an event up to one full
        // window LATE could still legally chain to (see scaladoc)
        f1 = f1.filter(_.anchor >= mx - 2 * windowUs)
        f2 = f2.filter(_.anchor >= mx - 2 * windowUs)
      }
      FunnelUserState(f1, f2, reached, mx)
    }

    /** Once the watermark passes maxTs + 2·window nothing in this user's
      * frontiers can legally extend (the 2-window prune already emptied
      * them) — dropping a non-converted user's state cannot change any
      * future in-contract output.
      */
    override def horizonMs(st: FunnelUserState, delayMs: Long): Long =
      st.maxTs / 1000L + 2 * windowMs + 1
  }

  /** [[funnelEvents]] WITHOUT the step-0 filter — the strict-order-CH
    * profile's projection: condition-less events are exactly what that
    * mode's break rule is about, so they must cross the shuffle (the
    * same all-rows contract as [[StreamingStrictFunnel.strictEvents]]).
    */
  def funnelEventsAll(events: DataFrame, userCol: Column, tsCol: Column,
                      typeCol: Column, idCol: Column,
                      steps: Seq[String]): Dataset[FunnelEvent] = {
    require(steps.length == Steps, s"funnel is $Steps steps")
    implicit val enc: Encoder[FunnelEvent] = Encoders.product[FunnelEvent]
    val idx = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (t, i)) =>
      when(typeCol === t, lit(i + 1)).otherwise(acc)
    }
    events.select(userCol.as("user_id"), tsCol.as("ts"), idx.as("step"),
        idCol.cast("long").as("event_id"))
      .as[FunnelEvent]
  }

  /** ClickHouse-TRUE strict_order LIVE — r37's twin (round 17): the
    * default frontier machine over [[funnelEventsAll]]'s unfiltered
    * stream, with the break rule as the `dead` flag (see [[Machine]]).
    * Emits the same monotone level transitions as [[detect]]; a user's
    * final level is their pre-break default level, exactly r37's census
    * on ordered delivery (StreamingFunnelCHSpec pins it, including the
    * in-family-intervener corpus where this mode reads 3 and the repo's
    * strict-order twin reads 2).
    */
  def detectStrictOrderCH(events: Dataset[FunnelEvent],
                          windowMs: Long): Dataset[FunnelTransition] = {
    implicit val stEnc: Encoder[FunnelUserState] =
      Encoders.product[FunnelUserState]
    implicit val outEnc: Encoder[FunnelTransition] =
      Encoders.product[FunnelTransition]
    SequenceEngine.run(events, (_: FunnelEvent).user_id,
      new Machine(windowMs, strictIncrease = false, breakOnNonStep = true),
      expire = None)
  }

  /** [[detectStrictOrderCH]] with the family's bounded-state expiry
    * (2-window horizon; a dead or idle user's state drops, a returning
    * one restarts the scan — the standard TTL trade).
    */
  def detectStrictOrderCHExpiring(events: Dataset[FunnelEvent],
                                  windowMs: Long, watermarkDelayMs: Long)
    : Dataset[FunnelTransition] = {
    implicit val stEnc: Encoder[FunnelUserState] =
      Encoders.product[FunnelUserState]
    implicit val outEnc: Encoder[FunnelTransition] =
      Encoders.product[FunnelTransition]
    SequenceEngine.run(
      events.withWatermark("ts", s"$watermarkDelayMs milliseconds"),
      (_: FunnelEvent).user_id,
      new Machine(windowMs, strictIncrease = false, breakOnNonStep = true),
      expire = Some(watermarkDelayMs))
  }

  /** The stateful stage, exact form. Calling it on a batch Dataset runs
    * the identical group function once per user (Spark executes FMGWS in
    * batch too); the agreement pin is against the independent
    * [[batchTransitions]] joins either way.
    *
    * State note: with NoTimeout a converted user keeps its one-integer
    * suppression row forever — exact, but state grows with distinct
    * user_ids. Long-running deployments should use [[detectExpiring]].
    */
  def detect(events: Dataset[FunnelEvent], windowMs: Long,
             strictIncrease: Boolean = false): Dataset[FunnelTransition] = {
    implicit val stEnc: Encoder[FunnelUserState] =
      Encoders.product[FunnelUserState]
    implicit val outEnc: Encoder[FunnelTransition] =
      Encoders.product[FunnelTransition]
    SequenceEngine.run(events, (_: FunnelEvent).user_id,
      new Machine(windowMs, strictIncrease), expire = None)
  }

  /** [[detect]] with BOUNDED state for long-running deployments: the
    * input gets an event-time watermark of `watermarkDelayMs`, and a
    * user whose watermark passes the machine's 2-window horizon is
    * dropped. What the TTL trades away is only the duplicate-suppression
    * integer: a user returning after an idle gap longer than the horizon
    * re-reports levels from 1 (the standard streaming TTL contract —
    * at-least-once per level instead of exactly-once, state O(users
    * active within the horizon) instead of O(users ever seen)).
    * Streaming-only: batch execution has no watermark for
    * EventTimeTimeout — use [[detect]] there (StreamingFunnelSpec pins
    * agreement between the two for in-horizon traffic).
    */
  def detectExpiring(events: Dataset[FunnelEvent], windowMs: Long,
                     watermarkDelayMs: Long,
                     strictIncrease: Boolean = false)
    : Dataset[FunnelTransition] = {
    implicit val stEnc: Encoder[FunnelUserState] =
      Encoders.product[FunnelUserState]
    implicit val outEnc: Encoder[FunnelTransition] =
      Encoders.product[FunnelTransition]
    SequenceEngine.run(
      events.withWatermark("ts", s"$watermarkDelayMs milliseconds"),
      (_: FunnelEvent).user_id,
      new Machine(windowMs, strictIncrease), expire = Some(watermarkDelayMs))
  }

  /** The independent batch twin: r27's (or, strict-increase, r33's)
    * EXISTS step joins, reporting each user's (level, minimal completion
    * event time) — exactly the rows [[detect]] emits on an ordered
    * stream. One row per reached level. Chain comparisons are on
    * (µs, event_id) in default mode and strictly on µs in
    * strict-increase, mirroring the machine's [[Machine.before]].
    */
  def batchTransitions(events: DataFrame, userCol: Column, tsCol: Column,
                       typeCol: Column, idCol: Column, steps: Seq[String],
                       windowMs: Long,
                       strictIncrease: Boolean = false): DataFrame = {
    require(steps.length == Steps, s"funnel is $Steps steps")
    val wUs = windowMs * 1000L
    val ev = events.select(userCol.as("user_id"), tsCol.as("ts"),
      unix_micros(tsCol).as("tu"), idCol.cast("long").as("id"),
      typeCol.as("et"))
    def s(i: Int, suffix: String) = ev.filter(col("et") === steps(i))
      .select(col("user_id"), col("ts").as(s"ts$suffix"),
        col("tu").as(s"t$suffix"), col("id").as(s"i$suffix"))
    def after(a: String, b: String): Column =
      if (strictIncrease) col(s"t$b") > col(s"t$a")
      else col(s"t$b") > col(s"t$a") ||
        (col(s"t$b") === col(s"t$a") && col(s"i$b") > col(s"i$a"))
    val l1 = s(0, "1").groupBy(col("user_id"))
      .agg(min(col("ts1")).as("ts")).withColumn("level", lit(1))
    val vc = s(0, "1")
      .join(s(1, "2").withColumnRenamed("user_id", "cu"),
        col("user_id") === col("cu") && after("1", "2") &&
          col("t2") <= col("t1") + wUs)
      .select(col("user_id"), col("ts2"), col("t1"), col("t2"), col("i2"))
    val l2 = vc.groupBy(col("user_id"))
      .agg(min(col("ts2")).as("ts")).withColumn("level", lit(2))
    val l3 = vc
      .join(s(2, "3").withColumnRenamed("user_id", "pu"),
        col("user_id") === col("pu") && after("2", "3") &&
          col("t3") <= col("t1") + wUs)
      .groupBy(col("user_id"))
      .agg(min(col("ts3")).as("ts")).withColumn("level", lit(3))
    l1.unionByName(l2).unionByName(l3)
      .select(col("user_id"), col("level"), col("ts"))
  }
}
