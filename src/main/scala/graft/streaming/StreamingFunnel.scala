package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event entering the live funnel: `step` is the 1-based position of
  * the event's type in the funnel sequence (events of non-funnel types are
  * filtered out before the stateful stage).
  */
case class FunnelEvent(user_id: Long, ts: Timestamp, step: Int)

/** A chain of completed funnel steps: `anchor` is the epoch-MICROSECOND
  * timestamp of its step-1 event (the whole chain must complete within the
  * window of this anchor), `last` the timestamp of its furthest completed
  * step. Microseconds, not millis: event time carries µs precision and the
  * batch twin's joins compare at full precision — a ms-truncated state
  * would disagree on same-millisecond step pairs.
  */
case class FunnelChain(anchor: Long, last: Long)

/** Per-user funnel state: the Pareto frontiers of chains that completed
  * step 1 (`f1`) and step 2 (`f2`) — an entry is kept only if no other
  * chain has BOTH a fresher anchor and an earlier last step (such a chain
  * can extend strictly more future events, so the dominated one is dead
  * weight) — plus the furthest level already reported and the max event
  * time seen. Once a user converts (reached = 3) both frontiers clear:
  * levels only ever increase, so nothing further can emit.
  */
case class FunnelUserState(f1: Seq[FunnelChain], f2: Seq[FunnelChain],
                           reached: Int, maxTs: Long)

/** A user's furthest-funnel-level increase: emitted once per level, carrying
  * the event time of the step that completed it.
  */
case class FunnelTransition(user_id: Long, level: Int, ts: Timestamp)

/** Streaming windowed funnel — r27's ClickHouse-windowFunnel shape LIVE:
  * per user, emit a transition the moment the furthest
  * step-1 → step-2 → step-3 chain completing within `windowMs` of its
  * anchoring step-1 event reaches a new level. Same EXISTS semantics as
  * the batch query (ANY step-1 event may anchor a chain, not just the
  * earliest/latest), via a Pareto frontier per partial level instead of
  * the batch side's step joins.
  *
  * Agreement (pinned by StreamingFunnelSpec): for event-time-ordered
  * delivery the transition stream equals [[batchTransitions]] — the
  * r27-style EXISTS joins reporting each level's minimal completion time —
  * row for row. Dominance makes the frontier lossless for every FUTURE
  * event: if chain A has anchor ≥ chain B's and last ≤ chain B's, any
  * event B could extend, A extends too.
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
                   typeCol: Column, steps: Seq[String]): Dataset[FunnelEvent] = {
    require(steps.length == Steps, s"funnel is $Steps steps")
    implicit val enc: Encoder[FunnelEvent] = Encoders.product[FunnelEvent]
    val idx = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (t, i)) =>
      when(typeCol === t, lit(i + 1)).otherwise(acc)
    }
    events.select(userCol.as("user_id"), tsCol.as("ts"), idx.as("step"))
      .filter(col("step") > 0)
      .as[FunnelEvent]
  }

  /** Frontier insert with Pareto pruning (maximize anchor, minimize last).
    * Skips the insert when an existing chain dominates the candidate;
    * evicts chains the candidate dominates.
    */
  private def insert(f: Seq[FunnelChain], c: FunnelChain): Seq[FunnelChain] =
    if (f.exists(e => e.anchor >= c.anchor && e.last <= c.last)) f
    else f.filterNot(e => e.anchor <= c.anchor && e.last >= c.last) :+ c

  /** Epoch microseconds of a Timestamp (getTime is ms-truncated; the nanos
    * field carries the sub-ms part).
    */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** The stateful stage. Calling it on a batch Dataset runs the identical
    * group function once per user (Spark executes FMGWS in batch too);
    * the agreement pin is against the independent [[batchTransitions]]
    * joins either way.
    *
    * State note: with NoTimeout a converted user keeps its one-integer
    * suppression row forever — exact, but state grows with distinct
    * user_ids. Long-running deployments should use [[detectExpiring]].
    */
  def detect(events: Dataset[FunnelEvent], windowMs: Long)
    : Dataset[FunnelTransition] =
    stateful(events, windowMs, expireAfterWatermark = false)

  /** [[detect]] with BOUNDED state for long-running deployments: the
    * input gets an event-time watermark of `watermarkDelayMs`, and a
    * user whose watermark passes `maxTs + 2·window + delay` is dropped
    * via EventTimeTimeout — by then every frontier entry is already
    * outside the 2-window disorder horizon, so dropping a NON-converted
    * user's state cannot change any future in-contract output. What the
    * TTL trades away is only the duplicate-suppression integer: a user
    * returning after an idle gap longer than the horizon re-reports
    * levels from 1 (the standard streaming TTL contract — at-least-once
    * per level instead of exactly-once, state O(users active within the
    * horizon) instead of O(users ever seen)). Streaming-only: batch
    * execution has no watermark for EventTimeTimeout — use [[detect]]
    * there (StreamingFunnelSpec pins agreement between the two for
    * in-horizon traffic).
    */
  def detectExpiring(events: Dataset[FunnelEvent], windowMs: Long,
                     watermarkDelayMs: Long): Dataset[FunnelTransition] =
    stateful(
      events.withWatermark("ts", s"$watermarkDelayMs milliseconds"),
      windowMs, expireAfterWatermark = true)

  private def stateful(events: Dataset[FunnelEvent], windowMs: Long,
                       expireAfterWatermark: Boolean)
    : Dataset[FunnelTransition] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[FunnelUserState] =
      Encoders.product[FunnelUserState]
    implicit val outEnc: Encoder[FunnelTransition] =
      Encoders.product[FunnelTransition]

    def fn(user: Long, evs: Iterator[FunnelEvent],
           state: GroupState[FunnelUserState]): Iterator[FunnelTransition] = {
      if (state.hasTimedOut) { // expiring mode only: idle past the horizon
        state.remove()
        return Iterator.empty
      }
      val seq = evs.toSeq
      val sorted =
        if (seq.lengthCompare(2) < 0) seq
        else seq.sortBy(e => (micros(e.ts), e.step))
      var st = state.getOption
        .getOrElse(FunnelUserState(Nil, Nil, 0, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer.empty[FunnelTransition]
      val windowUs = windowMs * 1000L
      sorted.foreach { e =>
        val t = micros(e.ts)
        if (st.reached < Steps) {
          var f1 = st.f1
          var f2 = st.f2
          var reached = st.reached
          e.step match {
            case 1 =>
              f1 = insert(f1, FunnelChain(t, t))
              if (reached < 1) { reached = 1; out += FunnelTransition(user, 1, e.ts) }
            case 2 =>
              // extend the freshest-anchored level-1 chain that admits t:
              // strictly after its last step, within the window of its anchor
              val cand = f1.filter(c => c.last < t && c.anchor >= t - windowUs)
              if (cand.nonEmpty) {
                f2 = insert(f2, FunnelChain(cand.map(_.anchor).max, t))
                if (reached < 2) { reached = 2; out += FunnelTransition(user, 2, e.ts) }
              }
            case _ =>
              if (f2.exists(c => c.last < t && c.anchor >= t - windowUs)) {
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
          st = FunnelUserState(f1, f2, reached, mx)
        } else st = st.copy(maxTs = math.max(st.maxTs, micros(e.ts)))
      }
      state.update(st)
      if (expireAfterWatermark) {
        // horizon: once the watermark passes maxTs + 2·window nothing in
        // this user's frontiers can legally extend (the 2-window prune
        // already emptied them); clamp above the current watermark — a
        // user whose only events arrived very late would otherwise set a
        // timeout in the past, which Spark rejects
        val horizonMs = st.maxTs / 1000L + 2 * windowMs + 1
        state.setTimeoutTimestamp(
          math.max(horizonMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (expireAfterWatermark) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }

  /** The independent batch twin: r27's EXISTS step joins, reporting each
    * user's (level, minimal completion event time) — exactly the rows
    * [[detect]] emits on an ordered stream. One row per reached level.
    */
  def batchTransitions(events: DataFrame, userCol: Column, tsCol: Column,
                       typeCol: Column, steps: Seq[String],
                       windowMs: Long): DataFrame = {
    require(steps.length == Steps, s"funnel is $Steps steps")
    val ev = events.select(userCol.as("user_id"), tsCol.as("ts"),
      typeCol.as("et"))
    def s(i: Int, as: String) = ev.filter(col("et") === steps(i))
      .select(col("user_id"), col("ts").as(as))
    val win = expr(s"INTERVAL $windowMs MILLISECONDS")
    val l1 = s(0, "t1").groupBy(col("user_id"))
      .agg(min(col("t1")).as("ts")).withColumn("level", lit(1))
    val vc = s(0, "t1")
      .join(s(1, "t2").withColumnRenamed("user_id", "cu"),
        col("user_id") === col("cu") && col("t2") > col("t1") &&
          col("t2") <= col("t1") + win)
      .select(col("user_id"), col("t1"), col("t2"))
    val l2 = vc.groupBy(col("user_id"))
      .agg(min(col("t2")).as("ts")).withColumn("level", lit(2))
    val l3 = vc
      .join(s(2, "t3").withColumnRenamed("user_id", "pu"),
        col("user_id") === col("pu") && col("t3") > col("t2") &&
          col("t3") <= col("t1") + win)
      .groupBy(col("user_id"))
      .agg(min(col("t3")).as("ts")).withColumn("level", lit(3))
    l1.unionByName(l2).unionByName(l3)
      .select(col("user_id"), col("level"), col("ts"))
  }
}
