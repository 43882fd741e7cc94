package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** One event entering the path analyzer: `step` 1 = the journey's first
  * condition (view), 2 = its second (click), 0 = any other type. UNLIKE
  * the other sequence operators, non-condition events flow THROUGH the
  * stateful stage — they are exactly what next/prev-node analysis
  * reports — so the pre-shuffle filter keeps every row and only the
  * projection narrows.
  */
case class NodeEvent(user_id: Long, ts: Timestamp, step: Int,
                     event_type: String, event_id: Long)

/** Per-user path-analysis state:
  *   - `lastSub`       — the last view/click-subsequence step seen
  *     (0 none, 1 view, 2 click): the one lag the boundary test needs.
  *   - `lastViewPrev`  — the full-sequence predecessor type of that last
  *     subsequence event IF it was a view ("none" when the view opened
  *     the sequence) — the lag-of-lag carry r36 reads at a boundary.
  *   - `prevAny`       — the type of the user's previous event of ANY
  *     kind ("none" before the first), feeding `lastViewPrev`.
  *   - `pendingN`      — journey number of a just-completed boundary
  *     click awaiting its forward next-node (0 = nothing pending): the
  *     one pending-slot the emit-on-completion contract needs.
  *   - `journeys`      — completed view→click journeys so far.
  *   - `maxTs`         — largest event time seen (µs), keeping the
  *     expiry horizon monotone across batches (the family's shared
  *     maxTs persistence).
  */
case class SeqNodeState(lastSub: Int, lastViewPrev: String, prevAny: String,
                        pendingN: Long, journeys: Long, maxTs: Long)

/** One path-analysis emission: the user's `n`th completed journey, with
  * `direction` "forward" (the event type AFTER the boundary click — r35's
  * statistic at n = 1) or "backward" (the full-sequence predecessor of
  * the journey's view — r36's statistic at the user's LAST journey).
  */
case class SeqNode(user_id: Long, n: Long, direction: String, node: String,
                   ts: Timestamp)

/** Streaming sequence next/prev-node — r35/r36's ClickHouse
  * `sequenceNextNode` path analysis LIVE, one state machine emitting BOTH
  * directions (the batch twins differ only in which emission they census:
  * r35 = forward at n 1, r36 = backward at max n).
  *
  * Emission contract (emit-on-completion):
  *   - a boundary click (subsequence predecessor = view) completes
  *     journey n: the BACKWARD node — the full-sequence predecessor of
  *     the journey's view, carried in state since the view arrived — is
  *     known immediately and emits with the click.
  *   - the FORWARD node is the user's next event of ANY type, unknown at
  *     the click: the click parks journey n in the one pending slot and
  *     the next arrival (whatever its type) emits it. A user whose
  *     stream ends pending emits forward 'none' — exactly the batch
  *     'none' bucket — at expiry in [[detectExpiring]] (under NoTimeout
  *     the pending slot simply never resolves, and the agreement spec
  *     accounts the two buckets against each other).
  *
  * Agreement (pinned by StreamingSeqNextNodeSpec): on ordered delivery,
  * the n=1 forward emissions census to r35 (pending users ↔ the batch
  * 'none' bucket) and each user's last backward emission censuses to
  * r36 exactly.
  *
  * Scale shape: state is FIVE scalars + the pending slot per user — the
  * K−1 = 1 subsequence lag the 2-step journey needs, the lag-of-lag
  * carry, the any-type lag, and the slot — constant regardless of event
  * count; every event is one state fold; emissions are journey-sized.
  * All event types cross the shuffle (the operator's statistic is about
  * arbitrary types), so the arm's post-filter throughput equals source
  * throughput.
  */
object StreamingSeqNextNode extends Serializable {

  /** Project a raw events frame into the analyzer's typed input — keeps
    * EVERY row (see [[NodeEvent]]).
    */
  def nodeEvents(events: DataFrame, userCol: Column, tsCol: Column,
                 typeCol: Column, idCol: Column, first: String,
                 second: String): Dataset[NodeEvent] = {
    implicit val enc: Encoder[NodeEvent] = Encoders.product[NodeEvent]
    events.select(userCol.as("user_id"), tsCol.as("ts"),
      when(typeCol === first, 1).when(typeCol === second, 2)
        .otherwise(0).as("step"),
      typeCol.as("event_type"), idCol.cast("long").as("event_id"))
      .as[NodeEvent]
  }

  /** The path-analysis fold as a [[SequenceEngine.Machine]] — the one
    * machine with an [[onExpire]] debt: a pending forward slot flushes
    * to 'none' when the expiring user's state drops (round 17 — shared
    * plumbing in the family core).
    */
  private object Machine
    extends SequenceEngine.Machine[NodeEvent, SeqNodeState, SeqNode] {

    override def init: SeqNodeState =
      SeqNodeState(0, "none", "none", 0L, 0L, Long.MinValue)
    override def eventTimeUs(e: NodeEvent): Long = SequenceEngine.micros(e.ts)
    override def tie(e: NodeEvent): Long = e.event_id

    override def onEvent(user: Long, e: NodeEvent, st0: SeqNodeState,
                         out: ArrayBuffer[SeqNode]): SeqNodeState = {
      var st = st0.copy(
        maxTs = math.max(st0.maxTs, SequenceEngine.micros(e.ts)))
      // 1. a parked forward slot resolves on ANY arrival
      if (st.pendingN > 0) {
        out += SeqNode(user, st.pendingN, "forward", e.event_type, e.ts)
        st = st.copy(pendingN = 0L)
      }
      // 2. boundary test: a click whose subsequence predecessor is a
      //    view completes journey n — backward emits now, forward parks
      if (e.step == 2 && st.lastSub == 1) {
        val n = st.journeys + 1
        out += SeqNode(user, n, "backward", st.lastViewPrev, e.ts)
        st = st.copy(journeys = n, pendingN = n)
      }
      // 3. fold the lags
      if (e.step == 1)
        st = st.copy(lastSub = 1, lastViewPrev = st.prevAny)
      else if (e.step == 2)
        st = st.copy(lastSub = 2)
      st.copy(prevAny = e.event_type)
    }

    override def horizonMs(st: SeqNodeState, delayMs: Long): Long =
      st.maxTs / 1000L + delayMs + 1

    override def onExpire(user: Long, st: SeqNodeState,
                          out: ArrayBuffer[SeqNode]): Unit =
      if (st.pendingN > 0)
        out += SeqNode(user, st.pendingN, "forward", "none",
          SequenceEngine.toTimestamp(st.maxTs))
  }

  private implicit val stEnc: Encoder[SeqNodeState] =
    Encoders.product[SeqNodeState]
  private implicit val outEnc: Encoder[SeqNode] = Encoders.product[SeqNode]

  /** Exact form: NoTimeout, constant state per user forever; pending
    * forward slots never flush to 'none'.
    */
  def detect(events: Dataset[NodeEvent]): Dataset[SeqNode] =
    SequenceEngine.run(events, (_: NodeEvent).user_id, Machine, expire = None)

  /** [[detect]] with idle-user expiry: at timeout a pending forward slot
    * emits 'none' (the batch semantics for a user whose boundary click
    * is their final event), then the user's state drops. A returning
    * expired user restarts with a fresh journey numbering.
    */
  def detectExpiring(events: Dataset[NodeEvent],
                     watermarkDelayMs: Long): Dataset[SeqNode] =
    SequenceEngine.run(
      events.withWatermark("ts", s"$watermarkDelayMs milliseconds"),
      (_: NodeEvent).user_id, Machine, expire = Some(watermarkDelayMs))
}
