package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** One event entering the sequence counter: `step` 1 = the pattern's
  * first condition (view), 2 = its second (click). Events matching
  * neither are filtered out BEFORE the stateful stage — `.*` in the
  * pattern means they can never affect a match.
  */
case class SeqEvent(user_id: Long, ts: Timestamp, step: Int, event_id: Long)

/** Per-user sequence-counter state — the state machine's position
  * (0 = seeking the first condition, 1 = seeking the second), the
  * matches completed so far, and the largest event time seen (µs) so
  * the expiry horizon is monotone across batches: a batch of
  * late-arriving older events must never pull the timeout earlier than
  * maxTs + delay (the same maxTs persistence StreamingRetention and
  * StreamingDedupFunnel use). Still the smallest per-user state of any
  * operator here: greedy non-overlapping matching never needs history,
  * only which condition it is waiting for.
  */
case class SeqCountState(seeking: Int, matches: Long, maxTs: Long)

/** One completed match: the user's nth view → click journey, stamped
  * with the completing click's event time.
  */
case class SeqMatch(user_id: Long, n: Long, ts: Timestamp)

/** Streaming greedy sequence counting — r30's ClickHouse
  * `sequenceCount('(?1).*(?2)')` shape LIVE: per user, emit a match the
  * moment a click completes a journey whose view was not already
  * consumed by an earlier match (greedy, non-overlapping, scanning in
  * event order). The repeat-engagement counter: r27/r29 say how FAR a
  * user got, this says how OFTEN.
  *
  * Agreement (pinned by StreamingSeqCountSpec): the greedy count is a
  * run-collapse invariant — collapse the user's view/click subsequence
  * into alternating runs; every view-run → click-run boundary completes
  * exactly one match, and greedy matching resets there. So the final
  * per-user count equals r30's single-lag batch computation ("clicks
  * whose subsequence predecessor is a view"), and on ordered delivery
  * the match stream carries exactly those boundary clicks' timestamps.
  *
  * Disorder contract (arrival-evaluated): events are judged in
  * arrival-batch (ts, event_id) order — the family's shared total
  * order; a view arriving after the click it would have enabled does
  * not retroactively create a match.
  *
  * Scale shape: the type filter runs in codegen before the shuffle
  * (only pattern-relevant rows reach the state store), state is THREE
  * numbers per user, and the match stream is output-sized (one row per
  * completed journey). Nothing needs a watermark to stay bounded, but
  * [[detectExpiring]] drops idle users anyway — losslessly for the
  * MACHINE POSITION (a returning user restarts seeking a view, which
  * can only under-count by the one journey in flight at expiry) — for
  * deployments where even three longs per lifetime user is too much.
  */
object StreamingSeqCount extends Serializable {

  /** Project a raw events frame into the counter's typed input, keeping
    * only rows matching either condition.
    */
  def seqEvents(events: DataFrame, userCol: Column, tsCol: Column,
                typeCol: Column, idCol: Column, first: String,
                second: String): Dataset[SeqEvent] = {
    implicit val enc: Encoder[SeqEvent] = Encoders.product[SeqEvent]
    events.filter(typeCol === first || typeCol === second)
      .select(userCol.as("user_id"), tsCol.as("ts"),
        when(typeCol === first, 1).otherwise(2).as("step"),
        idCol.cast("long").as("event_id"))
      .as[SeqEvent]
  }

  /** The greedy two-position machine as a [[SequenceEngine.Machine]]
    * (round 17 — shared plumbing in the family core).
    */
  private object Machine
    extends SequenceEngine.Machine[SeqEvent, SeqCountState, SeqMatch] {

    override def init: SeqCountState = SeqCountState(0, 0L, Long.MinValue)
    override def eventTimeUs(e: SeqEvent): Long = SequenceEngine.micros(e.ts)
    override def tie(e: SeqEvent): Long = e.event_id

    override def onEvent(user: Long, e: SeqEvent, st: SeqCountState,
                         out: ArrayBuffer[SeqMatch]): SeqCountState = {
      val maxTs = math.max(st.maxTs, SequenceEngine.micros(e.ts))
      if (st.seeking == 0 && e.step == 1)
        SeqCountState(1, st.matches, maxTs)
      else if (st.seeking == 1 && e.step == 2) {
        val n = st.matches + 1
        out += SeqMatch(user, n, e.ts)
        SeqCountState(0, n, maxTs)
      } else st.copy(maxTs = maxTs)
      // a view while seeking a click, or a click while seeking a view,
      // advances nothing — greedy matching ignores it
    }

    override def horizonMs(st: SeqCountState, delayMs: Long): Long =
      st.maxTs / 1000L + delayMs + 1
  }

  private implicit val stEnc: Encoder[SeqCountState] =
    Encoders.product[SeqCountState]
  private implicit val outEnc: Encoder[SeqMatch] = Encoders.product[SeqMatch]

  /** The stateful stage, exact form: NoTimeout, three longs per user for
    * the stream's lifetime.
    */
  def detect(events: Dataset[SeqEvent]): Dataset[SeqMatch] =
    SequenceEngine.run(events, (_: SeqEvent).user_id, Machine, expire = None)

  /** [[detect]] with idle-user expiry (event-time watermark of
    * `watermarkDelayMs`, timeout at maxTs + delay): machine position is
    * the only loss — a returning expired user restarts seeking the
    * first condition, and its match numbering restarts at 1.
    */
  def detectExpiring(events: Dataset[SeqEvent],
                     watermarkDelayMs: Long): Dataset[SeqMatch] =
    SequenceEngine.run(
      events.withWatermark("ts", s"$watermarkDelayMs milliseconds"),
      (_: SeqEvent).user_id, Machine, expire = Some(watermarkDelayMs))
}
