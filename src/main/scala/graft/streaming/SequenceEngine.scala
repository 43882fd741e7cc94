package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The ONE stateful core behind the live sequence family — funnel
  * (default / strict-increase / strict-order / strict-dedup), pattern
  * match, greedy count, next/prev-node. Rounds 11–16 grew those as seven
  * hand-rolled `flatMapGroupsWithState` loops, each re-implementing the
  * same contract; a semantics fix (the round-12 tie-order advice, the
  * round-15 maxTs monotonicity fix) had to land in every copy. This core
  * owns the contract ONCE; an operator is now just a [[Machine]] — its
  * state type and per-event transition — and the family-shared pieces
  * live here:
  *
  *   - '''sequencing''': every micro-batch is sorted by the family's
  *     (event-time µs, tie-break) total order before the fold — the SAME
  *     order every batch twin windows by, so same-microsecond ties
  *     resolve identically live and offline. Event time is extracted at
  *     µs precision ([[SequenceEngine.micros]] — `getTime` alone is
  *     ms-truncated).
  *   - '''arrival evaluation''': events are judged in arrival-batch
  *     order against the pre-event state; nothing is retroactively
  *     re-evaluated (the standard streaming one-directional disorder
  *     contract every operator documents).
  *   - '''expiry''': the expiring form sets an EventTimeTimeout at the
  *     machine's horizon over its MONOTONE max-event-time clock, clamped
  *     above the current watermark (a user whose only events arrived
  *     very late would otherwise set a timeout in the past, which Spark
  *     rejects). On timeout the machine may owe final emissions
  *     ([[Machine.onExpire]] — the next-node 'none' flush) before the
  *     state drops.
  *   - '''emit contract''': Append-mode output collected through one
  *     buffer per group invocation; a machine emits by appending, never
  *     by returning — so a transition and the state advance that caused
  *     it are atomic within the fold.
  *
  * Scale shape is shared too: the stateful stage keys on the group
  * column (user_id everywhere today), state is whatever the machine
  * carries — every machine in this family is O(1) or
  * O(window-bounded-frontier) per user — and the sort is per
  * (user, micro-batch) slice, never global.
  */
object SequenceEngine {

  /** Epoch microseconds of a Timestamp (getTime is ms-truncated; the
    * nanos field carries the sub-ms part).
    */
  def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** The inverse of [[micros]]: a Timestamp carrying the FULL
    * microsecond value (the `new Timestamp(ms)` constructor sets nanos
    * from the millis alone, so the sub-ms part must be added back —
    * round-18 ADVICE: the expiry-flush emissions in
    * StreamingDedupFunnelCH / StreamingSeqNextNode were ms-truncating
    * their machine's µs clock). `micros(toTimestamp(us)) == us`.
    */
  def toTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos(t.getNanos + (Math.floorMod(us, 1000L) * 1000L).toInt)
    t
  }

  /** One live sequence operator: a deterministic per-user fold over the
    * family's (event-time µs, tie) total order.
    *
    * @tparam E the typed event (projected in codegen before the shuffle)
    * @tparam S the per-user state (a case class; Encoders.product)
    * @tparam O the emission type
    */
  trait Machine[E, S, O] extends Serializable {

    /** Fresh-user state. */
    def init: S

    /** The event's time in epoch µs — the leading sequencing key. */
    def eventTimeUs(e: E): Long

    /** The deterministic tie-break (event_id in every current machine;
      * funnel's pre-round-17 (ts, step) sort is retired with the engine).
      */
    def tie(e: E): Long

    /** Fold one event into the state; emissions append to `out`. */
    def onEvent(user: Long, e: E, st: S, out: ArrayBuffer[O]): S

    /** Expiry horizon in epoch MILLISECONDS for the post-batch state —
      * when the event-time watermark passes this, the user's state
      * drops. Every machine derives it from a monotone max-event-time
      * field in its state (never from the batch alone: a batch of
      * late-arriving older events must not pull the timeout earlier).
      */
    def horizonMs(st: S, delayMs: Long): Long

    /** Emissions owed when an expiring user's state drops (default:
      * none; the next-node machine flushes its pending forward slot to
      * 'none' here).
      */
    def onExpire(user: Long, st: S, out: ArrayBuffer[O]): Unit = ()
  }

  /** Run a machine over a user-keyed event stream (or batch Dataset —
    * Spark executes flatMapGroupsWithState in batch too, once per user;
    * the agreement pins exploit that). `expire` = Some(delayMs) is the
    * bounded-state form: the CALLER has already put an event-time
    * watermark of delayMs on `events` (the column name varies by event
    * type, so the watermark stays outside this core), and idle users
    * drop at the machine's horizon.
    */
  def run[E, S, O](events: Dataset[E], user: E => Long,
                   machine: Machine[E, S, O], expire: Option[Long])
                  (implicit sEnc: Encoder[S], oEnc: Encoder[O])
    : Dataset[O] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    def fn(u: Long, evs: Iterator[E], state: GroupState[S]): Iterator[O] = {
      val out = ArrayBuffer.empty[O]
      if (state.hasTimedOut) {
        state.getOption.foreach(st => machine.onExpire(u, st, out))
        state.remove()
        return out.iterator
      }
      val seq = evs.toSeq
      val sorted =
        if (seq.lengthCompare(2) < 0) seq
        else seq.sortBy(e => (machine.eventTimeUs(e), machine.tie(e)))
      var st = state.getOption.getOrElse(machine.init)
      sorted.foreach { e => st = machine.onEvent(u, e, st, out) }
      state.update(st)
      expire.foreach { delay =>
        state.setTimeoutTimestamp(
          math.max(machine.horizonMs(st, delay),
            state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

    events.groupByKey(user)
      .flatMapGroupsWithState(OutputMode.Append,
        if (expire.isDefined) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }
}
