package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The ONE stateful core behind the live per-GROUP sketch family — Bloom
  * dedup, exact windowed dedup, KMV cardinality, LSH band claims,
  * quantile histogram, retention, SemDeDup cell admission, moment stats,
  * SpaceSaving top-k. [[SequenceEngine]] (round 17) unified the per-USER
  * sequence family, whose machines are per-event folds over a total
  * order; these nine are a different shape — '''whole-slice folds over a
  * group-keyed sketch''' (a min-k set, a bitmap, a histogram, a window
  * owner), where the slice's internal order is the sketch's own business
  * (most sort by (ts, tie); retention collapses the slice order-free) —
  * so they get a sibling core rather than a forced reuse (round-17
  * VERDICT task 4). What lived as nine hand-rolled
  * `flatMapGroupsWithState` loops is owned HERE once:
  *
  *   - '''timeout branch''': `hasTimedOut` → [[Sketch.onExpire]] (owed
  *     final emissions) → state drop, before any slice work.
  *   - '''watermark access''': `getCurrentWatermarkMs` throws on batch
  *     invocations and on streams without a watermark; the engine folds
  *     both into `wmMs = Long.MinValue` ("no late-data line") and hands
  *     the sketch the safe value — the Bloom late-drop and every
  *     agreement spec's batch execution share one guard instead of nine.
  *   - '''expiry arming''': the expiring form re-arms an
  *     EventTimeTimeout at the sketch's [[Sketch.horizonMs]] after every
  *     slice, clamped above the current watermark (a timeout at or
  *     behind the watermark throws — the same clamp every operator had
  *     hand-rolled, the round-15 fix class this extraction retires).
  *     Arming is skipped when no watermark exists (batch execution of
  *     the identical group function — the agreement-spec path).
  *   - '''state writes''': the sketch's [[Next]] verdict makes the write
  *     explicit — [[Update]] persists, [[Drop]] removes (SemDeDup's
  *     emptied cell), [[Unchanged]] leaves the store untouched (Bloom's
  *     all-late slice must not materialize a state row).
  *   - '''emit contract''': Append-mode output through one buffer per
  *     invocation; a sketch emits by appending, so an emission and the
  *     state advance that caused it stay atomic within the fold.
  *
  * Scale shape is shared too: one stateful stage keyed by the group
  * column, state whatever the sketch carries (every sketch here is O(1)
  * or O(window-bounded) per group), per-slice work linear in the slice
  * plus the sketch's own merge cost.
  */
object SketchEngine {

  /** What the slice fold decided about the group's stored state. */
  sealed trait Next[+S]

  /** Persist `st` (and re-arm the expiry clock in the expiring form). */
  final case class Update[S](st: S) extends Next[S]

  /** Leave the store untouched — no write where none existed. */
  case object Unchanged extends Next[Nothing]

  /** Remove the group's state (nothing left worth keeping). */
  case object Drop extends Next[Nothing]

  /** One live sketch operator: a whole-slice fold over group-keyed
    * state.
    *
    * @tparam K the grouping key
    * @tparam E the typed event (projected in codegen before the shuffle)
    * @tparam S the per-group state (a case class; Encoders.product)
    * @tparam O the emission type
    */
  trait Sketch[K, E, S, O] extends Serializable {

    /** Fresh-group state. */
    def init: S

    /** Fold one micro-batch slice into the state; emissions append to
      * `out`. `evs` streams in Spark's delivery order — a sketch that
      * needs the family's (ts, tie) order materializes and sorts it
      * itself, and one whose result is order-free (KMV, the quantile
      * histogram, retention) folds the iterator in one pass without
      * paying a materialization. `wmMs` is the current event-time
      * watermark in epoch ms, `Long.MinValue` when none exists (batch
      * invocation, or a stream without a watermark).
      */
    def onSlice(key: K, evs: Iterator[E], st: S, wmMs: Long,
                out: ArrayBuffer[O]): Next[S]

    /** Expiry horizon in epoch MILLISECONDS for the post-slice state —
      * when the event-time watermark passes it, the group's state drops.
      * Derive it from a monotone field of the state (never from the
      * slice alone: a batch of late-arriving older events must not pull
      * the timeout earlier). Only consulted by the expiring form.
      */
    def horizonMs(st: S): Long = Long.MaxValue

    /** Emissions owed when an expiring group's state drops (retention's
      * provisional-census flush class lives here).
      */
    def onExpire(key: K, st: S, out: ArrayBuffer[O]): Unit = ()
  }

  /** Run a sketch over a group-keyed event stream (or batch Dataset —
    * Spark executes flatMapGroupsWithState in batch too, once per group;
    * the agreement pins exploit that). `expiring = true` is the
    * bounded-state form: the CALLER has already put an event-time
    * watermark on `events` (the column name varies by event type, so the
    * watermark stays outside this core), and idle groups drop at the
    * sketch's horizon.
    */
  def run[K, E, S, O](events: Dataset[E], key: E => K,
                      sketch: Sketch[K, E, S, O], expiring: Boolean)
                     (implicit kEnc: Encoder[K], sEnc: Encoder[S],
                      oEnc: Encoder[O]): Dataset[O] = {

    def fn(k: K, evs: Iterator[E], state: GroupState[S]): Iterator[O] = {
      val out = ArrayBuffer.empty[O]
      if (state.hasTimedOut) {
        state.getOption.foreach(st => sketch.onExpire(k, st, out))
        state.remove()
        return out.iterator
      }
      val wmMs =
        try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => Long.MinValue }
      sketch.onSlice(k, evs,
        state.getOption.getOrElse(sketch.init), wmMs, out) match {
        case Update(st) =>
          state.update(st)
          if (expiring && wmMs != Long.MinValue)
            state.setTimeoutTimestamp(
              math.max(sketch.horizonMs(st), wmMs + 1))
        case Drop => if (state.exists) state.remove()
        case Unchanged => ()
      }
      out.iterator
    }

    events.groupByKey(key)
      .flatMapGroupsWithState(OutputMode.Append,
        if (expiring) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }
}
