package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Per-user state of the ClickHouse-true strict_deduplication scan —
  * FIVE scalars, the literal published loop made incremental:
  *
  *   - `m2`        — the latest step-1 (view) event time: the running
  *     anchor slot (condition-1 events only ever re-anchor).
  *   - `a3`        — the latest anchor CARRIED THROUGH a click: the max
  *     over processed clicks of their at-processing `m2`, carried
  *     unconditionally (the batch engine's claim-equivalence argument —
  *     a stale anchor that failed a click's window check fails harder at
  *     every later purchase, so no validity bit is needed on the carry).
  *   - `r2`        — "slot 2 is written": some click already completed a
  *     window-valid view→click chain. The NEXT click to arrive while r2
  *     holds is the repeat that stops the scan.
  *   - `seenView`  — any step-1 event seen (the provisional level-1
  *     floor an expiry flush reports).
  *   - `resolvedAt` — µs timestamp of the scan's resolution (MinValue
  *     while live): a resolved user ignores everything after.
  *
  * plus the family's monotone `maxTs` horizon clock. No `r3` slot is
  * needed: a window-valid purchase IS the full completion and resolves
  * the scan immediately, so a purchase repeat can never be observed
  * before resolution.
  */
case class DedupCHState(m2: Long, a3: Long, r2: Boolean, seenView: Boolean,
                        resolvedAt: Long, maxTs: Long)

/** One resolved scan: the user's FINAL windowFunnel('strict_deduplication')
  * level, with how the scan ended — "complete" (the full chain closed:
  * level 3), "repeat" (a click re-matched the already-held condition 2:
  * the literal `event_index − 1` = 1), or "expiry" (the expiring form
  * flushed a still-live scan at its provisional level — the batch
  * fallback for users with neither a repeat nor a completion).
  */
case class FunnelResolution(user_id: Long, level: Int, via: String,
                            ts: Timestamp)

/** ClickHouse-TRUE strict_deduplication LIVE — r38's twin (round 17),
  * completing the live funnel family at all six modes. Unlike the other
  * funnel twins' monotone level transitions, this mode's semantics make
  * the final level NON-monotone in the scan (the literal termination
  * returns `repeated-condition − 1`, which undercuts the level already
  * reached: view,click,click resolves to 1 AFTER level 2 was achieved) —
  * so the emit contract is EMIT-ON-RESOLUTION, one record per user when
  * their scan's verdict becomes final (the same single-debt shape as
  * [[StreamingSeqNextNode]]'s pending slot):
  *
  *   - a window-valid purchase completes the chain → resolve (3,
  *     "complete") at that event;
  *   - a click arriving while `r2` holds is the repeat → resolve (1,
  *     "repeat");
  *   - a user whose stream ends with neither resolves at expiry to the
  *     provisional level (2 if a valid click chained, 1 if only views,
  *     0 otherwise) — exactly the batch scan's bottom-loop fallback. The
  *     NoTimeout form leaves such users pending forever; the agreement
  *     spec uses the expiring form and flushes them with a far-future
  *     watermark, the family's established pattern.
  *
  * Agreement (StreamingFunnelCHSpec): on ordered replay the per-user
  * resolution levels census to the registered r38 query exactly,
  * including the discriminators (V,C,C → 1; V,C,P,C → 3 — completion
  * fires before the later repeat is scanned; V,C,V,C → 1 — the second
  * view re-anchors but the repeat still stops the scan).
  *
  * Scale shape: five scalars + the clock per user, O(1) per event, keyed
  * on user_id through [[SequenceEngine]]; input is pre-filtered to the
  * three condition types in codegen ([[StreamingDedupFunnel.dedupEvents]]
  * — the scan never inserts anything else when strict_order is off).
  */
object StreamingDedupFunnelCH extends Serializable {

  private val NoTs = Long.MinValue

  private final class Machine(windowMs: Long)
    extends SequenceEngine.Machine[StrictFunnelEvent, DedupCHState,
      FunnelResolution] {

    private val windowUs = windowMs * 1000L

    override def init: DedupCHState =
      DedupCHState(NoTs, NoTs, r2 = false, seenView = false, NoTs, NoTs)
    override def eventTimeUs(e: StrictFunnelEvent): Long =
      SequenceEngine.micros(e.ts)
    override def tie(e: StrictFunnelEvent): Long = e.event_id

    override def onEvent(user: Long, e: StrictFunnelEvent,
                         st0: DedupCHState,
                         out: ArrayBuffer[FunnelResolution]): DedupCHState = {
      val t = SequenceEngine.micros(e.ts)
      var st = st0.copy(maxTs = math.max(st0.maxTs, t))
      if (st.resolvedAt != NoTs) return st
      e.step match {
        case 1 => // a view: re-anchor; never terminates
          st = st.copy(m2 = math.max(st.m2, t), seenView = true)
        case 2 =>
          if (st.r2) { // condition 2 already held: the literal repeat stop
            out += FunnelResolution(user, 1, "repeat", e.ts)
            st = st.copy(resolvedAt = t)
          } else {
            if (st.m2 != NoTs) {
              if (st.m2 >= t - windowUs) st = st.copy(r2 = true)
              // the anchor carries to the purchase chain UNCONDITIONALLY
              // (claim-equivalence: a carry that failed here fails
              // harder at any later purchase)
              st = st.copy(a3 = math.max(st.a3, st.m2))
            }
          }
        case 3 =>
          if (st.a3 != NoTs && st.a3 >= t - windowUs) {
            out += FunnelResolution(user, 3, "complete", e.ts)
            st = st.copy(resolvedAt = t)
          } // an out-of-window purchase writes no slot and passes freely
        case _ => () // non-condition events never reach the machine
      }
      st
    }

    override def horizonMs(st: DedupCHState, delayMs: Long): Long =
      st.maxTs / 1000L + windowMs + delayMs + 1

    /** The bottom-loop fallback: a still-live scan flushes its
      * provisional level when the state drops.
      */
    override def onExpire(user: Long, st: DedupCHState,
                          out: ArrayBuffer[FunnelResolution]): Unit =
      if (st.resolvedAt == NoTs) {
        val lvl = if (st.r2) 2 else if (st.seenView) 1 else 0
        out += FunnelResolution(user, lvl, "expiry",
          SequenceEngine.toTimestamp(st.maxTs))
      }
  }

  private implicit val stEnc: Encoder[DedupCHState] =
    Encoders.product[DedupCHState]
  private implicit val outEnc: Encoder[FunnelResolution] =
    Encoders.product[FunnelResolution]

  /** Exact form: NoTimeout — unresolved scans stay pending forever (they
    * may still resolve; the batch fallback level is only knowable at
    * end-of-stream, which an unbounded stream never reaches).
    */
  def detect(events: Dataset[StrictFunnelEvent],
             windowMs: Long): Dataset[FunnelResolution] =
    SequenceEngine.run(events, (_: StrictFunnelEvent).user_id,
      new Machine(windowMs), expire = None)

  /** [[detect]] with the family's idle-user expiry: a still-live scan
    * resolves to its provisional level when the watermark passes
    * maxTs + window + delay (see the class doc), then the state drops.
    */
  def detectExpiring(events: Dataset[StrictFunnelEvent], windowMs: Long,
                     watermarkDelayMs: Long): Dataset[FunnelResolution] =
    SequenceEngine.run(
      events.withWatermark("ts", s"$watermarkDelayMs milliseconds"),
      (_: StrictFunnelEvent).user_id,
      new Machine(windowMs), expire = Some(watermarkDelayMs))
}
