package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Per-user dedup-funnel state — FIVE numbers: the single live chain's
  * stage (0 = none, 1 = waiting for the click, 2 = waiting for the
  * purchase), its anchor view's epoch-µs, the furthest level reported,
  * and the max event time seen. ONE chain suffices because under
  * strict_dedup a new view interrupts any live chain (condition 1
  * repeats) while anchoring a fresh one, and a click either advances or
  * kills — two chains can never be live at once (the proof is in the
  * class doc).
  */
case class DedupFunnelState(stage: Int, anchorTs: Long,
                            reached: Int, maxTs: Long)

/** Streaming dedup-strict windowed funnel — r31's ClickHouse
  * `windowFunnel(strict_dedup)` LIVE, completing the live funnel trio
  * (EXISTS = [[StreamingFunnel]], strict_order =
  * [[StreamingStrictFunnel]]): a repeated event of a condition the
  * chain already holds interrupts it, unrelated event types pass
  * freely. Emits a transition whenever a user's furthest level rises.
  *
  * Why state is CONSTANT with no frontier (unlike the EXISTS mode): at
  * most one chain is ever live. A chain waiting for its click dies the
  * moment another view arrives (condition 1 repeats) — and that view
  * anchors the replacement; a chain waiting for its purchase dies on
  * any view or click; a completed chain needs nothing further. So every
  * condition event either advances, kills, or replaces THE chain, and
  * the per-anchor EXISTS maximum of the batch query collapses to one
  * five-number machine. Agreement with r31's census on ordered delivery
  * is spec-pinned (StreamingDedupFunnelSpec), including the mode's
  * discriminators (V,C,C,P caps at 2; V,signup,C,P reaches 3).
  *
  * Input contract: feed ONLY condition events plus anything — non-step
  * events (step 0) are ignored by the machine, so unlike the
  * strict-order form the caller MAY pre-filter to the three condition
  * types in codegen ([[dedupEvents]] does) and cut state-store traffic
  * to the condition share of the stream.
  *
  * Disorder contract (arrival-evaluated): events are judged in
  * arrival-batch (ts, event_id) order, the family's shared total order;
  * a late view cannot retroactively interrupt a chain already advanced.
  * [[detectExpiring]] drops users idle past window + delay — lossless
  * for chain detection (a live chain's remaining budget is bounded by
  * the anchor window), at the usual re-reporting-on-return cost.
  */
object StreamingDedupFunnel extends Serializable {

  val Steps = 3

  /** Project a raw events frame into the machine's typed input, KEEPING
    * only the three condition types (strict_dedup ignores everything
    * else, so the filter runs in codegen before the shuffle).
    */
  def dedupEvents(events: DataFrame, userCol: Column, tsCol: Column,
                  typeCol: Column, idCol: Column,
                  steps: Seq[String]): Dataset[StrictFunnelEvent] = {
    require(steps.length == Steps, s"funnel is $Steps steps")
    implicit val enc: Encoder[StrictFunnelEvent] =
      Encoders.product[StrictFunnelEvent]
    val idx = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (t, i)) =>
      when(typeCol === t, lit(i + 1)).otherwise(acc)
    }
    events.filter(typeCol.isin(steps: _*))
      .select(userCol.as("user_id"), tsCol.as("ts"), idx.as("step"),
        idCol.cast("long").as("event_id"))
      .as[StrictFunnelEvent]
  }

  /** The dedup-funnel fold as a [[SequenceEngine.Machine]]: the one-chain
    * stage advance, shared plumbing in the family core (round 17).
    */
  private final class Machine(windowMs: Long)
    extends SequenceEngine.Machine[StrictFunnelEvent, DedupFunnelState,
      FunnelTransition] {

    private val windowUs = windowMs * 1000L

    override def init: DedupFunnelState =
      DedupFunnelState(0, Long.MinValue, 0, Long.MinValue)
    override def eventTimeUs(e: StrictFunnelEvent): Long =
      SequenceEngine.micros(e.ts)
    override def tie(e: StrictFunnelEvent): Long = e.event_id

    override def onEvent(user: Long, e: StrictFunnelEvent,
                         st0: DedupFunnelState,
                         out: ArrayBuffer[FunnelTransition])
      : DedupFunnelState = {
      val t = SequenceEngine.micros(e.ts)
      var st = st0.copy(maxTs = math.max(st0.maxTs, t))
      def report(level: Int, ts: Timestamp): Unit =
        if (level > st.reached) {
          out += FunnelTransition(user, level, ts)
          st = st.copy(reached = level)
        }
      e.step match {
        case 1 => // a view: interrupts any live chain, anchors a new one
          st = st.copy(stage = 1, anchorTs = t)
          report(1, e.ts)
        case 2 => // a click: first match of condition 2 — advance or kill
          if (st.stage == 1) {
            if (t <= st.anchorTs + windowUs) {
              st = st.copy(stage = 2)
              report(2, e.ts)
            } else st = st.copy(stage = 0) // out of window: chain dead
          } else if (st.stage == 2) {
            st = st.copy(stage = 0) // condition 2 repeats: interrupt
          } // stage 0: a click cannot anchor
        case 3 => // a purchase: only meaningful while waiting at stage 2
          if (st.stage == 2) {
            if (t <= st.anchorTs + windowUs) report(3, e.ts)
            st = st.copy(stage = 0) // complete or out-of-window: done
          }
        case _ => () // non-condition events never reach the machine
      }
      st
    }

    override def horizonMs(st: DedupFunnelState, delayMs: Long): Long =
      st.maxTs / 1000L + windowMs + delayMs + 1
  }

  private implicit val stEnc: Encoder[DedupFunnelState] =
    Encoders.product[DedupFunnelState]
  private implicit val outEnc: Encoder[FunnelTransition] =
    Encoders.product[FunnelTransition]

  /** The stateful stage, exact form: NoTimeout. */
  def detect(events: Dataset[StrictFunnelEvent], windowMs: Long)
    : Dataset[FunnelTransition] =
    SequenceEngine.run(events, (_: StrictFunnelEvent).user_id,
      new Machine(windowMs), expire = None)

  /** [[detect]] with bounded state: users idle past window + delay are
    * dropped (lossless for detection; returning users re-report).
    */
  def detectExpiring(events: Dataset[StrictFunnelEvent], windowMs: Long,
                     watermarkDelayMs: Long): Dataset[FunnelTransition] =
    SequenceEngine.run(
      events.withWatermark("ts", s"$watermarkDelayMs milliseconds"),
      (_: StrictFunnelEvent).user_id,
      new Machine(windowMs), expire = Some(watermarkDelayMs))
}
