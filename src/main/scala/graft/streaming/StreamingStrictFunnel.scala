package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** One event entering the strict funnel: unlike [[FunnelEvent]], `step` 0
  * (a non-funnel event) is KEPT — strict order means any intervening event
  * breaks the chain, so the stateful stage must see every event to know
  * what "immediately preceding" means. `event_id` is the tie-breaker:
  * both this operator and r29 sequence a user's events by the
  * (ts, event_id) total order, so same-microsecond events resolve
  * identically in every form (round-12 advice — the former (ts, step)
  * sort diverged from r29 on ties).
  */
case class StrictFunnelEvent(user_id: Long, ts: Timestamp, step: Int,
                             event_id: Long)

/** Per-user strict-funnel state — CONSTANT size, the smallest state of any
  * funnel form: the last two events' (step, epoch-µs) — the only context
  * "consecutive in sequence" can ever need — plus the furthest level
  * reported and the max event time seen.
  */
case class StrictFunnelState(p1Step: Int, p1Ts: Long, p2Step: Int, p2Ts: Long,
                             reached: Int, maxTs: Long)

/** Streaming STRICT-ORDER windowed funnel — r29's ClickHouse
  * `windowFunnel(strict_order)` shape LIVE: per user, emit a transition
  * the moment the view → click → purchase chain completes with NO
  * intervening event of any type ("A→B→D→C stops finding A→B→C at D"),
  * the whole chain within `windowMs` of its anchoring view.
  *
  * Agreement (pinned by StreamingStrictFunnelSpec): for event-time-ordered
  * delivery the transition stream equals [[batchTransitions]] — the r29
  * lag-window computation reporting each level's minimal completion time —
  * row for row, and the per-user furthest-level census equals r29's.
  *
  * Disorder contract: strict order is SEQUENCE-defined, so events are
  * judged in arrival-batch event-time order (each micro-batch is sorted by
  * (event time, event_id) before the state update — the SAME total order
  * r29 and [[batchTransitions]] sequence by, so same-microsecond ties
  * resolve identically in all three forms); an event arriving a batch
  * late is sequenced after everything already judged, the standard
  * arrival-evaluation contract.
  *
  * Scale shape: state is SIX numbers per user — no frontier, no history —
  * because an event can only ever chain to its two immediate predecessors;
  * the stateful stage keys on user_id. [[detectExpiring]] bounds even that:
  * a user idle past `window + delay` can be dropped LOSSLESSLY for chain
  * detection (a chain spanning a ≥window gap between consecutive events
  * violates the anchor window by definition), trading only the
  * duplicate-suppression integer — a returning expired user re-reports
  * from level 1.
  */
object StreamingStrictFunnel {

  val Steps = 3

  /** Project a raw events frame into the strict funnel's typed input,
    * mapping `steps(i)` to step i+1 and every OTHER event type to step 0
    * (kept — it breaks chains).
    */
  def strictEvents(events: DataFrame, userCol: Column, tsCol: Column,
                   typeCol: Column, idCol: Column,
                   steps: Seq[String]): Dataset[StrictFunnelEvent] = {
    require(steps.length == Steps, s"funnel is $Steps steps")
    implicit val enc: Encoder[StrictFunnelEvent] =
      Encoders.product[StrictFunnelEvent]
    val idx = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (t, i)) =>
      when(typeCol === t, lit(i + 1)).otherwise(acc)
    }
    events.select(userCol.as("user_id"), tsCol.as("ts"), idx.as("step"),
        idCol.cast("long").as("event_id"))
      .as[StrictFunnelEvent]
  }

  /** The strict-order fold as a [[SequenceEngine.Machine]]: the two-lag
    * state advance, shared plumbing in the family core (round 17).
    */
  private final class Machine(windowMs: Long)
    extends SequenceEngine.Machine[StrictFunnelEvent, StrictFunnelState,
      FunnelTransition] {

    private val windowUs = windowMs * 1000L

    override def init: StrictFunnelState =
      StrictFunnelState(0, Long.MinValue, 0, Long.MinValue, 0, Long.MinValue)
    override def eventTimeUs(e: StrictFunnelEvent): Long =
      SequenceEngine.micros(e.ts)
    override def tie(e: StrictFunnelEvent): Long = e.event_id

    override def onEvent(user: Long, e: StrictFunnelEvent,
                         st: StrictFunnelState,
                         out: ArrayBuffer[FunnelTransition])
      : StrictFunnelState = {
      val t = SequenceEngine.micros(e.ts)
      val rowLevel = e.step match {
        case 1 => 1
        case 2 =>
          if (st.p1Step == 1 && t <= st.p1Ts + windowUs) 2 else 0
        case 3 =>
          if (st.p1Step == 2 && st.p2Step == 1 && t <= st.p2Ts + windowUs) 3
          else 0
        case _ => 0
      }
      if (rowLevel > st.reached) {
        // a row can raise reached by at most one: level 2 requires the
        // immediately preceding view (reached >= 1 already), level 3 the
        // immediately preceding qualifying click (reached >= 2 already)
        out += FunnelTransition(user, rowLevel, e.ts)
      }
      StrictFunnelState(e.step, t, st.p1Step, st.p1Ts,
        math.max(st.reached, rowLevel), math.max(st.maxTs, t))
    }

    override def horizonMs(st: StrictFunnelState, delayMs: Long): Long =
      st.maxTs / 1000L + windowMs + delayMs + 1
  }

  private implicit val stEnc: Encoder[StrictFunnelState] =
    Encoders.product[StrictFunnelState]
  private implicit val outEnc: Encoder[FunnelTransition] =
    Encoders.product[FunnelTransition]

  /** The stateful stage, exact form: NoTimeout, state lives as long as the
    * user (use [[detectExpiring]] for long-running deployments).
    */
  def detect(events: Dataset[StrictFunnelEvent], windowMs: Long)
    : Dataset[FunnelTransition] =
    SequenceEngine.run(events, (_: StrictFunnelEvent).user_id,
      new Machine(windowMs), expire = None)

  /** [[detect]] with BOUNDED state: event-time watermark of
    * `watermarkDelayMs`, users expired once the watermark passes
    * `maxTs + window + delay`. Lossless for chain detection (see class
    * doc); re-admission re-reports from level 1. Streaming-only.
    */
  def detectExpiring(events: Dataset[StrictFunnelEvent], windowMs: Long,
                     watermarkDelayMs: Long): Dataset[FunnelTransition] =
    SequenceEngine.run(
      events.withWatermark("ts", s"$watermarkDelayMs milliseconds"),
      (_: StrictFunnelEvent).user_id,
      new Machine(windowMs), expire = Some(watermarkDelayMs))

  /** The independent batch twin — r29's lag-window computation, reporting
    * each user's (level, minimal completion event time): exactly the rows
    * [[detect]] emits on an ordered stream. Ties inside one (user, ts)
    * microsecond are ordered by `idCol` — the same (ts, event_id) total
    * order the streaming sort and r29 use, so all three forms agree even
    * on tie-heavy corpora (round-12 advice).
    */
  def batchTransitions(events: DataFrame, userCol: Column, tsCol: Column,
                       typeCol: Column, idCol: Column, steps: Seq[String],
                       windowMs: Long): DataFrame = {
    require(steps.length == Steps, s"funnel is $Steps steps")
    import org.apache.spark.sql.expressions.Window
    val wUs = windowMs * 1000L
    val idx = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (t, i)) =>
      when(typeCol === t, lit(i + 1)).otherwise(acc)
    }
    val ev = events.select(userCol.as("user_id"), tsCol.as("ts"),
      unix_micros(tsCol).as("tsu"), idx.as("step"),
      idCol.cast("long").as("event_id"))
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("event_id"))
    val p1s = lag(col("step"), 1).over(seq)
    val p1u = lag(col("tsu"), 1).over(seq)
    val p2s = lag(col("step"), 2).over(seq)
    val p2u = lag(col("tsu"), 2).over(seq)
    val rowLevel =
      when(col("step") === 3 && p1s === 2 && p2s === 1 &&
        col("tsu") <= p2u + wUs, 3)
        .when(col("step") === 2 && p1s === 1 && col("tsu") <= p1u + wUs, 2)
        .when(col("step") === 1, 1)
        .otherwise(0)
    val lv = ev.withColumn("lvl", rowLevel)
    (1 to Steps).map { l =>
      lv.filter(col("lvl") >= l)
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("ts"))
        .withColumn("level", lit(l))
    }.reduce(_ unionByName _)
      .select(col("user_id"), col("level"), col("ts"))
  }
}
