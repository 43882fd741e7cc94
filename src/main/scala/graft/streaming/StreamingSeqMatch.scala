package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.SequenceMatch.{Adjacent, AnyGap, AtLeast, Gap, Within}

/** One event entering the live pattern matcher: `mask` has bit k−1 set
  * iff the row matches step condition k — evaluated in codegen BEFORE
  * the stateful stage ([[StreamingSeqMatch.patternEvents]]), which also
  * drops rows matching NO condition (the ClickHouse skip semantics: they
  * can never affect a match, so they never reach the state store).
  */
case class PatternEvent(user_id: Long, ts: Timestamp, mask: Int,
                        event_id: Long)

/** Per-user matcher state — the pattern engine's running extrema made
  * incremental: `ext(i)` is the max (Within/Any gaps) or min (AtLeast
  * gaps) event time over processed rows where a chain of steps 1..i+1
  * ends (sentinel-initialized), `prevReach(i)` the same reach flag for
  * the LAST processed row (what an Adjacent gap consults), `matched`
  * whether the hit was already emitted, `maxTs` the monotone horizon
  * clock (µs) for the expiring form. K−1 longs + K−1 booleans + two
  * scalars per user, independent of history length.
  */
case class SeqMatchMachineState(ext: Seq[Long], prevReach: Seq[Boolean],
                                matched: Boolean, maxTs: Long)

/** One pattern completion: the user matched, stamped with the completing
  * event's time. Emitted AT MOST ONCE per user (sequenceMatch is an
  * EXISTS — the hit stream is the set of matched users).
  */
case class PatternHit(user_id: Long, ts: Timestamp)

/** Streaming sequenceMatch — the live form of
  * [[graft.operators.SequenceMatch.matchesPerUser]] (r32's engine), via
  * flatMapGroupsWithState: emit a hit the moment a user first completes
  * the typed condition chain. The batch engine's window passes become
  * incremental state: each level's running extremum is ONE long, each
  * Adjacent gap consults the previous row's reach vector, and the DP
  * recurrence is evaluated per event against the PRE-row state (a row
  * never chains with itself — the same strictly-preceding frame the
  * batch form uses).
  *
  * Agreement (pinned by StreamingSeqMatchSpec): on ordered delivery the
  * hit set equals the batch `matchesPerUser` matched-user set for every
  * gap kind — the recurrence is literally the same, folded left to
  * right. Disorder contract (arrival-evaluated, the family's): events
  * are judged in arrival-batch (ts, event_id) order; a step arriving
  * after the event it would have enabled does not retroactively match.
  *
  * Scale shape: step conditions evaluate in codegen into one int mask
  * and non-pattern rows are dropped before the shuffle; state is K−1
  * longs + K−1 booleans + two scalars per user; the hit stream is
  * output-sized (≤ one row per user, ever). [[detectExpiring]] adds the
  * family's idle-user expiry with the monotone maxTs horizon.
  */
object StreamingSeqMatch extends Serializable {

  /** Project a raw frame into the matcher's typed input: per-step
    * conditions fold into a bitmask in codegen; rows matching no step
    * are filtered before the stateful stage.
    */
  def patternEvents(events: DataFrame, userCol: Column, tsCol: Column,
                    idCol: Column, steps: Seq[Column])
    : Dataset[PatternEvent] = {
    require(steps.size >= 2 && steps.size <= 30,
      "mask bits: 2 to 30 steps")
    implicit val enc: Encoder[PatternEvent] = Encoders.product[PatternEvent]
    val mask = steps.zipWithIndex
      .map { case (c, i) => when(c, lit(1 << i)).otherwise(lit(0)) }
      .reduce(_.bitwiseOR(_))
    events.select(userCol.cast("long").as("user_id"), tsCol.as("ts"),
        mask.as("mask"), idCol.cast("long").as("event_id"))
      .filter(col("mask") =!= 0)
      .as[PatternEvent]
  }

  /** The matcher DP as a [[SequenceEngine.Machine]]: per event, evaluate
    * every level against the PRE-row state, then fold the row's reach
    * vector into the extrema and the adjacency view (round 17 — shared
    * plumbing in the family core).
    */
  private final class Machine(gaps: Seq[Gap])
    extends SequenceEngine.Machine[PatternEvent, SeqMatchMachineState,
      PatternHit] {

    private val k = gaps.size + 1
    // sentinel per gap: max-tracked gaps start at MinValue, min-tracked
    // (AtLeast) at MaxValue
    private val sentinels: Seq[Long] = gaps.map {
      case AtLeast(_) => Long.MaxValue
      case _          => Long.MinValue
    }

    override def init: SeqMatchMachineState = SeqMatchMachineState(
      sentinels, Seq.fill(k - 1)(false), matched = false, Long.MinValue)
    override def eventTimeUs(e: PatternEvent): Long =
      SequenceEngine.micros(e.ts)
    override def tie(e: PatternEvent): Long = e.event_id

    override def onEvent(user: Long, e: PatternEvent,
                         st: SeqMatchMachineState,
                         out: ArrayBuffer[PatternHit])
      : SeqMatchMachineState = {
      val tsu = SequenceEngine.micros(e.ts)
      val maxTs = math.max(st.maxTs, tsu)
      val ext = st.ext.toArray
      val prevReach = st.prevReach.toArray
      var matched = st.matched
      val reach = new Array[Boolean](k)
      reach(0) = (e.mask & 1) != 0
      var i = 1
      while (i < k) {
        val ok = gaps(i - 1) match {
          case AnyGap     => ext(i - 1) != Long.MinValue
          case Within(s)  => ext(i - 1) != Long.MinValue &&
            ext(i - 1) >= tsu - s * 1000000L
          case AtLeast(s) => ext(i - 1) != Long.MaxValue &&
            ext(i - 1) <= tsu - s * 1000000L
          case Adjacent   => prevReach(i - 1)
        }
        reach(i) = ok && (e.mask & (1 << i)) != 0
        i += 1
      }
      i = 0
      while (i < k - 1) {
        if (reach(i)) ext(i) = gaps(i) match {
          case AtLeast(_) =>
            if (ext(i) == Long.MaxValue) tsu else math.min(ext(i), tsu)
          case _ =>
            if (ext(i) == Long.MinValue) tsu else math.max(ext(i), tsu)
        }
        prevReach(i) = reach(i)
        i += 1
      }
      if (reach(k - 1) && !matched) {
        matched = true
        out += PatternHit(user, e.ts)
      }
      SeqMatchMachineState(ext.toSeq, prevReach.toSeq, matched, maxTs)
    }

    override def horizonMs(st: SeqMatchMachineState, delayMs: Long): Long =
      st.maxTs / 1000L + delayMs + 1
  }

  private implicit val stEnc: Encoder[SeqMatchMachineState] =
    Encoders.product[SeqMatchMachineState]
  private implicit val outEnc: Encoder[PatternHit] =
    Encoders.product[PatternHit]

  /** The stateful stage, exact form: NoTimeout, constant state per user
    * for the stream's lifetime.
    */
  def detect(events: Dataset[PatternEvent],
             gaps: Seq[Gap]): Dataset[PatternHit] = {
    require(gaps.nonEmpty, "a pattern needs at least two steps")
    SequenceEngine.run(events, (_: PatternEvent).user_id,
      new Machine(gaps), expire = None)
  }

  /** [[detect]] with idle-user expiry (event-time watermark of
    * `watermarkDelayMs`, timeout at the monotone maxTs + delay): an
    * expired user's partial chains are forgotten — a returning user
    * restarts from step 1, and a user who already matched simply
    * re-emits on a fresh completion (the hit stream is then
    * at-most-once per user PER RESIDENCY).
    */
  def detectExpiring(events: Dataset[PatternEvent], gaps: Seq[Gap],
                     watermarkDelayMs: Long): Dataset[PatternHit] = {
    require(gaps.nonEmpty, "a pattern needs at least two steps")
    SequenceEngine.run(
      events.withWatermark("ts", s"$watermarkDelayMs milliseconds"),
      (_: PatternEvent).user_id,
      new Machine(gaps), expire = Some(watermarkDelayMs))
  }
}
