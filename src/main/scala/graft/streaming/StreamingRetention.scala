package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event entering the live retention computation: `kind` 1 = the
  * cohorting action (signup), `kind` 2 = the retained action (purchase).
  * Other event types don't participate and are filtered out before the
  * stateful stage ([[StreamingRetention.retentionEvents]]).
  */
case class RetentionEvent(user_id: Long, ts: Timestamp, kind: Int)

/** Per-user retention state — CONSTANT size: the user's cohort week
  * (epoch-µs Monday, MinValue until the signup arrives), a bitmask of
  * week offsets already credited (one bit per offset 0..nOffsets-1 — the
  * exactly-once guarantee), up to [[StreamingRetention.MaxPending]]
  * distinct purchase weeks that arrived BEFORE the signup (most recent
  * kept), and the max event time seen (drives lossless expiry).
  */
case class RetentionState(cohortUs: Long, creditedMask: Int,
                          pending: Seq[Long], maxTs: Long)

/** One exactly-once retention increment: `offset` == -1 is a cohort-SIZE
  * delta (this user's first signup arrived, cohort membership +1); offset
  * >= 0 is an ACTIVE delta (this user purchased in cohort-week + offset,
  * first time). Counting deltas reproduces r28's table — see
  * [[StreamingRetention.census]].
  */
case class RetentionDelta(cohort_ts: Timestamp, offset: Int, user_id: Long)

/** Streaming conditioned retention — r28's ClickHouse-`retention()` shape
  * LIVE: users cohort by the week of their first signup; the operator
  * emits an exactly-once delta when a user joins a cohort and when a user
  * first purchases in cohort-week + offset (offset 0..nOffsets-1), so a
  * running count of deltas IS the retention matrix at every instant.
  *
  * Agreement (pinned by StreamingRetentionSpec): for event-time-ordered
  * delivery, [[census]] over the collected delta stream equals the r28
  * batch query row for row — cohort, offset, cohort_users, n_active,
  * ratio. Ordered delivery makes the first signup ARRIVED the first
  * signup in event time, which is exactly r28's min(ts) cohort.
  *
  * Disorder contract (arrival-evaluated, like every stateful operator
  * here): the first signup that ARRIVES fixes the user's cohort — an
  * earlier-timestamped signup arriving later does not re-cohort (its
  * arrival would have to retract already-emitted deltas). Purchases
  * arriving before their user's signup are held as PENDING distinct weeks
  * (bounded: the [[MaxPending]] most recent are kept — lossless whenever
  * pre-signup disorder spans at most that many distinct weeks, and weeks
  * below the eventual cohort never count anyway since offsets are
  * non-negative) and credited the moment the signup lands.
  *
  * Scale shape: ONE user-keyed stateful stage holding four numbers plus a
  * ≤[[MaxPending]]-long week list per user — no per-event history, no
  * (user × week) state; the delta stream is at most
  * (1 + nOffsets) rows per user EVER, so the downstream census aggregation
  * is output-sized. [[detectExpiring]] bounds state: once the watermark
  * passes a user's last event + the full offset horizon + the disorder
  * delay, no countable offset can ever arrive (offsets cap at
  * nOffsets - 1 weeks past the cohort) and the user drops LOSSLESSLY;
  * a returning expired user re-enters as a NEW cohort member (the
  * re-admission caveat every expiring form here shares).
  *
  * Reference: glassflow/clickhouse-etl-loadtest exercises event streams
  * whose sink engine reports `retention(cond1, cond2, …)`; this is that
  * report computed in-stream instead of at query time.
  */
object StreamingRetention extends Serializable {

  /** Upper bound on distinct pre-signup purchase weeks held per user. */
  val MaxPending = 5

  /** Delta `offset` value marking cohort membership (size +1). */
  val SizeDelta: Int = -1

  private val DayUs = 86400000000L
  private val WeekUs = 7 * DayUs
  // 1970-01-05, the first epoch Monday — date_trunc("week") alignment
  private val MondayEpochUs = 4 * DayUs

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Monday-aligned week start in epoch-µs — `date_trunc("week", ts)` in
    * the UTC session, the exact truncation r28 and its DuckDB oracle use.
    */
  def weekStartUs(us: Long): Long =
    MondayEpochUs + Math.floorDiv(us - MondayEpochUs, WeekUs) * WeekUs

  /** Project a raw events frame into the typed input: `signupType` rows
    * become kind 1, `activityType` rows kind 2, everything else is
    * dropped (unlike the strict funnel, other events carry no signal).
    */
  def retentionEvents(events: DataFrame, userCol: Column, tsCol: Column,
                      typeCol: Column, signupType: String,
                      activityType: String): Dataset[RetentionEvent] = {
    implicit val enc: Encoder[RetentionEvent] = Encoders.product[RetentionEvent]
    events.filter(typeCol === signupType || typeCol === activityType)
      .select(userCol.as("user_id"), tsCol.as("ts"),
        when(typeCol === signupType, 1).otherwise(2).as("kind"))
      .as[RetentionEvent]
  }

  /** The stateful stage, exact form: NoTimeout, state lives as long as
    * the user (use [[detectExpiring]] for long-running deployments).
    */
  def detect(events: Dataset[RetentionEvent], nOffsets: Int = 4)
    : Dataset[RetentionDelta] =
    stateful(events, nOffsets, expire = None)

  /** [[detect]] with BOUNDED state: event-time watermark of
    * `watermarkDelayMs`, users expired once the watermark passes
    * `maxTs + nOffsets weeks + delay` — past that point no event can
    * produce a countable offset for this cohort, so the drop is lossless
    * for the matrix; re-admission re-cohorts (see class doc).
    */
  def detectExpiring(events: Dataset[RetentionEvent], nOffsets: Int,
                     watermarkDelayMs: Long): Dataset[RetentionDelta] =
    stateful(events.withWatermark("ts", s"$watermarkDelayMs milliseconds"),
      nOffsets, expire = Some(watermarkDelayMs))

  /** The retention fold as a [[SketchEngine.Sketch]], with the hot-user
    * slice collapse (round-18, VERDICT task 1 — the hot-key matrix
    * measured hot/uniform 0.433 on the old per-event fold):
    *
    * Retention's deltas depend only on THREE order-free statistics of a
    * micro-batch slice — the min signup µs, the per-week (min, max) µs
    * of the purchases, and the max µs overall — because credits are
    * idempotent per (user, offset) and the cohort is the min-µs signup
    * (the old (µs, kind) sort made "first signup arrived" deterministic;
    * the min IS that event, and kind 1 sorting before kind 2 at ties is
    * exactly the `µs < sMin` pre-signup test below). So the slice
    * collapses in ONE O(n) pass with no sort, no per-event state copy
    * and no per-event emission check: a 400k-event bot user now costs
    * one primitive-comparison scan plus O(distinct purchase weeks)
    * state work — bounded by the calendar, not the event count — where
    * the old fold paid a tuple-key sort plus two allocations per event.
    *
    * The collapse replays the old per-event semantics EXACTLY, including
    * the [[MaxPending]] eviction order: slice purchases strictly before
    * the slice's first signup merge into `pending` (in ascending week
    * order — weeks are monotone in µs, so that IS first-occurrence
    * order) BEFORE the signup credits-and-clears it, and purchases at or
    * after the signup credit directly. StreamingRetentionSpec's census
    * agreement pins the equivalence.
    */
  private final class RetentionSketch(nOffsets: Int, delayMs: Long)
    extends SketchEngine.Sketch[Long, RetentionEvent, RetentionState,
      RetentionDelta] {
    require(nOffsets >= 1 && nOffsets <= 31, "mask is an Int bitfield")

    override def init: RetentionState =
      RetentionState(Long.MinValue, 0, Nil, Long.MinValue)

    override def onSlice(user: Long, evs: Iterator[RetentionEvent],
                         st0: RetentionState, wmMs: Long,
                         out: scala.collection.mutable.ArrayBuffer[RetentionDelta])
      : SketchEngine.Next[RetentionState] = {
      var st = st0
      def cohortTs = new Timestamp(st.cohortUs / 1000L) // week-aligned: no sub-ms
      def credit(weekUs: Long): Unit = {
        val off = ((weekUs - st.cohortUs) / WeekUs).toInt
        if (weekUs >= st.cohortUs && off < nOffsets &&
            (st.creditedMask & (1 << off)) == 0) {
          out += RetentionDelta(cohortTs, off, user)
          st = st.copy(creditedMask = st.creditedMask | (1 << off))
        }
      }
      // the O(n) collapse: min signup µs, per-week (min, max) purchase
      // µs, max µs overall
      var maxT = st.maxTs
      var sMin = Long.MaxValue
      val weeks = scala.collection.mutable.TreeMap.empty[Long, (Long, Long)]
      evs.foreach { e =>
        val t = micros(e.ts)
        if (t > maxT) maxT = t
        if (e.kind == 1) { if (t < sMin) sMin = t }
        else {
          val wk = weekStartUs(t)
          weeks.get(wk) match {
            case Some((mn, mx)) =>
              weeks(wk) = (math.min(mn, t), math.max(mx, t))
            case None => weeks(wk) = (t, t)
          }
        }
      }
      st = st.copy(maxTs = maxT)
      if (st.cohortUs != Long.MinValue) {
        // cohort already known: every purchase week credits directly
        weeks.keysIterator.foreach(credit)
      } else if (sMin != Long.MaxValue) {
        // the slice's first signup fixes the cohort. Pre-signup weeks
        // (first instance strictly before it) merge into pending FIRST —
        // replaying the old fold's eviction order — then the signup
        // credits-and-clears pending, then post-signup weeks credit.
        var p = st.pending
        weeks.foreach { case (wk, (mn, _)) =>
          if (mn < sMin && !p.contains(wk))
            p = (p :+ wk).takeRight(MaxPending)
        }
        st = st.copy(cohortUs = weekStartUs(sMin), pending = p)
        out += RetentionDelta(cohortTs, SizeDelta, user)
        st.pending.foreach(credit)
        st = st.copy(pending = Nil)
        weeks.foreach { case (wk, (_, mx)) => if (mx >= sMin) credit(wk) }
      } else {
        // no cohort and no signup: all purchase weeks are pending
        var p = st.pending
        weeks.keysIterator.foreach { wk =>
          if (!p.contains(wk)) p = (p :+ wk).takeRight(MaxPending)
        }
        st = st.copy(pending = p)
      }
      SketchEngine.Update(st)
    }

    override def horizonMs(st: RetentionState): Long =
      st.maxTs / 1000L + nOffsets * (WeekUs / 1000L) + delayMs + 1
  }

  private def stateful(events: Dataset[RetentionEvent], nOffsets: Int,
                       expire: Option[Long]): Dataset[RetentionDelta] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[RetentionState] =
      Encoders.product[RetentionState]
    implicit val outEnc: Encoder[RetentionDelta] =
      Encoders.product[RetentionDelta]
    SketchEngine.run(events, (_: RetentionEvent).user_id,
      new RetentionSketch(nOffsets, expire.getOrElse(0L)),
      expiring = expire.isDefined)
  }

  /** Fold a delta stream (collected, or inside foreachBatch over the sunk
    * table) into r28's exact output shape: one row per (cohort, offset)
    * with the cohort size, active count, and ratio. Counting works
    * because every delta is exactly-once per (user, offset) by
    * construction.
    */
  def census(deltas: DataFrame): DataFrame = {
    val sizes = deltas.filter(col("offset") === SizeDelta)
      .groupBy(col("cohort_ts"))
      .agg(count(lit(1)).as("cohort_users"))
    val active = deltas.filter(col("offset") >= 0)
      .groupBy(col("cohort_ts"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
    active.join(broadcast(sizes), "cohort_ts")
      .select(date_format(col("cohort_ts"), "yyyy-MM-dd").as("cohort"),
        col("offset").cast("long").as("offset"),
        col("cohort_users"), col("n_active"),
        (col("n_active").cast("double") / col("cohort_users")).as("retention"))
      .orderBy(col("cohort"), col("offset"))
  }
}
