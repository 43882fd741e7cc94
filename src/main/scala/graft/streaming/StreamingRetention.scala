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

  private def stateful(events: Dataset[RetentionEvent], nOffsets: Int,
                       expire: Option[Long]): Dataset[RetentionDelta] = {
    require(nOffsets >= 1 && nOffsets <= 31, "mask is an Int bitfield")
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[RetentionState] =
      Encoders.product[RetentionState]
    implicit val outEnc: Encoder[RetentionDelta] =
      Encoders.product[RetentionDelta]

    def fn(user: Long, evs: Iterator[RetentionEvent],
           state: GroupState[RetentionState]): Iterator[RetentionDelta] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      var st = state.getOption
        .getOrElse(RetentionState(Long.MinValue, 0, Nil, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer.empty[RetentionDelta]
      def cohortTs = new Timestamp(st.cohortUs / 1000L)
      def credit(weekUs: Long): Unit = {
        val off = ((weekUs - st.cohortUs) / WeekUs).toInt
        if (weekUs >= st.cohortUs && off < nOffsets &&
            (st.creditedMask & (1 << off)) == 0) {
          out += RetentionDelta(cohortTs, off, user)
          st = st.copy(creditedMask = st.creditedMask | (1 << off))
        }
      }
      // batches are sets, not sequences, for retention (credits are
      // order-independent within a batch ONCE the cohort is known), but
      // sorting keeps "first signup arrived" deterministic inside a batch
      val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.kind))
      sorted.foreach { e =>
        val t = micros(e.ts)
        st = st.copy(maxTs = math.max(st.maxTs, t))
        if (e.kind == 1) {
          if (st.cohortUs == Long.MinValue) {
            st = st.copy(cohortUs = weekStartUs(t))
            out += RetentionDelta(cohortTs, SizeDelta, user)
            st.pending.foreach(credit)
            st = st.copy(pending = Nil)
          } // a later signup never re-cohorts (arrival contract)
        } else {
          val wk = weekStartUs(t)
          if (st.cohortUs != Long.MinValue) credit(wk)
          else if (!st.pending.contains(wk))
            st = st.copy(pending = (st.pending :+ wk).takeRight(MaxPending))
        }
      }
      state.update(st)
      expire.foreach { delay =>
        val horizonMs = st.maxTs / 1000L + nOffsets * (WeekUs / 1000L) + delay + 1
        state.setTimeoutTimestamp(
          math.max(horizonMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (expire.isDefined) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
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
