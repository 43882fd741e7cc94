package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.config.Duration
import graft.streaming.TemporalJoin

/** Temporal-join operators (SURVEY.md §2.4 J1), batch form over the events
  * table — the oracle-checkable face of graft.streaming.TemporalJoin (the
  * streaming form shares the same match semantics; StreamingSpec pins their
  * agreement).
  */
object JoinQueries extends QueryPack {

  /** j01 — temporal equi-join: each purchase matched to clicks by the same
    * user within ±10 minutes. Shuffled hash join on user_id with a µs-exact
    * range predicate inside the key partition — never a cartesian.
    */
  private def j01(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user"), col("value").as("p_value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"),
        col("user_id").as("c_user"))
    TemporalJoin.batch(p, c, "p_user", "c_user",
        col("p_ts"), col("c_ts"), Duration.parse("10m"))
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
        col("p_value"))
      .orderBy(col("p_id"), col("c_id"))
  }

  private val j01Sql =
    """SELECT p.event_id AS p_id, c.event_id AS c_id,
      |  p.user_id AS user_id, p.value AS p_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 10 MINUTE
      | AND c.ts <= p.ts + INTERVAL 10 MINUTE
      |ORDER BY p_id, c_id""".stripMargin

  /** j02 — as-of join: for each purchase, the latest click by the same user
    * at-or-before the purchase, within 1 hour. Candidates via the temporal
    * join, pick via max_by over (ts, event_id) — deterministic under ties.
    */
  private def j02(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user"), col("value").as("p_value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"),
        col("user_id").as("c_user"), col("value").as("c_value"))
    TemporalJoin.asOf(p, c, "p_user", "c_user",
        col("p_ts"), col("c_ts"), Duration.parse("1h"), col("c_id"))
      .select(col("p_id"), col("p_user").as("user_id"), col("p_value"),
        col("c_id"), col("c_value"))
      .orderBy(col("p_id"))
  }

  private val j02Sql =
    """WITH cand AS (
      |  SELECT p.event_id AS p_id, p.user_id AS user_id, p.value AS p_value,
      |         c.event_id AS c_id, c.value AS c_value,
      |         ROW_NUMBER() OVER (PARTITION BY p.event_id
      |                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id
      |   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
      |)
      |SELECT p_id, user_id, p_value, c_id, c_value
      |FROM cand WHERE rn = 1 ORDER BY p_id""".stripMargin

  /** j03 — windowed stream aggregation, batch-checkable: tumbling 1-day
    * windows per event_type (ST7's batch analog — the same window() the
    * streaming path uses with a watermark).
    */
  private def j03(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  private val j03Sql =
    """SELECT time_bucket(INTERVAL 1 DAY, ts) AS w_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY w_start, event_type""".stripMargin

  /** j04 — session windows (ST7): per-user sessions split at ≥30-minute
    * gaps (Spark's `session_window` end is `last ts + gap` EXCLUSIVE, so a
    * gap of exactly 30 minutes starts a new session); the oracle reproduces
    * that boundary with the gaps-and-islands formulation (lag → new-session
    * flag → running sum). Output: one row per session with its start, event
    * count, and value sum.
    */
  private def j04(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  private val j04Sql =
    """WITH o AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL 30 MINUTE OR
      |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessed AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM o)
      |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM sessed GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  /** j05 — conversion funnel: clicks followed by a purchase from the same
    * user within the next hour, rolled up per click-day. EXISTS semantics
    * as a forward-looking RANGE frame over the per-user event-time order —
    * a click converts iff ANY purchase row lands in (t, t + 1 h], i.e. a
    * max-over-frame flag — instead of the former click×purchase left-semi
    * join, whose per-pair predicate evaluation was quadratic in one user's
    * click/purchase counts (a bot user with C clicks and P purchases cost
    * C·P comparisons inside one task; the frame costs one sorted sweep).
    * One shuffle on user_id, the sliding frame advances monotonically, and
    * the day rollup is a single map-side-combined aggregate — no join at
    * all. The frame bounds are inclusive in µs, so `(t, t + 1 h]` is
    * `[t + 1 µs, t + 3600·10⁶ µs]`, matching the join form's strict `>` /
    * inclusive `<=` at full event-time precision.
    */
  private def j05(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("tsu"))
    val nextHour = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
      .rangeBetween(1L, hourUs)
    val flagged = ev.withColumn("conv",
      max(when(col("event_type") === "purchase", 1L)).over(nextHour))
    flagged.filter(col("event_type") === "click")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(when(col("conv") === 1L, 1L).otherwise(0L)).as("n_converted"))
      .select(col("day"), col("n_clicks"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_clicks")).as("conv_rate"))
      .orderBy(col("day"))
  }

  private val j05Sql =
    """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      |conv AS (SELECT c.user_id, c.ts FROM c
      |  WHERE EXISTS (SELECT 1 FROM p
      |    WHERE p.user_id = c.user_id
      |      AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)),
      |a AS (SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_clicks
      |  FROM c GROUP BY 1),
      |b AS (SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_converted
      |  FROM conv GROUP BY 1)
      |SELECT a.day, a.n_clicks,
      |  COALESCE(b.n_converted, 0) AS n_converted,
      |  CAST(COALESCE(b.n_converted, 0) AS DOUBLE) / a.n_clicks AS conv_rate
      |FROM a LEFT JOIN b ON a.day = b.day
      |ORDER BY a.day""".stripMargin

  /** j06 — retention cohorts: users grouped by first-activity week, tracked
    * by distinct weekly activity — the week-N retention matrix every
    * engagement pipeline reports. Cohort assignment is one min-aggregation
    * per user; the matrix is one distinct (user, week) aggregation joined to
    * per-cohort sizes — all keyed aggregations, no windows, no self-join of
    * the raw event stream. Both engines truncate weeks to Monday 00:00, and
    * week offsets divide exactly, so the matrix is integer-deterministic.
    */
  private def j06(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val sizes = cohort.groupBy(col("cohort_wk"))
      .agg(count(lit(1)).as("cohort_size"))
    ev.distinct().join(cohort, "user_id")
      .groupBy(col("cohort_wk"), col("wk"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(sizes, "cohort_wk")
      .select(col("cohort_wk").cast("date").as("cohort_week"),
        (datediff(col("wk").cast("date"), col("cohort_wk").cast("date")) / lit(7))
          .cast("long").as("week_offset"),
        col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  private val j06Sql =
    """WITH ev AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      | FROM events),
      |cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id),
      |sizes AS (SELECT cohort_wk, COUNT(*) AS cohort_size
      | FROM cohort GROUP BY cohort_wk),
      |m AS (SELECT c.cohort_wk, e.wk, COUNT(DISTINCT e.user_id) AS n_active
      | FROM ev e JOIN cohort c ON e.user_id = c.user_id
      | GROUP BY c.cohort_wk, e.wk)
      |SELECT CAST(m.cohort_wk AS DATE) AS cohort_week,
      |  CAST(date_diff('day', m.cohort_wk, m.wk) // 7 AS BIGINT) AS week_offset,
      |  n_active, cohort_size,
      |  CAST(n_active AS DOUBLE) / cohort_size AS retention
      |FROM m JOIN sizes ON m.cohort_wk = sizes.cohort_wk
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** j07 — sliding (hopping) windows, completing the window triad with j03
    * (tumbling) and j04 (session): 1-hour windows every 30 minutes, so each
    * event lands in exactly 2 windows. Spark's `window(ts, size, slide)`
    * expands rows window-locally (no self-join); the same expression runs
    * under a watermark in the streaming path. The oracle reproduces the
    * epoch-aligned assignment by unnesting both candidate starts per event.
    */
  private def j07(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  private val j07Sql =
    """WITH e AS (SELECT event_type, value,
      |  unnest([time_bucket(INTERVAL 30 MINUTE, ts),
      |          time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS w_start
      | FROM events)
      |SELECT w_start, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM e GROUP BY w_start, event_type
      |ORDER BY w_start, event_type""".stripMargin

  /** j08 — SCD2 interval construction (the lakehouse CDC shape): collapse
    * each user's event stream into runs of consecutive equal event_type and
    * emit one type-2 dimension row per run — version number, valid_from,
    * valid_to = next run's start (NULL ⇒ current row). Gaps-and-islands:
    * lag → change flag → running sum, all inside ONE keyed window partition
    * per user, so the work is a single shuffle on user_id and state is
    * bounded by a user's own history (no corpus-wide window; cf. t12's
    * sharding note). event_id breaks ts ties, making run boundaries — and
    * therefore every output column — deterministic by construction.
    */
  private def j08(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(byUser))
    val iv = runs.groupBy(col("user_id"), col("version"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    val nextRun = Window.partitionBy(col("user_id")).orderBy(col("version"))
    iv.withColumn("valid_to", lead(col("valid_from"), 1).over(nextRun))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  private val j08Sql =
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN LAG(event_type) OVER w IS NULL
      |           OR LAG(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |r AS (
      |  SELECT user_id, event_type, ts,
      |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS version
      |  FROM o),
      |iv AS (
      |  SELECT user_id, version, event_type,
      |    MIN(ts) AS valid_from, COUNT(*) AS n_events
      |  FROM r GROUP BY user_id, version, event_type),
      |x AS (
      |  SELECT user_id, version, event_type, valid_from,
      |    LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |      AS valid_to,
      |    n_events
      |  FROM iv)
      |SELECT user_id, version, event_type, valid_from, valid_to, n_events,
      |  valid_to IS NULL AS is_current
      |FROM x ORDER BY user_id, version""".stripMargin

  /** j09 — interval-overlap range join: for every user session (j04's
    * 30-minute-gap sessions, interval [first ts, last ts]), the number of
    * OTHER sessions — any user — overlapping it in time. The load-
    * concurrency measure behind capacity planning, and the operator class
    * Spark has no native form for: an interval self-join with NO equi key,
    * which naive formulations execute as BroadcastNestedLoopJoin — O(n²)
    * comparisons and a broadcast of half the corpus at scale.
    *
    * Scale shape: time is cut into fixed 1-hour bins; each session explodes
    * to the bins it spans (bounded by session length / bin width), the self
    * join becomes an EQUI-join on bin (hash-partitionable, no broadcast of
    * the big side), the exact overlap predicate filters inside the bin
    * match, and pairs found in several shared bins collapse with one
    * distinct. Overlap is reflexive, so every session matches itself —
    * `count−1` avoids a second left join for zero-concurrency sessions.
    * The bins are internal to the plan (the oracle joins on the raw
    * predicate), so bin width only tunes fan-out, never results. PlanSpec
    * pins the no-nested-loop shape.
    *
    * Cost class, honestly: per-bin occupancy is the CONCURRENCY (sessions
    * per hour), so the join does Σ occ² work — linear in corpus length,
    * quadratic in density. That is output-proportional, not wasteful:
    * Σ n_concurrent (the answer's own mass) is the same Σ occ² up to the
    * near-miss constant that bin width controls, and this form generalizes
    * to pair ENUMERATION (who overlapped whom), which no cheaper plan
    * yields. A deployment needing only the counts would instead take two
    * order-statistic lookups per session (#starts ≤ end − #ends < start −
    * 1) off a prefix-summed per-bin count table — O(n), no pair
    * materialization — at the price of losing the pair list.
    */
  private def j09(s: SparkSession, dir: String): DataFrame = {
    val binSec = 3600L
    val sess = Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(max(col("ts")).as("session_end"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("session_end"))
    val binned = sess.withColumn("bin",
      explode(sequence(
        floor(col("session_start").cast("long") / binSec).cast("long"),
        floor(col("session_end").cast("long") / binSec).cast("long"))))
    val a = binned.select(col("bin").as("a_bin"), col("user_id").as("a_user"),
      col("session_start").as("a_start"), col("session_end").as("a_end"))
    val b = binned.select(col("bin").as("b_bin"), col("user_id").as("b_user"),
      col("session_start").as("b_start"), col("session_end").as("b_end"))
    a.join(b, col("a_bin") === col("b_bin"))
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("a_user"), col("a_start"), col("b_user"), col("b_start"))
      .distinct()
      .groupBy(col("a_user").as("user_id"), col("a_start").as("session_start"))
      .agg((count(lit(1)) - 1).as("n_concurrent"))
      .orderBy(col("user_id"), col("session_start"))
  }

  private val j09Sql =
    """WITH o AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL 30 MINUTE OR
      |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessed AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM o),
      |s AS (
      |  SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end
      |  FROM sessed GROUP BY user_id, session_id)
      |SELECT a.user_id, a.session_start,
      |  CAST(COUNT(*) - 1 AS BIGINT) AS n_concurrent
      |FROM s a JOIN s b
      |  ON a.session_start <= b.session_end AND b.session_start <= a.session_end
      |GROUP BY a.user_id, a.session_start
      |ORDER BY a.user_id, a.session_start""".stripMargin

  /** j10 — j09's concurrency measure written the way a USER would write it:
    * the raw overlap predicate, no manual binning. The no-equi-key join
    * would plan as BroadcastNestedLoopJoin; `graft.plans.RangeJoinRule`
    * (registered through SparkSessionExtensions on every graft session)
    * rewrites the logical plan into the binned equi-join j09 builds by
    * hand — same bins, same reference-point dedup, exact multiplicity —
    * so this query IS the rule's end-to-end oracle check: it shares j09's
    * SQL oracle verbatim, and PlanSpec pins that no nested loop survives.
    * Timestamp bounds here also exercise the rule's epoch-seconds cast
    * path (RangeJoinRuleSpec covers the integer path).
    */
  private def j10(s: SparkSession, dir: String): DataFrame = {
    val sessLazy = Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(max(col("ts")).as("session_end"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("session_end"))
    // Materialize the session table ONCE when the rule is about to rewrite
    // (round 19): the rewrite's three-branch union referenced the lazy
    // subtree six times — six event-table session aggregations per run
    // (before-plan: 6× Exchange→Sort→MergingSessions→HashAggregate).
    // The gate mirrors the rule's own stats gate exactly, so the tiny-side
    // case (PlanSpec's sf0.001 pin) keeps its stats-visible lazy form and
    // the planner's BNLJ choice.
    val sess =
      if (graft.plans.RangeJoinRule.smallSide(
        sessLazy.queryExecution.optimizedPlan,
        s.sessionState.conf)) sessLazy
      else sessLazy.localCheckpoint()
    val a = sess.select(col("user_id").as("a_user"),
      col("session_start").as("a_start"), col("session_end").as("a_end"))
    val b = sess.select(col("user_id").as("b_user"),
      col("session_start").as("b_start"), col("session_end").as("b_end"))
    a.join(b, col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .groupBy(col("a_user").as("user_id"), col("a_start").as("session_start"))
      .agg((count(lit(1)) - 1).as("n_concurrent"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** j11 — event-transition matrix (the Markov bigram over each user's
    * event stream a behavior-sequence feature pipeline derives before
    * training): order every user's events by time, pair each event with its
    * successor via `lead`, then count corpus-wide (from_type → to_type)
    * transitions and row-normalize into transition probabilities.
    *
    * Scale shape: ONE keyed window (partitionBy user_id — per-user event
    * counts are bounded, never a corpus-wide sort partition) feeding a
    * map-side-combined groupBy that collapses to ≤|types|² rows; the
    * probability normalization is a window over that tiny aggregate, so the
    * only data-sized exchange is the per-user hash partition the window
    * already needs. Deterministic under ts ties via the event_id tiebreak.
    */
  private def j11(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val next = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
    next.groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val j11Sql =
    """WITH nx AS (SELECT user_id, event_type,
      |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS to_type
      | FROM events),
      |c AS (SELECT event_type AS from_type, to_type,
      |  CAST(COUNT(*) AS BIGINT) AS n
      | FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
      |FROM c ORDER BY from_type, to_type""".stripMargin

  /** j12 — session path mining: the most common event-type sequences users
    * take within a session (first 5 steps, '>'-joined) — the behavioral
    * pattern table a funnel designer reads before hand-writing j05-style
    * funnels. Sessions are j04's 30-minute `session_window`s; within each,
    * events are collected and sorted by (ts, event_id) so the path is
    * deterministic under shuffle reordering (a bare collect_list is not),
    * then paths are counted and the global top-20 taken under a total
    * order (count desc, path).
    *
    * Scale shape: session assembly is the keyed session_window aggregate
    * (per-user state, bounded); within it the first-5 slice is a
    * [[graft.functions.MinKCollect]] min-k buffer — O(5) memory per session
    * regardless of session length, partial-combining map-side, so an
    * always-active bot key can never balloon an agg buffer (a bare
    * sort_array(collect_list(...)) holds the whole session first); the path
    * census is a map-side-combined groupBy on a low-cardinality string;
    * top-20 plans as TakeOrdered (no global sort materialization).
    */
  private def j12(s: SparkSession, dir: String): DataFrame = {
    val firstK = graft.functions.MinKCollect.pathEvents(5)
    val sess = Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(firstK(col("ts"), col("event_id"), col("event_type")).as("evs"))
    val path = concat_ws(">",
      transform(col("evs"), e => e.getField("event_type")))
    sess.select(path.as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(20)
  }

  private val j12Sql =
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL 30 MINUTE OR
      |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessed AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM o),
      |p AS (SELECT user_id, session_id,
      |  array_to_string(list_slice(
      |    list(event_type ORDER BY ts, event_id), 1, 5), '>') AS path
      | FROM sessed GROUP BY user_id, session_id)
      |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      |FROM p GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  /** j13 — linear multi-touch attribution: split each purchase's value
    * evenly across the user's clicks in the preceding hour (the candidate
    * set j02's as-of join picks ONE winner from; here every touch gets
    * credit). Exact largest-remainder arithmetic in integer cents: each of
    * the k touches gets cents DIV k, the first cents MOD k touches (in
    * time order) one extra cent — shares sum to the purchase value to the
    * cent, deterministically, with no float division in the split.
    *
    * Scale shape: the candidate join is the interval-binned temporal join
    * (equi-key user × time bin, never a cartesian); the rank/count windows
    * key on p_id — per-purchase partitions bounded by the 1 h window's
    * click count, spread over the purchase space.
    */
  private def j13(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user"), col("value").as("p_value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"),
        col("user_id").as("c_user"))
    val cand = TemporalJoin.batch(p, c, "p_user", "c_user",
        col("p_ts"), col("c_ts"), Duration.parse("1h"))
      .filter(col("c_ts") <= col("p_ts"))
    val rw = Window.partitionBy(col("p_id")).orderBy(col("c_ts"), col("c_id"))
    val kw = Window.partitionBy(col("p_id"))
    cand
      .withColumn("touch_rank", row_number().over(rw).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(kw))
      .withColumn("cents",
        round(col("p_value").cast("double") * 100).cast("long"))
      .withColumn("share_cents",
        expr("cents DIV n_touches") +
          when(col("touch_rank") <= expr("cents % n_touches"), 1L)
            .otherwise(0L))
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
        col("touch_rank"), col("n_touches"), col("share_cents"),
        (col("share_cents").cast("double") / 100.0).as("share_value"))
      .orderBy(col("p_id"), col("touch_rank"))
  }

  private val j13Sql =
    """WITH cand AS (
      |  SELECT p.event_id AS p_id, c.event_id AS c_id,
      |         p.user_id AS user_id, c.ts AS c_ts,
      |         CAST(round(CAST(p.value AS DOUBLE) * 100) AS BIGINT) AS cents
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id
      |   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR),
      |r AS (SELECT p_id, c_id, user_id, cents,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ts, c_id)
      |    AS BIGINT) AS touch_rank,
      |  CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS n_touches
      | FROM cand)
      |SELECT p_id, c_id, user_id, touch_rank, n_touches,
      |  cents // n_touches
      |    + CASE WHEN touch_rank <= cents % n_touches THEN 1 ELSE 0 END
      |    AS share_cents,
      |  CAST(cents // n_touches
      |    + CASE WHEN touch_rank <= cents % n_touches THEN 1 ELSE 0 END
      |    AS DOUBLE) / 100.0 AS share_value
      |FROM r ORDER BY p_id, touch_rank""".stripMargin

  /** j14 — SCD2 point-in-time lookup: build a slowly-changing dimension
    * from each user's CLICK stream (value-band runs: band = cents DIV
    * 2500, a new version whenever the band changes, half-open
    * [valid_from, valid_to) intervals), then join every PURCHASE to the
    * version that was current AT ITS TIMESTAMP — the standard warehouse
    * fact-to-SCD2 join ("what was the customer's state when they
    * bought"), which j08 builds the intervals for but nothing consumed.
    * Half-open intervals make the lookup exact under timestamp ties;
    * purchases before a user's first click have no version and are
    * dropped (inner semantics, counted by the caller via row count).
    *
    * Scale shape: the dimension build is per-user windows (keyed, spread);
    * the lookup is an EQUI-join on user_id with the interval predicate as
    * a join filter — at 100 TB that's one shuffle on the user key, no
    * range machinery needed because SCD2 lookups always carry the entity
    * key (the keyless case is j10's range-join-rule territory).
    */
  private def j14(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clicks = Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) DIV 2500")
          .as("band"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runs = clicks
      .withColumn("prev", lag(col("band"), 1).over(byUser))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("band"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(byUser))
    val iv = runs.groupBy(col("user_id"), col("version"), col("band"))
      .agg(min(col("ts")).as("valid_from"))
    val nextRun = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val dim = iv.withColumn("valid_to", lead(col("valid_from"), 1).over(nextRun))
    val facts = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"),
        col("value").as("p_value"))
    facts.join(dim,
        facts("user_id") === dim("user_id") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("p_id"), facts("user_id").as("user_id"), col("p_value"),
        col("version"), col("band"))
      .orderBy(col("p_id"))
  }

  private val j14Sql =
    """WITH c AS (SELECT user_id, ts, event_id,
      |  CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) // 2500 AS band
      | FROM events WHERE event_type = 'click'),
      |o AS (SELECT user_id, ts, event_id, band,
      |  CASE WHEN LAG(band) OVER w IS NULL OR LAG(band) OVER w <> band
      |       THEN 1 ELSE 0 END AS chg
      | FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |r AS (SELECT user_id, ts, band,
      |  CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS version
      | FROM o),
      |iv AS (SELECT user_id, version, band, MIN(ts) AS valid_from
      | FROM r GROUP BY user_id, version, band),
      |dim AS (SELECT user_id, version, band, valid_from,
      |  LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |    AS valid_to
      | FROM iv)
      |SELECT p.event_id AS p_id, p.user_id AS user_id, p.value AS p_value,
      |  dim.version, dim.band
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN dim ON dim.user_id = p.user_id
      | AND p.ts >= dim.valid_from
      | AND (dim.valid_to IS NULL OR p.ts < dim.valid_to)
      |ORDER BY p_id""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("j01_temporal_join", j01, Some(j01Sql)),
    QueryDef("j02_asof_join", j02, Some(j02Sql)),
    QueryDef("j03_tumbling_window_agg", j03, Some(j03Sql)),
    QueryDef("j04_session_window_agg", j04, Some(j04Sql)),
    QueryDef("j05_conversion_funnel", j05, Some(j05Sql)),
    QueryDef("j06_retention_cohorts", j06, Some(j06Sql)),
    QueryDef("j07_sliding_window_agg", j07, Some(j07Sql)),
    QueryDef("j08_scd2_intervals", j08, Some(j08Sql)),
    QueryDef("j09_concurrent_sessions", j09, Some(j09Sql)),
    QueryDef("j10_concurrent_auto", j10, Some(j09Sql)),
    QueryDef("j11_event_transitions", j11, Some(j11Sql)),
    QueryDef("j12_session_paths", j12, Some(j12Sql)),
    QueryDef("j13_attribution", j13, Some(j13Sql)),
    QueryDef("j14_pit_lookup", j14, Some(j14Sql)),
    QueryDef("j15_nearest_join", j15, Some(j15Sql)),
    QueryDef("j16_interval_islands", j16, Some(j16Sql)),
    QueryDef("j17_event_trigrams", j17, Some(j17Sql)),
    QueryDef("j18_event_cadence", j18, Some(j18Sql)),
    QueryDef("j19_attribution_policies", j19, Some(j19Sql)),
    QueryDef("j20_range_enrich", j20, Some(j20Sql)))

  /** j19 — attribution-policy comparison: the purchase→preceding-24h
    * click candidates (j13's machinery, wider lookback so multi-touch
    * paths actually occur), credited under FOUR policies — first-touch,
    * last-touch, linear (j13's largest-remainder split), and time-decay
    * (weight doubling toward the purchase, integer shares by weighted
    * floor + largest remainder) — rolled up by touch position (single /
    * first / middle / last). The marketing-warehouse shape where the
    * POLICY is the analysis: every policy's column sums to the same total
    * purchase cents (exact integer conservation — the oracle enforces it
    * value-for-value), and the position rollup shows precisely how much
    * credit each policy moves from early to late touches.
    *
    * Scale shape: j13's purchase-keyed windows (all partitions by p_id)
    * plus one unpivot; the rollup is a ≤16-row agg. Decay weights are
    * capped shifts (2^min(rk−1,30)) — pure integer, no float until the
    * display column.
    */
  private def j19(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user"), col("value").as("p_value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"),
        col("user_id").as("c_user"))
    val cand = TemporalJoin.batch(p, c, "p_user", "c_user",
        col("p_ts"), col("c_ts"), Duration.parse("24h"))
      .filter(col("c_ts") <= col("p_ts"))
    val rw = Window.partitionBy(col("p_id")).orderBy(col("c_ts"), col("c_id"))
    val kw = Window.partitionBy(col("p_id"))
    val base = cand
      .withColumn("rk", row_number().over(rw).cast("long"))
      .withColumn("n", count(lit(1)).over(kw))
      .withColumn("cents",
        round(col("p_value").cast("double") * 100).cast("long"))
      .withColumn("w",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(least(rk - 1, 30) AS INT))"))
      .withColumn("ww", sum(col("w")).over(kw))
      .withColumn("dfloor", expr("(cents * w) DIV ww"))
      .withColumn("sfloor", sum(col("dfloor")).over(kw))
      .withColumn("rem_rank", row_number().over(
        Window.partitionBy(col("p_id")).orderBy(col("rk").desc)).cast("long"))
      .withColumn("lin_share", expr("cents DIV n") +
        when(col("rk") <= expr("cents % n"), 1L).otherwise(0L))
      .withColumn("first_share",
        when(col("rk") === 1, col("cents")).otherwise(0L))
      .withColumn("last_share",
        when(col("rk") === col("n"), col("cents")).otherwise(0L))
      .withColumn("decay_share", col("dfloor") +
        when(col("rem_rank") <= col("cents") - col("sfloor"), 1L)
          .otherwise(0L))
      .withColumn("pos",
        when(col("n") === 1, "single").when(col("rk") === 1, "first")
          .when(col("rk") === col("n"), "last").otherwise(lit("middle")))
    base.select(col("pos"), expr(
        "stack(4, 'first_touch', first_share, 'last_touch', last_share, " +
          "'linear', lin_share, 'time_decay', decay_share) " +
          "AS (policy, share_cents)"))
      .groupBy(col("policy"), col("pos"))
      .agg(sum(col("share_cents")).as("cents"),
        count(lit(1)).as("n_touches"))
      .select(col("policy"), col("pos"), col("cents"), col("n_touches"),
        (col("cents").cast("double") / 100.0).as("value"))
      .orderBy(col("policy"), col("pos"))
  }

  private val j19Sql =
    """WITH cand AS (
      |  SELECT p.event_id AS p_id, c.event_id AS c_id, c.ts AS c_ts,
      |         CAST(round(CAST(p.value AS DOUBLE) * 100) AS BIGINT) AS cents
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id
      |   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 24 HOUR),
      |r AS (SELECT p_id, cents,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ts, c_id)
      |    AS BIGINT) AS rk,
      |  CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS n
      | FROM cand),
      |wts AS (SELECT p_id, cents, rk, n,
      |  (CAST(1 AS BIGINT) << CAST(LEAST(rk - 1, 30) AS INT)) AS w
      | FROM r),
      |agg AS (SELECT p_id, cents, rk, n, w,
      |  CAST(SUM(w) OVER (PARTITION BY p_id) AS BIGINT) AS ww,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY rk DESC)
      |    AS BIGINT) AS rem_rank
      | FROM wts),
      |sh AS (SELECT p_id, cents, rk, n, rem_rank,
      |  (cents * w) // ww AS dfloor,
      |  CAST(SUM((cents * w) // ww) OVER (PARTITION BY p_id) AS BIGINT)
      |    AS sfloor
      | FROM agg),
      |b AS (SELECT *,
      |  cents // n + CASE WHEN rk <= cents % n THEN 1 ELSE 0 END AS lin_share,
      |  CASE WHEN rk = 1 THEN cents ELSE 0 END AS first_share,
      |  CASE WHEN rk = n THEN cents ELSE 0 END AS last_share,
      |  dfloor + CASE WHEN rem_rank <= cents - sfloor THEN 1 ELSE 0 END
      |    AS decay_share,
      |  CASE WHEN n = 1 THEN 'single' WHEN rk = 1 THEN 'first'
      |       WHEN rk = n THEN 'last' ELSE 'middle' END AS pos
      | FROM sh),
      |u AS (
      |  SELECT 'first_touch' AS policy, pos, first_share AS share FROM b
      |  UNION ALL SELECT 'last_touch', pos, last_share FROM b
      |  UNION ALL SELECT 'linear', pos, lin_share FROM b
      |  UNION ALL SELECT 'time_decay', pos, decay_share FROM b)
      |SELECT policy, pos, CAST(SUM(share) AS BIGINT) AS cents,
      |  CAST(COUNT(*) AS BIGINT) AS n_touches,
      |  CAST(SUM(share) AS DOUBLE) / 100.0 AS value
      |FROM u GROUP BY policy, pos ORDER BY policy, pos""".stripMargin

  /** j18 — per-user cadence profile: bucket each user's consecutive
    * inter-event gaps into fixed bands (sub-second, <10 s, <1 min,
    * <10 min, <1 h, ≥1 h) and report the modal band with its share — the
    * automation screen (humans have heavy-tailed mixed cadences; bots
    * cluster their entire gap mass in one narrow band, modal share → 1).
    * Bands are integer µs threshold comparisons — no float, no log — and
    * the modal pick breaks count ties toward the smaller band index.
    *
    * Scale shape: one user-keyed LAG window, a (user, band)-keyed count,
    * one user-keyed modal window (rank by count desc). All three stages
    * hash-partition by user.
    */
  private def j18(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .filter(col("gap_us").isNotNull)
      .withColumn("band",
        when(col("gap_us") < 1000000L, 0L)
          .when(col("gap_us") < 10000000L, 1L)
          .when(col("gap_us") < 60000000L, 2L)
          .when(col("gap_us") < 600000000L, 3L)
          .when(col("gap_us") < 3600000000L, 4L)
          .otherwise(5L))
    val perBand = gaps.groupBy(col("user_id"), col("band"))
      .agg(count(lit(1)).as("band_n"))
    val modal = Window.partitionBy(col("user_id"))
      .orderBy(col("band_n").desc, col("band"))
    perBand
      .withColumn("rk", row_number().over(modal))
      .withColumn("n_gaps",
        sum(col("band_n")).over(Window.partitionBy(col("user_id"))))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("n_gaps"), col("band").as("modal_band"),
        col("band_n").as("modal_n"),
        (col("band_n").cast("double") / col("n_gaps").cast("double"))
          .as("modal_share"))
      .orderBy(col("user_id"))
  }

  private val j18Sql =
    """WITH g AS (SELECT user_id,
      |  epoch_us(ts) - epoch_us(LAG(ts, 1) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id)) AS gap_us
      | FROM events),
      |b AS (SELECT user_id,
      |  CASE WHEN gap_us < 1000000 THEN 0 WHEN gap_us < 10000000 THEN 1
      |    WHEN gap_us < 60000000 THEN 2 WHEN gap_us < 600000000 THEN 3
      |    WHEN gap_us < 3600000000 THEN 4 ELSE 5 END AS band
      | FROM g WHERE gap_us IS NOT NULL),
      |c AS (SELECT user_id, band, CAST(COUNT(*) AS BIGINT) AS band_n
      |  FROM b GROUP BY user_id, band),
      |r AS (SELECT user_id, band, band_n,
      |  ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY band_n DESC, band) AS rk,
      |  CAST(SUM(band_n) OVER (PARTITION BY user_id) AS BIGINT) AS n_gaps
      | FROM c)
      |SELECT user_id, n_gaps, CAST(band AS BIGINT) AS modal_band,
      |  band_n AS modal_n,
      |  CAST(band_n AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS modal_share
      |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin

  /** j17 — frequent behavioral trigrams: the top-20 most common
    * consecutive event-type triples across all user timelines — sequential
    * pattern mining at fixed length, the corpus-level complement of j11's
    * per-user transition matrix (j11 normalizes per user and stops at
    * bigrams; this ranks raw length-3 motifs globally — the "view → click
    * → purchase" discovery query). Consecutiveness is per-user event
    * order with a total (ts, event_id) tiebreak.
    *
    * Scale shape: one user-keyed window pass (two LEADs over the same
    * sort — Spark collapses them into a single Window operator), a
    * map-side-combined count keyed by the triple, and a top-20
    * TakeOrderedAndProject. No joins, no explode.
    */
  private def j17(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  private val j17Sql =
    """WITH s AS (SELECT user_id, event_type AS t1,
      |  LEAD(event_type, 1) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS t2,
      |  LEAD(event_type, 2) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS t3
      | FROM events)
      |SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
      |FROM s WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      |GROUP BY t1, t2, t3
      |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin

  /** j15 — nearest-neighbor temporal join (pandas merge_asof
    * direction='nearest'): each purchase matched to the CLOSEST click by
    * the same user in either time direction — j02's as-of join only looks
    * backward; attribution models that allow post-purchase confirmation
    * clicks need both sides. Ties (equidistant before/after) resolve to the
    * earlier click; a click at the exact purchase instant counts as
    * 'before' with distance 0.
    *
    * Scale shape: ONE shuffle by user_id and one sorted window pass over
    * the union-tagged event stream — prev-click via last(IGNORE NULLS)
    * over the preceding frame, next-click via first(IGNORE NULLS) over the
    * following frame, then a per-row min. The canonical distributed
    * two-sided as-of: no self-join, no range explosion, per-user state is
    * one struct in each direction.
    */
  private def j15(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"),
        when(col("event_type") === "click", lit(0)).otherwise(lit(1))
          .as("kind"),
        when(col("event_type") === "click",
          struct(col("ts").as("c_ts"), col("event_id").as("c_id")))
          .as("cs"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // next-click = the RUNNING last over the DESCENDING order, not a
    // CURRENT ROW → UNBOUNDED FOLLOWING frame: Spark recomputes
    // unbounded-following frames from scratch per output row (O(n²) per
    // partition — the bot-user hazard the round-15 funnel-skew arm
    // caught in the strict_dedup funnel); the reversed running frame is
    // the same row set with the O(n) accumulating implementation.
    val ordDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("kind").desc, col("event_id").desc)
    val wNext = ordDesc.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val tagged = ev.select(col("event_id"), col("ts"), col("user_id"),
      col("kind"),
      last(col("cs"), ignoreNulls = true).over(wPrev).as("prev"),
      last(col("cs"), ignoreNulls = true).over(wNext).as("next"))
    val p = tagged.filter(col("kind") === 1)
      .filter(col("prev").isNotNull || col("next").isNotNull)
    val dPrev = unix_micros(col("ts")) - unix_micros(col("prev.c_ts"))
    val dNext = unix_micros(col("next.c_ts")) - unix_micros(col("ts"))
    val usePrev = col("next").isNull ||
      (col("prev").isNotNull && dPrev <= dNext)
    p.select(col("event_id").as("p_id"), col("user_id"),
        when(usePrev, col("prev.c_id")).otherwise(col("next.c_id")).as("c_id"),
        when(usePrev, lit("before")).otherwise(lit("after")).as("direction"),
        when(usePrev, dPrev).otherwise(dNext).as("diff_us"))
      .orderBy(col("p_id"))
  }

  private val j15Sql =
    """WITH ev AS (SELECT event_id, ts, user_id,
      |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
      |    CASE WHEN event_type = 'click' THEN ts END AS c_ts,
      |    CASE WHEN event_type = 'click' THEN event_id END AS c_id
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |t AS (SELECT event_id, ts, user_id, kind,
      |  LAST_VALUE(c_ts IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts, kind, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
      |  LAST_VALUE(c_id IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts, kind, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_id,
      |  FIRST_VALUE(c_ts IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts, kind, event_id
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts,
      |  FIRST_VALUE(c_id IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts, kind, event_id
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_id
      | FROM ev),
      |p AS (SELECT * FROM t WHERE kind = 1
      |  AND (prev_ts IS NOT NULL OR next_ts IS NOT NULL)),
      |d AS (SELECT event_id AS p_id, user_id,
      |  epoch_us(ts) - epoch_us(prev_ts) AS d_prev,
      |  epoch_us(next_ts) - epoch_us(ts) AS d_next,
      |  prev_id, next_id,
      |  (next_ts IS NULL OR (prev_ts IS NOT NULL
      |     AND epoch_us(ts) - epoch_us(prev_ts)
      |         <= epoch_us(next_ts) - epoch_us(ts))) AS use_prev
      | FROM p)
      |SELECT p_id, user_id,
      |  CASE WHEN use_prev THEN prev_id ELSE next_id END AS c_id,
      |  CASE WHEN use_prev THEN 'before' ELSE 'after' END AS direction,
      |  CASE WHEN use_prev THEN d_prev ELSE d_next END AS diff_us
      |FROM d ORDER BY p_id""".stripMargin

  /** j16 activity-interval half-width: each event opens a 10-minute
    * presence window.
    */
  private val IslandSpanUs = 600000000L

  /** j16 — gaps-and-islands interval coverage: merge each user's
    * overlapping activity intervals (event ts .. ts+10min) into maximal
    * islands and report per-user presence — island count, total covered
    * time, longest island — the sessionize-by-overlap warehouse classic
    * (and j04's session_window computed the relational way: an island IS
    * a session with a 10-minute gap timeout). New-island detection is the
    * running-max trick: an event starts an island iff its start exceeds
    * the max end among all earlier events of that user.
    *
    * Scale shape: two user-keyed window passes (running max-end, then
    * island prefix-sum) and two keyed aggs — partitions by user_id, no
    * join, no global sort; exactly the shape Spark distributes by hash on
    * the window key. All arithmetic in exact epoch-µs longs.
    */
  private def j16(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"))
      .withColumn("end_us", col("ts_us") + IslandSpanUs)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val prevMaxEnd = max(col("end_us"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = ev
      .withColumn("new_island",
        when(prevMaxEnd.isNull || col("ts_us") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("ts_us")).as("start_us"), max(col("end_us")).as("end_us"))
    islands.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("end_us") - col("start_us")).as("covered_us"),
        max(col("end_us") - col("start_us")).as("longest_us"))
      .orderBy(col("user_id"))
  }

  private val j16Sql =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
       |  epoch_us(ts) + $IslandSpanUs AS end_us FROM events),
       |f AS (SELECT user_id, ts_us, end_us, event_id,
       |  MAX(end_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
       | FROM e),
       |g AS (SELECT user_id, ts_us, end_us, event_id,
       |  CASE WHEN prev_max_end IS NULL OR ts_us > prev_max_end
       |    THEN 1 ELSE 0 END AS new_island FROM f),
       |h AS (SELECT user_id, ts_us, end_us,
       |  SUM(new_island) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       | FROM g),
       |i AS (SELECT user_id, island, MIN(ts_us) AS start_us,
       |  MAX(end_us) AS end_us FROM h GROUP BY user_id, island)
       |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
       |  CAST(SUM(end_us - start_us) AS BIGINT) AS covered_us,
       |  CAST(MAX(end_us - start_us) AS BIGINT) AS longest_us
       |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin

  /** j20 — range-enrichment lookup (point-in-interval join, NO equi key):
    * every lineitem priced into the 64 equal-frequency spend brackets
    * derived from o_totalprice, reported as per-bracket line counts and
    * cents mass. The bracket table is a stand-in for any external
    * interval dimension — CIDR→geo blocks, tax brackets, sensor
    * calibration bands — the lookups a pipeline must do WITHOUT an equi
    * key; disjoint half-open [lo, hi) brackets mean each line matches ≤1
    * interval, so join output ≤ |fact| by construction.
    *
    * Scale shape — deliberately DECLARATIVE: the join is written as the
    * natural `cents >= lo AND cents < hi` predicate and the physical
    * strategy is the planner's call. At this dim size (64 rows) the
    * [[graft.plans.RangeJoinRule]] stats gate correctly leaves it on
    * BroadcastNestedLoopJoin — a 64-entry broadcast probe per row beats
    * two explodes plus a shuffle. Against a big interval dim (1M CIDR
    * blocks) the SAME code re-plans through the rule into the
    * bin-exploded hash equi-join with the exact predicate re-checked
    * inside the bin match (RangeJoinRuleSpec pins result identity both
    * ways; j10 measured the rewrite at 25 s → ~1 s on the overlap form).
    * Hand-banding the join here would freeze ONE physical strategy into
    * the query — the rule exists so the logical plan stays this simple.
    *
    * The bracket BUILD refuses the global sort (same rule as t33/t41): a
    * naive `ntile(64) OVER (ORDER BY cents)` moves the whole dim source
    * into ONE task. Each bracket floor is really just the VALUE at a
    * known global rank (ntile's tile-start rank — with ties the rank's
    * value is unique even though which row holds it is not), so it is
    * computed by exact distributed rank selection instead: one bounded
    * stats row, one ≤4096-bucket histogram collect (bucket count fixed by
    * the value RANGE, not the corpus — t41's coarse-bucket pattern), a
    * driver walk locating each of the 64 tile-start ranks in its bucket,
    * and one row_number window over ONLY the ≤64 boundary buckets. The
    * oracle keeps the readable ntile spec; the results are bit-identical
    * by the rank argument above.
    */
  private def j20(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the bracket build reads the cents projection THREE times (stats row,
    // histogram collect, boundary-bucket rank window) — the passes are
    // sequentially dependent by construction (bucket width needs min/max),
    // so materialize the one narrow column once instead of re-scanning
    // orders per pass (round 19; 8 bytes/row, orders-sized)
    val o = Tables.orders(s, dir).select(
      round(col("o_totalprice") * 100).cast("long").as("cents"))
      .localCheckpoint()
    val st = o.agg(count(lit(1)).as("n"), min(col("cents")).as("mn"),
      max(col("cents")).as("mx")).head()
    val n = st.getLong(0)
    require(n > 0, "j20 needs a non-empty orders table")
    val mn = st.getLong(1)
    val mx = st.getLong(2)
    // ntile(64): the first (n mod 64) tiles take ceil(n/64) rows — the
    // tile-start global ranks are pure arithmetic
    val q64 = n / 64
    val r64 = n % 64
    val starts: Seq[(Long, Long)] = // (bracket, 1-indexed start rank)
      (1L to math.min(64L, n)).map(t =>
        t -> ((t - 1) * q64 + math.min(t - 1, r64) + 1))
    val width = math.max(1L, (mx - mn) / 4096L + 1L)
    val hist = o.groupBy(expr(s"(cents - $mn) div $width").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // driver walk: (bucket, local rank) of each tile-start global rank
    val targets: Seq[(Long, Long, Long)] = { // (bucket, local rank, bracket)
      var cum = 0L
      val cums = hist.map { case (b, c) => val lo = cum; cum += c; (b, lo, c) }
      starts.map { case (t, k) =>
        val (b, before, _) = cums.find { case (_, lo, c) => k <= lo + c }.get
        (b, k - before, t)
      }
    }
    val bset = targets.map(_._1).distinct
    import s.implicits._
    val tgt = targets.toDF("tb", "l", "bracket")
    // the l-th smallest cents inside a boundary bucket IS the tile floor:
    // row_number over cents is value-deterministic at every rank (ties
    // share the value), and only boundary-bucket rows pay the sort
    val lows = o
      .withColumn("b", expr(s"(cents - $mn) div $width"))
      .filter(col("b").isin(bset: _*))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("cents"))).cast("long"))
      .join(broadcast(tgt), col("b") === col("tb") && col("rn") === col("l"))
      .select(col("bracket"), col("cents").as("lo_cents"))
      // ≤64 rows, and the range-join rewrite references the bracket table
      // from BOTH its branches (binned equi-join + residual) — round 18
      // measured the whole rank-selection subtree executing twice per run.
      // Collect the bounded bracket list and finish it driver-side so the
      // join consumes a LocalRelation the branches duplicate for free.
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // half-open [lo, hi): hi = next bracket's lo, last bracket = max+1;
    // ties split across a tile boundary can zero a bracket's width —
    // filter those (they can match nothing). 64 rows: window is free.
    val brackets = lows.zipWithIndex.map { case ((t, lo), i) =>
        val hi = if (i + 1 < lows.length) lows(i + 1)._2 else mx + 1L
        (t, lo, hi)
      }.filter { case (_, lo, hi) => lo < hi }
      .toSeq.toDF("bracket", "lo_cents", "hi_cents")
    val fact = Tables.lineitem(s, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
    fact.join(brackets,
        col("cents") >= col("lo_cents") && col("cents") < col("hi_cents"))
      .groupBy(col("bracket"), col("lo_cents"), col("hi_cents"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("bracket"))
  }

  private val j20Sql =
    """WITH o AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
      |  o_orderkey FROM orders),
      |t AS (SELECT cents,
      |  NTILE(64) OVER (ORDER BY cents, o_orderkey) AS bracket FROM o),
      |b0 AS (SELECT bracket, MIN(cents) AS lo_cents FROM t GROUP BY bracket),
      |b AS (SELECT bracket, lo_cents,
      |  COALESCE(LEAD(lo_cents) OVER (ORDER BY bracket),
      |    (SELECT MAX(cents) + 1 FROM o)) AS hi_cents
      | FROM b0),
      |l AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem)
      |SELECT b.bracket, b.lo_cents, b.hi_cents,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(l.cents) AS BIGINT) AS sum_cents
      |FROM b JOIN l ON l.cents >= b.lo_cents AND l.cents < b.hi_cents
      |WHERE b.lo_cents < b.hi_cents
      |GROUP BY b.bracket, b.lo_cents, b.hi_cents
      |ORDER BY b.bracket""".stripMargin
}
