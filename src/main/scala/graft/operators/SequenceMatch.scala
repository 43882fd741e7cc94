package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The sequence-pattern engine behind the funnel/sequence query family —
  * a typed, compiled form of ClickHouse's `sequenceMatch('(?1).*(?2)…')`
  * condition-chain patterns (the sink engine's fourth sequence-analytics
  * primitive next to the windowFunnel modes r27/r29/r31/r33; reference
  * provenance: the ClickHouse sink the load-test pipeline writes into,
  * `docker-compose.yaml` services in the reference repo).
  *
  * A [[SequenceMatch.Pattern]] is K step conditions joined by K−1 typed
  * gaps:
  *
  *   - [[SequenceMatch.AnyGap]]      — `.*`: any events (matching any
  *     pattern condition or none) may separate the steps.
  *   - [[SequenceMatch.Within]]      — `(?t<=s).*`: the next step must
  *     land within `s` seconds of the previous step (inclusive).
  *   - [[SequenceMatch.AtLeast]]     — `(?t>=s).*`: the next step must
  *     land at least `s` seconds after the previous step (inclusive).
  *   - [[SequenceMatch.Adjacent]]    — the next step must be the VERY
  *     NEXT event of the condition-filtered subsequence (ClickHouse's
  *     "events that don't match any condition are skipped" reading: only
  *     rows matching at least one pattern condition are sequenced at
  *     all, so unrelated events never break adjacency).
  *
  * Events are sequenced per user by the family's shared (ts, event_id)
  * total order; time bounds compare event-time microseconds.
  *
  * == Why one pass of running extrema is EXACT, not a greedy heuristic ==
  *
  * Let reach_k(row) := "a chain of steps 1..k satisfying all gap
  * constraints ends at this row". reach_1(row) = cond_1(row). For k > 1,
  * reach_k(row) = cond_k(row) ∧ ∃ r' strictly before row in the sequence
  * with reach_{k−1}(r') and gap_{k−1}(ts(r'), ts(row)). Because every gap
  * constraint relates ONLY the two adjacent steps' timestamps and is
  * monotone in ts(r') — `Within` wants ts(r') ≥ ts(row) − s (the LATEST
  * reach end is most permissive), `AtLeast` wants ts(r') ≤ ts(row) − s
  * (the EARLIEST), `AnyGap` wants existence — the ∃ collapses to one
  * running MAX (resp. MIN) over the per-user sequence of the previous
  * level's reach timestamps, and `Adjacent` to a lag(1). By induction
  * each level is exact, so the per-user pattern match is exact:
  * sequenceMatch = ∃ row with reach_K(row). This is the same
  * max-anchor-is-lossless argument r27's scaladoc makes for the EXISTS
  * windowFunnel, generalized to arbitrary chains with per-gap bounds.
  *
  * == Scale shape ==
  *
  * The condition filter pushes into the scan (only pattern-relevant rows
  * leave it); every level's window shares ONE partitionBy(user)
  * orderBy(ts, event_id) sort — K−1 stacked window passes over a single
  * user-keyed shuffle, no joins, no pair tables, O(1) state per row. A
  * bot user costs one sorted run (the funnel-skew-arm shape r27/r29
  * stress). This is the engine r32 instantiates and whose 2-step greedy
  * COUNT specialization ([[countGreedy2]]) r30 is.
  */
object SequenceMatch {

  /** How two adjacent pattern steps may be separated. */
  sealed trait Gap

  /** `.*` — any number of events of any kind between the steps. */
  case object AnyGap extends Gap

  /** `(?t<=seconds).*` — the next step within `seconds` of the previous
    * (inclusive), any events between.
    */
  final case class Within(seconds: Long) extends Gap

  /** `(?t>=seconds).*` — the next step at least `seconds` after the
    * previous (inclusive), any events between.
    */
  final case class AtLeast(seconds: Long) extends Gap

  /** The next step is the immediately following row of the
    * condition-filtered subsequence (events matching no pattern
    * condition are skipped, per the ClickHouse sequence semantics).
    */
  case object Adjacent extends Gap

  /** K step conditions (Column predicates over the event frame) joined
    * by K−1 typed gaps.
    */
  final case class Pattern(steps: Seq[Column], gaps: Seq[Gap]) {
    require(steps.size >= 2, "a pattern needs at least two steps")
    require(gaps.size == steps.size - 1,
      s"${steps.size} steps need ${steps.size - 1} gaps, got ${gaps.size}")
  }

  /** Per-user EXISTS match of `pattern` over `events`: one row per user
    * that has at least one pattern-relevant event (rows matching no step
    * condition are filtered before the sort — they can never affect a
    * match), with `matched` = whether a full chain exists.
    *
    * @param user name of the grouping column
    * @param tsu  name of the event-time column in MICROSECONDS (long)
    * @param tie  name of the deterministic tie-break column (event_id)
    */
  def matchesPerUser(events: DataFrame, user: String, tsu: String,
                     tie: String, pattern: Pattern): DataFrame = {
    val filtered = events.filter(pattern.steps.reduce(_ || _))
    val w = Window.partitionBy(col(user)).orderBy(col(tsu), col(tie))
    val prevAll = w.rowsBetween(Window.unboundedPreceding, -1L)
    // _rt<k> carries the reach statistic: this row's event time when a
    // chain of steps 1..k ends here, else null
    var df = filtered.withColumn("_rt1",
      when(pattern.steps.head, col(tsu)))
    for (k <- 2 to pattern.steps.size) {
      val prevReach = col(s"_rt${k - 1}")
      val ok: Column = pattern.gaps(k - 2) match {
        case AnyGap =>
          max(prevReach).over(prevAll).isNotNull
        case Within(s) =>
          max(prevReach).over(prevAll) >= col(tsu) - s * 1000000L
        case AtLeast(s) =>
          min(prevReach).over(prevAll) <= col(tsu) - s * 1000000L
        case Adjacent =>
          lag(prevReach, 1).over(w).isNotNull
      }
      df = df.withColumn(s"_rt$k",
        when(pattern.steps(k - 1) && coalesce(ok, lit(false)), col(tsu)))
    }
    df.groupBy(col(user))
      .agg(max(col(s"_rt${pattern.steps.size}").isNotNull).as("matched"))
  }

  /** windowFunnel EXISTS levels — the K-step generalization of r27/r33's
    * two-pass construction, making the DEFAULT and STRICT_INCREASE
    * funnel modes instances of this engine too: per user, the furthest
    * step k such that a chain step₁ < … < stepₖ completes within
    * `windowSeconds` of its ANCHORING step-1 event (an anchor-window
    * constraint, which [[matchesPerUser]]'s per-gap bounds deliberately
    * cannot express — the windowFunnel window binds every step to the
    * FIRST, not to its predecessor).
    *
    * Construction: carry Aₖ(row) = the anchor time of the best (latest-
    * anchored) step-prefix chain ending at row; A₁ = own ts on a step-1
    * row, Aₖ = running max of A₍ₖ₋₁₎ over strictly-preceding rows on a
    * step-k row, carried UNCONDITIONALLY — a chain whose anchor misses
    * THIS row's window can never revive later (any later row has a
    * larger ts), so validity is checked only where a level is claimed:
    * level(row) ≥ k iff condₖ(row) ∧ Mₖ ≥ ts(row) − w. Maximizing the
    * anchor is lossless for EXISTS (r27's scaladoc argument), and the
    * intermediate steps of a level-k claim are inside the window for
    * free (tsᵢ < tsₖ ≤ anchor + w). Levels nest by construction, so the
    * per-user level is the max of per-row levels.
    *
    * `strictIncrease` selects the mode: false = the family's
    * (ts, event_id) sequence order (ROWS frames — same-microsecond ties
    * chain; ClickHouse default), true = strictly increasing event time
    * (RANGE frames ending −1 µs; ClickHouse `strict_increase`). The two
    * differ ONLY on ties — FunnelModesSpec pins the divergence corpus.
    *
    * Returns (user, level) with EVERY user censused (level 0 = no
    * step-1 event). Scale shape: unchanged from the bespoke r27 — K−1
    * stacked running maxima over one user-keyed sort, no joins, O(1)
    * per-row state; a bot user is one sorted run.
    */
  def funnelLevels(events: DataFrame, user: String, tsu: String,
                   tie: String, steps: Seq[Column], windowSeconds: Long,
                   strictIncrease: Boolean): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val wUs = windowSeconds * 1000000L
    val strictPast =
      if (strictIncrease)
        Window.partitionBy(col(user)).orderBy(col(tsu))
          .rangeBetween(Window.unboundedPreceding, -1L)
      else
        Window.partitionBy(col(user)).orderBy(col(tsu), col(tie))
          .rowsBetween(Window.unboundedPreceding, -1L)
    var df = events.withColumn("_a1", when(steps.head, col(tsu)))
    for (k <- 2 to steps.size) {
      df = df.withColumn(s"_m$k",
          max(col(s"_a${k - 1}")).over(strictPast))
        .withColumn(s"_a$k", when(steps(k - 1), col(s"_m$k")))
    }
    // fold low→high so the HIGHEST satisfied level wraps outermost and
    // wins when step conditions overlap
    val rowLevel = (2 to steps.size).foldLeft(
      when(steps.head, 1L).otherwise(0L)) { (tail, k) =>
      when(steps(k - 1) && col(s"_m$k") >= col(tsu) - wUs, k.toLong)
        .otherwise(tail)
    }
    df.groupBy(col(user)).agg(max(rowLevel).as("level"))
  }

  /** Greedy non-overlapping match COUNT of the 2-step any-gap pattern
    * `(?first).*(?second)` — ClickHouse `sequenceCount` — per user, for
    * DISJOINT conditions (no row matches both). The run-boundary
    * reduction (argued in r30's and StreamingSeqCount's scaladoc):
    * scanning the filtered subsequence greedily, every first-run →
    * second-run boundary completes exactly one match and resets the
    * scan, so the count is the number of `second` rows whose immediate
    * subsequence predecessor matches `first` — ONE lag() pass, no state.
    * Returns (user, matches) with every filtered user censused
    * (matches = 0 when no journey completed).
    */
  def countGreedy2(events: DataFrame, user: String, tsu: String,
                   tie: String, first: Column, second: Column): DataFrame = {
    val w = Window.partitionBy(col(user)).orderBy(col(tsu), col(tie))
    val hit = when(second && lag(when(first, lit(1)), 1).over(w) === 1, 1L)
      .otherwise(0L)
    events.filter(first || second)
      .withColumn("_hit", hit)
      .groupBy(col(user))
      .agg(sum(col("_hit")).as("matches"))
  }
}
