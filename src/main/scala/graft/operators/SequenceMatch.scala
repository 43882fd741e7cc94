package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The sequence-pattern engine behind the funnel/sequence query family —
  * a typed, compiled form of ClickHouse's `sequenceMatch('(?1).*(?2)…')`
  * condition-chain patterns and of the four `windowFunnel` mode FAMILY
  * (the sink engine's sequence-analytics primitives; reference
  * provenance: the ClickHouse sink the load-test pipeline writes into,
  * `docker-compose.yaml` services in the reference repo).
  *
  * Mode-parity caveat (deliberate, pinned by this repo's r29/r31
  * oracles since their first round — see [[FunnelMode]]): Default and
  * StrictIncrease are ClickHouse-exact; [[StrictOrder]] here requires
  * FULL-SEQUENCE consecutiveness (any intervening event breaks the
  * chain, even one matching a later step condition — ClickHouse's
  * `strict_order` only breaks on events matching NO condition, so
  * view,click,view,purchase reaches level 3 there and level 2 here);
  * [[StrictDedup]] here is EXISTS-over-anchors (max over all anchor
  * rows of the greedy chain from that anchor), whereas ClickHouse's
  * `strict_deduplication` terminates the whole per-user scan at the
  * first repeated condition. Both divergences are self-consistent with
  * the repo's oracles and pinned in FunnelModesSpec.
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
  * == Name hygiene ==
  *
  * Every public method starts by PROJECTING the input down to exactly
  * the columns it needs — the grouping key, the event time, the
  * tie-breaker, and the step conditions evaluated to boolean flags —
  * under engine-owned names. The projection drops every caller column,
  * so the internal working names (`_u`/`_t`/`_k`/`_s*`/`_rt*`/`_m*`/…)
  * can never collide with (and silently corrupt) a caller frame that
  * happens to carry one of them; the grouping column is renamed back on
  * output. (Round-14 ADVICE: the former withColumn chain replaced a
  * caller's same-named column without error.)
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

  /** The four `windowFunnel` modes, as typed funnel semantics for
    * [[funnelLevels]] (StrictOrder/StrictDedup follow this repo's
    * pinned variants, not ClickHouse bit-for-bit — see the object
    * scaladoc's mode-parity caveat). All four share the anchor-window
    * constraint (every chained step within `windowSeconds` of the
    * chain's step-1 anchor) and the EXISTS-over-anchors reading (a
    * user's level is the max over all candidate chains); they differ in
    * WHICH chains count:
    *
    *   - [[Default]]        — any events may separate the steps; ties
    *     chain in the family's (ts, event_id) sequence order.
    *   - [[StrictIncrease]] — like Default, but chained steps need
    *     STRICTLY increasing event time (a same-microsecond pair
    *     refuses to chain). Diverges from Default only on ties.
    *   - [[StrictOrder]]    — the chain's steps must be CONSECUTIVE in
    *     the user's full event sequence: ANY intervening event of any
    *     type breaks the chain ("A→B→D→C stops finding A→B→C at D").
    *   - [[StrictDedup]]    — the chain advances greedily (each step is
    *     the FIRST event matching the next condition) and a repeated
    *     event of a condition the chain ALREADY HOLDS interrupts it
    *     (view, click, click, purchase stops at level 2 — the second
    *     click re-matches held condition 2), while unrelated event
    *     types pass freely.
    */
  sealed trait FunnelMode
  case object Default extends FunnelMode
  case object StrictIncrease extends FunnelMode
  case object StrictOrder extends FunnelMode
  case object StrictDedup extends FunnelMode

  /** The engine-owned canonical projection: exactly (grouping key,
    * event-time µs, tie-break, step flags) under internal names — drops
    * every caller column, so no internal working name can collide with
    * the caller's frame. Step conditions are evaluated HERE, against
    * the caller's columns, before they disappear.
    */
  private def canon(events: DataFrame, user: String, tsu: String,
                    tie: String, steps: Seq[Column]): DataFrame =
    events.select(
      col(user).as("_u") +: col(tsu).as("_t") +: col(tie).as("_k") +:
        steps.zipWithIndex.map { case (c, i) => c.as(s"_s${i + 1}") }: _*)

  private def seqWindow =
    Window.partitionBy(col("_u")).orderBy(col("_t"), col("_k"))

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
    val k = pattern.steps.size
    val base = canon(events, user, tsu, tie, pattern.steps)
      .filter((1 to k).map(i => col(s"_s$i")).reduce(_ || _))
    val w = seqWindow
    val prevAll = w.rowsBetween(Window.unboundedPreceding, -1L)
    // _rt<k> carries the reach statistic: this row's event time when a
    // chain of steps 1..k ends here, else null
    var df = base.withColumn("_rt1", when(col("_s1"), col("_t")))
    for (i <- 2 to k) {
      val prevReach = col(s"_rt${i - 1}")
      val ok: Column = pattern.gaps(i - 2) match {
        case AnyGap =>
          max(prevReach).over(prevAll).isNotNull
        case Within(s) =>
          max(prevReach).over(prevAll) >= col("_t") - s * 1000000L
        case AtLeast(s) =>
          min(prevReach).over(prevAll) <= col("_t") - s * 1000000L
        case Adjacent =>
          lag(prevReach, 1).over(w).isNotNull
      }
      df = df.withColumn(s"_rt$i",
        when(col(s"_s$i") && coalesce(ok, lit(false)), col("_t")))
    }
    df.groupBy(col("_u"))
      .agg(max(col(s"_rt$k").isNotNull).as("matched"))
      .select(col("_u").as(user), col("matched"))
  }

  /** windowFunnel levels in all four ClickHouse modes — the K-step
    * engine form of r27 (Default) / r33 (StrictIncrease) / r29
    * (StrictOrder) / r31 (StrictDedup): per user, the furthest step k
    * such that a chain step₁ < … < stepₖ admissible under `mode`
    * completes within `windowSeconds` of its ANCHORING step-1 event (an
    * anchor-window constraint, which [[matchesPerUser]]'s per-gap
    * bounds deliberately cannot express — the windowFunnel window binds
    * every step to the FIRST, not to its predecessor).
    *
    * == Default / StrictIncrease: running anchor maxima ==
    *
    * Carry Aₖ(row) = the anchor time of the best (latest-anchored)
    * step-prefix chain ending at row; A₁ = own ts on a step-1 row,
    * Aₖ = running max of A₍ₖ₋₁₎ over strictly-preceding rows on a
    * step-k row, carried UNCONDITIONALLY — a chain whose anchor misses
    * THIS row's window can never revive later (any later row has a
    * larger ts), so validity is checked only where a level is claimed:
    * level(row) ≥ k iff condₖ(row) ∧ Mₖ ≥ ts(row) − w. Maximizing the
    * anchor is lossless for EXISTS (r27's scaladoc argument), and the
    * intermediate steps of a level-k claim are inside the window for
    * free (tsᵢ < tsₖ ≤ anchor + w). Levels nest by construction, so the
    * per-user level is the max of per-row levels. Default uses ROWS
    * frames over the (ts, event_id) sequence order (same-microsecond
    * ties chain; ClickHouse default); StrictIncrease uses RANGE frames
    * ending −1 µs over event time (ClickHouse `strict_increase`) — the
    * two differ ONLY on ties, FunnelModesSpec pins the divergence
    * corpus.
    *
    * == StrictOrder: the chain is the lag chain ==
    *
    * Consecutiveness makes the chain ending at a row UNIQUE: its step
    * k−1 event is exactly the sequence predecessor. So the running max
    * degenerates to lag(1): Aₖ(row) = lag(A₍ₖ₋₁₎, 1) on a step-k row —
    * the anchor arrives through the one admissible path, no extremum
    * needed, and the window check at the claim is against that carried
    * anchor. (Exactly r29's former bespoke lag-pair construction,
    * generalized to K steps.)
    *
    * == StrictDedup: greedy chains fetched by nested struct minima ==
    *
    * The chain from an anchor is deterministic (greedy: each step is
    * the FIRST event matching the next condition after the previous
    * step) and valid while no event matching an already-held condition
    * intervenes. Per row, carry npⱼ = position of the first step-j
    * event strictly after it (one windowed min per step, +∞ when none),
    * and fetch the greedy next-step row by a windowed STRUCT MIN
    * (position is the unique leading field, so the min IS the first
    * matching row, carrying its own np's and its own next-step fetch as
    * nested fields — built bottom-up, level K first). On an anchor row
    * the whole chain is then field lookups: c₂ = own fetch, cₖ₊₁ =
    * cₖ.next; level ≥ k iff cₖ exists, cₖ.ts ≤ anchor + w, and cₖ.pos <
    * min over held conditions j < k of npⱼ(cₖ₋₁). (r31's former bespoke
    * 3-step struct-min construction, generalized to K.)
    *
    * Returns (user, level) with EVERY user censused (level 0 = no
    * step-1 event). Scale shape, all modes: K−1 (StrictDedup: 2K−2)
    * stacked window passes over ONE user-keyed sort, no joins, O(1)
    * per-row state; a bot user is one sorted run.
    */
  def funnelLevels(events: DataFrame, user: String, tsu: String,
                   tie: String, steps: Seq[Column], windowSeconds: Long,
                   mode: FunnelMode): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val k = steps.size
    val wUs = windowSeconds * 1000000L
    val base = canon(events, user, tsu, tie, steps)
    val perRowLevel: (DataFrame, Column) = mode match {
      case Default | StrictIncrease =>
        val strictPast =
          if (mode == StrictIncrease)
            Window.partitionBy(col("_u")).orderBy(col("_t"))
              .rangeBetween(Window.unboundedPreceding, -1L)
          else seqWindow.rowsBetween(Window.unboundedPreceding, -1L)
        var df = base.withColumn("_a1", when(col("_s1"), col("_t")))
        for (i <- 2 to k) {
          df = df.withColumn(s"_m$i",
              max(col(s"_a${i - 1}")).over(strictPast))
            .withColumn(s"_a$i", when(col(s"_s$i"), col(s"_m$i")))
        }
        // fold low→high so the HIGHEST satisfied level wraps outermost
        // and wins when step conditions overlap
        val lvl = (2 to k).foldLeft(
          when(col("_s1"), 1L).otherwise(0L)) { (tail, i) =>
          when(col(s"_s$i") && col(s"_m$i") >= col("_t") - wUs, i.toLong)
            .otherwise(tail)
        }
        (df, lvl)

      case StrictOrder =>
        var df = base.withColumn("_a1", when(col("_s1"), col("_t")))
        for (i <- 2 to k) {
          df = df.withColumn(s"_m$i", lag(col(s"_a${i - 1}"), 1).over(seqWindow))
            .withColumn(s"_a$i", when(col(s"_s$i"), col(s"_m$i")))
        }
        val lvl = (2 to k).foldLeft(
          when(col("_s1"), 1L).otherwise(0L)) { (tail, i) =>
          when(col(s"_s$i") && col(s"_m$i") >= col("_t") - wUs, i.toLong)
            .otherwise(tail)
        }
        (df, lvl)

      case StrictDedup =>
        val inf = Long.MaxValue
        var df = base.withColumn("_pos", row_number().over(seqWindow))
        // "min over rows STRICTLY AFTER this one" as a RUNNING min over
        // the DESCENDING position order — never an UNBOUNDED FOLLOWING
        // frame: Spark's UnboundedFollowingWindowFunctionFrame recomputes
        // the aggregate from scratch per output row (O(n²) per
        // partition), which the round-15 funnel-skew arm caught wedging
        // a 400k-event bot user; the descending running frame is the
        // same row set with the accumulating O(n) frame implementation.
        val fr = Window.partitionBy(col("_u")).orderBy(col("_pos").desc)
          .rowsBetween(Window.unboundedPreceding, -1L)
        for (j <- 1 to k)
          df = df.withColumn(s"_np$j",
            coalesce(min(when(col(s"_s$j"), col("_pos"))).over(fr), lit(inf)))
        // nested greedy fetches, bottom-up: _g<i> = the first step-i row
        // strictly after this one, carrying (pos, ts, np₁..npᵢ, next
        // fetch). Level K's fetch needs only (pos, ts) — nothing chains
        // after it.
        df = df.withColumn(s"_g$k", min(when(col(s"_s$k"),
          struct(col("_pos").as("p"), col("_t").as("t")))).over(fr))
        for (i <- (k - 1) to 2 by -1) {
          val fields = col("_pos").as("p") +: col("_t").as("t") +:
            (1 to i).map(j => col(s"_np$j").as(s"n$j")) :+
            col(s"_g${i + 1}").as("nx")
          df = df.withColumn(s"_g$i",
            min(when(col(s"_s$i"), struct(fields: _*))).over(fr))
        }
        // walk the chain on anchor rows: cumulative validity per level
        def heldMin(npCols: Seq[Column]): Column =
          npCols.reduce((a, b) => least(a, b))
        var chain: Column = col("_g2")
        var prevNp: Seq[Column] = Seq(col("_np1"))
        var valid: Column = lit(true)
        val conds = (2 to k).map { i =>
          valid = valid && chain.isNotNull &&
            chain.getField("t") <= col("_t") + wUs &&
            chain.getField("p") < heldMin(prevNp)
          val c = valid
          if (i < k) {
            prevNp = (1 to i).map(j => chain.getField(s"n$j"))
            chain = chain.getField("nx")
          }
          c
        }
        // null-as-false on the anchor condition, matching the other
        // modes' `when(col("_s1"), …)` convention: a null step-1 flag
        // (nullable predicate over a null column) anchors nothing.
        val lvl = when(coalesce(col("_s1"), lit(false)),
          conds.zipWithIndex.foldLeft(lit(1L)) { case (tail, (c, idx)) =>
            when(c, (idx + 2).toLong).otherwise(tail)
          }).otherwise(0L)
        (df, lvl)
    }
    perRowLevel._1.groupBy(col("_u"))
      .agg(max(perRowLevel._2).as("level"))
      .select(col("_u").as(user), col("level"))
  }

  /** Two-mode compatibility form (pre-round-15 signature): the
    * `strictIncrease` knob IS the Default/StrictIncrease mode split.
    */
  def funnelLevels(events: DataFrame, user: String, tsu: String,
                   tie: String, steps: Seq[Column], windowSeconds: Long,
                   strictIncrease: Boolean): DataFrame =
    funnelLevels(events, user, tsu, tie, steps, windowSeconds,
      if (strictIncrease) StrictIncrease else Default)

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
    val base = canon(events, user, tsu, tie, Seq(first, second))
      .filter(col("_s1") || col("_s2"))
    val hit = when(col("_s2") &&
      lag(when(col("_s1"), lit(1)), 1).over(seqWindow) === 1, 1L)
      .otherwise(0L)
    base.withColumn("_hit", hit)
      .groupBy(col("_u"))
      .agg(sum(col("_hit")).as("matches"))
      .select(col("_u").as(user), col("matches"))
  }
}
