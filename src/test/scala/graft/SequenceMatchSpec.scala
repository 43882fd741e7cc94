package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SequenceMatch
import graft.operators.SequenceMatch._

/** The sequence-pattern engine on discriminating corpora: every gap kind
  * (AnyGap / Within / AtLeast / Adjacent), bound inclusivity, the
  * (ts, event_id) tie order, the max-anchor (resp. min-anchor) exactness
  * the one-pass compilation claims, the skip semantics of adjacency, and
  * the countGreedy2 ≡ greedy-scan equivalence r30 rides on.
  */
class SequenceMatchSpec extends SparkSpecBase {

  /** Event frame from (user, type, second-offset) rows; event_id is the
    * row index — the family tie-breaker, so listing order decides ties.
    */
  private def ev(rows: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex
      .map { case ((u, et, sec), i) =>
        (u, et, i.toLong, sec * 1000000L)
      }
      .toDF("user_id", "event_type", "event_id", "tsu")
  }

  private def et(t: String) = col("event_type") === t

  private def matched(df: DataFrame, p: Pattern): Map[Long, Boolean] =
    SequenceMatch.matchesPerUser(df, "user_id", "tsu", "event_id", p)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

  test("Within: anchor renewal makes the running-max pass exact") {
    val p = Pattern(Seq(et("view"), et("click")), Seq(Within(3600L)))
    val df = ev(
      // u1: the only view is 5000 s before the click — no match
      (1L, "view", 0L), (1L, "click", 5000L),
      // u2: a SECOND view renews the anchor; earliest-anchor matching
      // would fail, the running max matches via the 3000 s view
      (2L, "view", 0L), (2L, "view", 3000L), (2L, "click", 5000L),
      // u3: exactly at the bound — inclusive
      (3L, "view", 0L), (3L, "click", 3600L))
    assert(matched(df, p) == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("AtLeast: the running-MIN anchor is the permissive one") {
    val p = Pattern(Seq(et("view"), et("purchase")), Seq(AtLeast(3600L)))
    val df = ev(
      // u1: purchase only 1800 s after the only view — no match
      (1L, "view", 0L), (1L, "purchase", 1800L),
      // u2: the EARLIEST view satisfies the lower bound even though a
      // later view does not — max-anchor logic would wrongly reject
      (2L, "view", 0L), (2L, "view", 3000L), (2L, "purchase", 3600L),
      // u3: exactly at the bound — inclusive
      (3L, "view", 0L), (3L, "purchase", 3600L))
    assert(matched(df, p) == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("ties sequence by (ts, event_id), like the whole funnel family") {
    val p = Pattern(Seq(et("view"), et("click")), Seq(AnyGap))
    val df = ev(
      // u1: view, click at the SAME microsecond, view first by event_id
      (1L, "view", 0L), (1L, "click", 0L),
      // u2: the same tie with the click first — no chain
      (2L, "click", 0L), (2L, "view", 0L))
    assert(matched(df, p) == Map(1L -> true, 2L -> false))
  }

  test("Adjacent skips non-pattern events but breaks on pattern events") {
    val p3 = Pattern(Seq(et("view"), et("click"), et("purchase")),
      Seq(Adjacent, Adjacent))
    val df = ev(
      // u1: a signup between view and click matches NO step condition —
      // it is skipped before sequencing and adjacency holds
      (1L, "view", 0L), (1L, "signup", 10L), (1L, "click", 20L),
      (1L, "purchase", 30L),
      // u2: a VIEW between click and purchase IS a pattern event — it
      // breaks the click→purchase adjacency
      (2L, "view", 0L), (2L, "click", 10L), (2L, "view", 20L),
      (2L, "purchase", 30L),
      // u3: the clean adjacent chain
      (3L, "view", 0L), (3L, "click", 10L), (3L, "purchase", 20L))
    assert(matched(df, p3) == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("chained Within bounds constrain each gap independently") {
    val p = Pattern(Seq(et("view"), et("click"), et("purchase")),
      Seq(Within(100L), Within(100L)))
    val df = ev(
      // u1: 90 s then 90 s — both gaps inside their bounds
      (1L, "view", 0L), (1L, "click", 90L), (1L, "purchase", 180L),
      // u2: the only reachable click is at 90 s; the purchase is 160 s
      // after it — the second gap fails even though a later (unreached)
      // click would have been close enough
      (2L, "view", 0L), (2L, "click", 90L), (2L, "click", 200L),
      (2L, "purchase", 250L),
      // u3: first gap already fails
      (3L, "view", 0L), (3L, "click", 150L), (3L, "purchase", 160L))
    assert(matched(df, p) == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("users with no pattern-relevant events never enter the frame") {
    val p = Pattern(Seq(et("view"), et("click")), Seq(AnyGap))
    val df = ev(
      (1L, "view", 0L), (1L, "click", 10L),
      (2L, "signup", 0L), (2L, "error", 10L))
    assert(matched(df, p) == Map(1L -> true))
  }

  test("funnelLevels: K-step anchored window, anchor renewal, level nesting") {
    val steps = Seq(et("view"), et("click"), et("signup"), et("purchase"))
    def levels(df: org.apache.spark.sql.DataFrame,
               strict: Boolean): Map[Long, Long] =
      SequenceMatch.funnelLevels(df, "user_id", "tsu", "event_id",
          steps, windowSeconds = 100L, strictIncrease = strict)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val df = ev(
      // u1: the clean 4-step chain inside the 100 s anchor window
      (1L, "view", 0L), (1L, "click", 10L), (1L, "signup", 20L),
      (1L, "purchase", 30L),
      // u2: the purchase falls outside the ANCHOR window (not the gap
      // to its predecessor) — level 3, the windowFunnel discriminator
      (2L, "view", 0L), (2L, "click", 10L), (2L, "signup", 20L),
      (2L, "purchase", 150L),
      // u3: a renewed anchor at 60 s carries the chain to 4 where the
      // earliest anchor would have failed — the running-max exactness
      (3L, "view", 0L), (3L, "click", 10L), (3L, "view", 60L),
      (3L, "click", 70L), (3L, "signup", 80L), (3L, "purchase", 150L),
      // u4: steps out of order and no anchoring view — level 0
      (4L, "click", 0L), (4L, "signup", 10L))
    val want = Map(1L -> 4L, 2L -> 3L, 3L -> 4L, 4L -> 0L)
    assert(levels(df, strict = false) == want)
    assert(levels(df, strict = true) == want,
      "tie-free corpora: the two modes agree exactly")
  }

  test("funnelLevels strictIncrease knob: ties chain only in sequence mode") {
    val steps = Seq(et("view"), et("click"))
    val df = ev((1L, "view", 0L), (1L, "click", 0L))
    def lvl(strict: Boolean): Long =
      SequenceMatch.funnelLevels(df, "user_id", "tsu", "event_id",
          steps, windowSeconds = 100L, strictIncrease = strict)
        .collect().head.getLong(1)
    assert(lvl(strict = false) == 2L, "(ts, event_id) order chains the tie")
    assert(lvl(strict = true) == 1L, "strictly-increasing ts refuses it")
  }

  test("countGreedy2 equals the greedy non-overlapping scan") {
    // V C C V V C: greedy consumes (V@0,C@10) and (V@30,C@50) — 2; the
    // middle C@20 and V@40 are the runs the boundary count collapses
    val df = ev(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "click", 20L),
      (1L, "view", 30L), (1L, "view", 40L), (1L, "click", 50L),
      // u2: clicks only — censused with zero matches
      (2L, "click", 0L), (2L, "click", 10L))
    val got = SequenceMatch.countGreedy2(df, "user_id", "tsu", "event_id",
        et("view"), et("click"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 0L))
  }

  test("the compiled plan is one user-keyed sort: a single exchange, stacked windows") {
    val p = Pattern(Seq(et("view"), et("click"), et("purchase")),
      Seq(Within(3600L), Adjacent))
    val df = ev((1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L))
    val out = SequenceMatch.matchesPerUser(df, "user_id", "tsu",
      "event_id", p)
    out.collect() // materialize so AQE finalizes the plan
    // count node lines in the final plan string (AQE hides the Exchange
    // inside a ShuffleQueryStage leaf that TreeNode.collect won't enter)
    val s = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    def count(needle: String): Int =
      s.sliding(needle.length).count(_ == needle)
    // one hash exchange on the user key feeding every window level (the
    // group census reuses the partitioning), one shared sort — the key is
    // the engine's canonical `_u` projection of user_id
    assert(count("Exchange hashpartitioning(_u") == 1,
      s"expected one user-key exchange, plan:\n$s")
    assert(count("Sort [") == 1 && s.contains("Sort [_u"),
      s"expected the levels to share one user-keyed sort, plan:\n$s")
    assert(count("Window ") >= 2, s"expected stacked window passes, plan:\n$s")
  }

  test("strict modes generalize past K=3: a 4-step chain under all four modes") {
    val steps = Seq(et("view"), et("click"), et("signup"), et("purchase"))
    def levels(df: DataFrame, mode: FunnelMode): Map[Long, Long] =
      SequenceMatch.funnelLevels(df, "user_id", "tsu", "event_id",
          steps, windowSeconds = 1000L, mode)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val df = ev(
      // u1: the clean consecutive 4-chain — 4 in every mode
      (1L, "view", 0L), (1L, "click", 10L), (1L, "signup", 20L),
      (1L, "purchase", 30L),
      // u2: an unrelated `other` event between signup and purchase —
      // strict_order breaks at 3, default/dedup pass (4)
      (2L, "view", 0L), (2L, "click", 10L), (2L, "signup", 20L),
      (2L, "other", 25L), (2L, "purchase", 30L),
      // u3: a REPEATED signup (held condition 3) before the purchase —
      // strict_dedup stops at 3, strict_order breaks at 3 too (the
      // repeat intervenes), default still 4
      (3L, "view", 0L), (3L, "click", 10L), (3L, "signup", 20L),
      (3L, "signup", 25L), (3L, "purchase", 30L),
      // u4: a repeated CLICK between click and signup — dedup stops at
      // 2 (condition 2 held), default reaches 4 (the second click also
      // RE-ANCHORS level 2, chains to signup/purchase)
      (4L, "view", 0L), (4L, "click", 10L), (4L, "click", 15L),
      (4L, "signup", 20L), (4L, "purchase", 30L))
    assert(levels(df, Default) ==
      Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L))
    assert(levels(df, StrictIncrease) ==
      Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L),
      "tie-free corpus: strict_increase == default")
    assert(levels(df, StrictOrder) ==
      Map(1L -> 4L, 2L -> 3L, 3L -> 3L, 4L -> 2L))
    assert(levels(df, StrictDedup) ==
      Map(1L -> 4L, 2L -> 4L, 3L -> 3L, 4L -> 2L))
  }

  test("strict_dedup: greedy advance takes the FIRST matching event, window binds to the anchor") {
    val steps = Seq(et("view"), et("click"), et("purchase"))
    def lvl(df: DataFrame): Map[Long, Long] =
      SequenceMatch.funnelLevels(df, "user_id", "tsu", "event_id",
          steps, windowSeconds = 100L, StrictDedup)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val df = ev(
      // u1: greedy binds the chain to the FIRST click; the purchase
      // follows a second click (held condition 2 repeats) — level 2,
      // even though skipping to the second click would have reached 3
      (1L, "view", 0L), (1L, "click", 10L), (1L, "click", 20L),
      (1L, "purchase", 30L),
      // u2: a second VIEW re-anchors — the chain from the later anchor
      // reaches 3 where the first anchor's chain is interrupted
      (2L, "view", 0L), (2L, "view", 10L), (2L, "click", 20L),
      (2L, "purchase", 30L),
      // u3: the purchase lands outside the ANCHOR window though within
      // 100 s of the click — level 2, the windowFunnel discriminator
      (3L, "view", 0L), (3L, "click", 60L), (3L, "purchase", 120L))
    assert(lvl(df) == Map(1L -> 2L, 2L -> 3L, 3L -> 2L))
  }
}
