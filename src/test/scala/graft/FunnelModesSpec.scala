package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** The windowFunnel mode family on discriminating corpora: r27 (default
  * EXISTS), r31 (strict_dedup — a repeated HELD condition interrupts),
  * r29 (strict_order — ANY intervening event interrupts) form a strict
  * hierarchy, and each mode's documented discriminator behaves exactly
  * as claimed.
  */
class FunnelModesSpec extends SparkSpecBase {

  private val H = 3600L
  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)

  /** Write a tiny events corpus and return its dir. Rows: (user, type,
    * second-offset); event_id is the row index (the family tie-breaker).
    */
  private def corpus(rows: Seq[(Long, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmodes").toString
    rows.zipWithIndex
      .map { case ((u, et, sec), i) => (i.toLong, u, et, t(sec), 1L) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def census(name: String, dir: String): Map[Long, Long] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("the three modes rank V,C,C,P / V,signup,C,P / V,P,C exactly as documented") {
    val dir = corpus(Seq(
      // u1: V C C P — the second click re-matches held condition 2:
      // default 3, strict_dedup 2, strict_order 2
      (1L, "view", 0L), (1L, "click", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: V signup C P — a NON-condition event intervenes: default 3,
      // strict_dedup 3 (unrelated types pass freely), strict_order 1
      (2L, "view", 0L), (2L, "signup", 10L), (2L, "click", 20L), (2L, "purchase", 30L),
      // u3: the clean chain — 3 in every mode
      (3L, "view", 0L), (3L, "click", 10L), (3L, "purchase", 20L),
      // u4: V V C P — the second view is a fresh anchor in all modes: 3/3/3
      (4L, "view", 0L), (4L, "view", 10L), (4L, "click", 20L), (4L, "purchase", 30L),
      // u5: V P C — purchase precedes the click: 2 / 2 / 1
      (5L, "view", 0L), (5L, "purchase", 10L), (5L, "click", 20L),
      // u6: no funnel events at all — level 0 everywhere
      (6L, "signup", 0L), (6L, "other", 10L),
      // u7: the click lands outside the 24 h anchor window — level 1
      (7L, "view", 0L), (7L, "click", 25L * H)))
    val expected = Map(
      "r27_window_funnel" -> Map(1L -> Seq(3L), 2L -> Seq(3L), 3L -> Seq(3L),
        4L -> Seq(3L), 5L -> Seq(2L), 6L -> Seq(0L), 7L -> Seq(1L)),
      "r33_strict_increase_funnel" -> Map(1L -> Seq(3L), 2L -> Seq(3L),
        3L -> Seq(3L), 4L -> Seq(3L), 5L -> Seq(2L), 6L -> Seq(0L),
        7L -> Seq(1L)),
      "r31_dedup_funnel" -> Map(1L -> Seq(2L), 2L -> Seq(3L), 3L -> Seq(3L),
        4L -> Seq(3L), 5L -> Seq(2L), 6L -> Seq(0L), 7L -> Seq(1L)),
      "r29_strict_funnel" -> Map(1L -> Seq(2L), 2L -> Seq(1L), 3L -> Seq(3L),
        4L -> Seq(3L), 5L -> Seq(1L), 6L -> Seq(0L), 7L -> Seq(1L)),
      // ClickHouse-TRUE strict_order: u2's signup breaks (stopping the
      // whole scan at level 1), and u5's out-of-order purchase triggers
      // the SKIP-LEVEL termination (no click slot written yet → return
      // the first unfilled slot = 1; round-18 ADVICE re-pin — the
      // shipped scan reads V,P,C as 1, not 2); the in-family repeats of
      // u1/u4 pass freely
      "r37_strict_order_ch" -> Map(1L -> Seq(3L), 2L -> Seq(1L), 3L -> Seq(3L),
        4L -> Seq(3L), 5L -> Seq(1L), 6L -> Seq(0L), 7L -> Seq(1L)),
      // ClickHouse-TRUE strict_dedup: u1's second click repeats reached
      // condition 2 and the scan returns the LITERAL 2−1 = 1 (r31 reads
      // 2); u2's signup is never inserted (3); u4's second view
      // re-anchors, never terminates (3)
      "r38_strict_dedup_ch" -> Map(1L -> Seq(1L), 2L -> Seq(3L), 3L -> Seq(3L),
        4L -> Seq(3L), 5L -> Seq(2L), 6L -> Seq(0L), 7L -> Seq(1L)))
    expected.foreach { case (q, perUser) =>
      val want = perUser.values.flatten.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      assert(census(q, dir) == want, s"$q census mismatch (want $want)")
    }
  }

  test("same-microsecond ties: r27/r29/r31 chain in (ts, event_id) order; r33 refuses") {
    val dir = corpus(Seq(
      // u1: view then click AT THE SAME MICROSECOND, event_id orders them
      // view-first — the family's total order chains them (level 2 in
      // default, strict_dedup AND strict_order: the pair is adjacent),
      // but strict_increase requires t2 > t1 and stops at level 1
      (1L, "view", 0L), (1L, "click", 0L),
      // u2: the same tie with event_id ordering the CLICK first — no
      // mode may chain (the view is not before the click in the family
      // order; strict_increase has no increasing pair either)
      (2L, "click", 0L), (2L, "view", 0L)))
    val expected = Map(
      "r27_window_funnel" -> Map(1L -> 2L, 2L -> 1L),
      "r31_dedup_funnel" -> Map(1L -> 2L, 2L -> 1L),
      "r29_strict_funnel" -> Map(1L -> 2L, 2L -> 1L),
      "r33_strict_increase_funnel" -> Map(1L -> 1L, 2L -> 1L),
      // the CH-true pair follows the family's (ts, event_id) tie order
      // (the engine's stand-in for ClickHouse's (ts, condition-number)
      // entry sort — see StrictOrderCH's scaladoc)
      "r37_strict_order_ch" -> Map(1L -> 2L, 2L -> 1L),
      "r38_strict_dedup_ch" -> Map(1L -> 2L, 2L -> 1L))
    expected.foreach { case (q, perUser) =>
      val want = perUser.values.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      assert(census(q, dir) == want,
        s"$q tie-corpus census mismatch (want $want)")
    }
  }

  test("r35 next-node: first greedy journey, full-sequence successor, none at end") {
    val dir = corpus(Seq(
      // u1: clean journey, the next event is the purchase
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      // u2: the converting click is the user's last event -> 'none'
      (2L, "view", 0L), (2L, "click", 10L),
      // u3: FIRST journey's click at 10 s, its successor is the second
      // click — later journeys must not contribute
      (3L, "view", 0L), (3L, "click", 10L), (3L, "click", 20L),
      (3L, "view", 30L), (3L, "click", 40L),
      // u4: click precedes the view — no journey, excluded entirely
      (4L, "click", 0L), (4L, "view", 10L),
      // u5: a signup between view and click is skipped by the
      // subsequence (journey completes), but the NEXT NODE reads the
      // FULL sequence — the error event right after the click
      (5L, "view", 0L), (5L, "signup", 5L), (5L, "click", 10L),
      (5L, "error", 15L)))
    val got = SparkEntry.queries("r35_sequence_next_node")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("purchase" -> 1L, "none" -> 1L, "click" -> 1L,
      "error" -> 1L))
  }

  test("r36 prev-node: LAST journey (base), view's full-sequence PREDECESSOR (direction)") {
    val dir = corpus(Seq(
      // u1: the journey's view is the user's first event -> 'none'
      (1L, "view", 0L), (1L, "click", 10L),
      // u2: a signup precedes the view -> 'signup'
      (2L, "signup", 0L), (2L, "view", 10L), (2L, "click", 20L),
      // u3: TWO journeys — last_match anchors the second (view at 30 s,
      // preceded by the error); first_match would have read 'none'
      (3L, "view", 0L), (3L, "click", 10L), (3L, "error", 20L),
      (3L, "view", 30L), (3L, "click", 40L),
      // u4: click precedes the view — no journey, excluded entirely
      (4L, "click", 0L), (4L, "view", 10L),
      // u5: a signup between view and click is skipped by the
      // subsequence (journey completes); backward reads the FULL
      // sequence before the view — the purchase
      (5L, "purchase", 0L), (5L, "view", 5L), (5L, "signup", 8L),
      (5L, "click", 10L)))
    val got = SparkEntry.queries("r36_sequence_prev_node")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("none" -> 1L, "signup" -> 1L, "error" -> 1L,
      "purchase" -> 1L))
  }

  test("null step conditions are false in EVERY mode (r15 ADVICE: dedup anchored on null _s1)") {
    import graft.operators.SequenceMatch
    import graft.operators.SequenceMatch._
    import spark.implicits._
    // u1's rows all carry a NULL event_type, so every step condition
    // (`col === "view"` etc.) evaluates to null — no mode may anchor or
    // chain on them (level 0). u2 is a clean 2-chain control (level 2),
    // and u3 interleaves a null row inside a valid chain (must not break
    // Default/StrictDedup, must not raise any level).
    val events = Seq[(Long, Long, Option[String], Long)](
      (1L, 1L, None, 0L), (2L, 1L, None, 10L),
      (3L, 2L, Some("view"), 0L), (4L, 2L, Some("click"), 10L),
      (5L, 3L, Some("view"), 0L), (6L, 3L, None, 10L),
      (7L, 3L, Some("click"), 20L))
      .map { case (id, u, et, s) => (id, u, et.orNull, s * 1000000L) }
      .toDF("event_id", "user_id", "event_type", "tsu")
    val steps = Seq(col("event_type") === "view", col("event_type") === "click")
    for (mode <- Seq(Default, StrictIncrease, StrictOrder, StrictDedup,
      StrictOrderCH, StrictDedupCH)) {
      val got = SequenceMatch.funnelLevels(events, "user_id", "tsu",
        "event_id", steps, 3600L, mode)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(1L) == 0L, s"$mode must treat null conditions as false")
      assert(got(2L) == 2L, s"$mode control chain")
      // a null row matches NO condition: it breaks both strict_order
      // readings (and in the CH one, stops u3's whole scan)
      val want3 =
        if (mode == StrictOrder || mode == StrictOrderCH) 1L else 2L
      assert(got(3L) == want3, s"$mode null-intervener user")
    }
  }

  test("pinned ClickHouse divergence: strict_order on a step-matching intervener") {
    // ClickHouse's strict_order breaks only on events matching NO
    // condition: view,click,view,purchase reaches level 3 there. This
    // engine's StrictOrder requires full-sequence consecutiveness, so
    // the second view interrupts at level 2 — the divergence the object
    // scaladoc documents, pinned here so it can't drift silently.
    val dir = corpus(Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "view", 20L),
      (1L, "purchase", 30L)))
    assert(census("r29_strict_funnel", dir) == Map(2L -> 1L),
      "this repo's strict_order: the step-matching intervener breaks the chain")
    // and StrictDedup is EXISTS-over-anchors: the second view re-anchors,
    // so the user still reaches... actually view@20,purchase@30 is only
    // level 1 from that anchor (no click after), but the FIRST anchor's
    // greedy chain view@0->click@10->purchase@30 holds condition 1 when
    // the view@20 intervenes — interrupted at level 2. ClickHouse's
    // whole-scan termination would also stop by then; same answer here.
    assert(census("r31_dedup_funnel", dir) == Map(2L -> 1L))
    // since round 17 the divergence corpus is ALSO an agreement pin: the
    // CH-true modes read it the way ClickHouse does. strict_order: the
    // second view matches condition 1, nothing breaks, level 3.
    assert(census("r37_strict_order_ch", dir) == Map(3L -> 1L),
      "CH-true strict_order: in-family interveners pass freely")
    // strict_dedup (CH scan): the second view RE-ANCHORS (condition-1
    // events never terminate), the purchase completes the full chain
    // from the first anchor — level 3, where r31's greedy-chain
    // interruption reads 2.
    assert(census("r38_strict_dedup_ch", dir) == Map(3L -> 1L),
      "CH-true strict_dedup: condition-1 repeats re-anchor, never terminate")
  }

  test("r37's skip-level termination: an out-of-order in-family event stops the scan") {
    // V,P,C: the purchase arrives with no click slot written — the
    // shipped `strict_order && first_event && !slot[j−1]` branch
    // returns the first unfilled slot (1) and stops the scan; the later
    // click must not raise it (round-18 ADVICE discriminator)
    val d1 = corpus(Seq(
      (1L, "view", 0L), (1L, "purchase", 10L), (1L, "click", 20L)))
    assert(census("r37_strict_order_ch", d1) == Map(1L -> 1L))
    // V,P,C,P plus a later CLEAN chain: the first purchase already
    // terminated, nothing revives — 1, where the pre-fix mask read 3
    val d2 = corpus(Seq(
      (1L, "view", 0L), (1L, "purchase", 10L), (1L, "click", 20L),
      (1L, "purchase", 30L), (1L, "view", 40L), (1L, "click", 50L),
      (1L, "purchase", 60L)))
    assert(census("r37_strict_order_ch", d2) == Map(1L -> 1L))
    // V, out-of-window C, P: the click fails the anchor window so slot 2
    // is NEVER written — the purchase still skip-terminates at 1 (slot
    // presence means a window-VALID write, not any click)
    val d3 = corpus(Seq(
      (1L, "view", 0L), (1L, "click", 25L * H), (1L, "purchase", 26L * H)))
    assert(census("r37_strict_order_ch", d3) == Map(1L -> 1L))
    // control: V,C,P,P — slot 2 is written when the second purchase
    // scans, so the fill branch (not the termination) handles it: 3
    val d4 = corpus(Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      (1L, "purchase", 30L)))
    assert(census("r37_strict_order_ch", d4) == Map(3L -> 1L))
    // a purchase BEFORE any anchor is skipped (first_event false — no
    // branch fires), and the later clean chain completes: 3
    val d5 = corpus(Seq(
      (1L, "purchase", 0L), (1L, "view", 10L), (1L, "click", 20L),
      (1L, "purchase", 30L)))
    assert(census("r37_strict_order_ch", d5) == Map(3L -> 1L))
  }

  test("r38's literal termination: the repeat returns its condition index − 1") {
    // V,C,C: the second click repeats reached condition 2 and the scan
    // returns the LITERAL `event_index − 1` = 1 — BELOW the level-2
    // chain already achieved (the published code's quirk, deliberately
    // encoded; the docs' English would suggest 2, which is what r31's
    // EXISTS-over-anchors variant reads).
    val d1 = corpus(Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "click", 20L)))
    assert(census("r38_strict_dedup_ch", d1) == Map(1L -> 1L))
    assert(census("r27_window_funnel", d1) == Map(2L -> 1L))
    assert(census("r31_dedup_funnel", d1) == Map(2L -> 1L))
    // V,C,P,C: the FULL completion at the purchase returns 3 before the
    // later repeat is ever scanned — completion-first wins.
    val d2 = corpus(Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      (1L, "click", 30L)))
    assert(census("r38_strict_dedup_ch", d2) == Map(3L -> 1L),
      "a repeat after full completion must not demote the level")
    // V,C,V,C: the second click repeats condition 2 (reached by the
    // first click) BEFORE any completion — terminate at 1, even though
    // the second view had re-anchored.
    val d3 = corpus(Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "view", 20L),
      (1L, "click", 30L)))
    assert(census("r38_strict_dedup_ch", d3) == Map(1L -> 1L))
    // the window gates slot writes: a click OUTSIDE the anchor window
    // never writes slot 2, so a second click is NOT a repeat — it chains
    // from the re-anchoring second view instead.
    val d4 = corpus(Seq(
      (1L, "view", 0L), (1L, "click", 25L * H), (1L, "view", 26L * H),
      (1L, "click", 27L * H)))
    assert(census("r38_strict_dedup_ch", d4) == Map(2L -> 1L),
      "an out-of-window click writes no slot and cannot trigger the repeat rule")
  }

  test("mode hierarchy: per-user level is monotone default >= dedup >= order") {
    // on real data every user's r27 level must dominate r31's, and r31's
    // must dominate r29's — the containment that makes the three modes a
    // family rather than three unrelated scores. Compare per-level
    // cumulative counts (users at level >= L), which is the per-user
    // dominance statement expressed on the census tables.
    val dir = sf("sf0.001")
    def cum(name: String): Map[Long, Long] = {
      val c = census(name, dir)
      (0L to 3L).map(l => l -> c.filter(_._1 >= l).values.sum).toMap
    }
    val (c27, c31, c29) = (cum("r27_window_funnel"), cum("r31_dedup_funnel"),
      cum("r29_strict_funnel"))
    val c33 = cum("r33_strict_increase_funnel")
    val c37 = cum("r37_strict_order_ch")
    val c38 = cum("r38_strict_dedup_ch")
    (1L to 3L).foreach { l =>
      assert(c27(l) >= c31(l), s"default must dominate strict_dedup at level $l")
      assert(c31(l) >= c29(l), s"strict_dedup must dominate strict_order at level $l")
      // strict_increase only removes chains (same-microsecond ties) from
      // the default mode; it is incomparable with dedup/order, which
      // remove a DIFFERENT chain class
      assert(c27(l) >= c33(l), s"default must dominate strict_increase at level $l")
      // the CH-true modes only ever chain a SUBSET of the default scan
      // (a masked prefix; claims cut short by termination), so default
      // dominates both. Neither is comparable with its repo variant:
      // r37 can stop a scan r29's consecutive chain survives (a breaker
      // between an early anchor and the chain), and r38's literal j−1
      // can undercut r31 while its free re-anchoring can exceed it.
      assert(c27(l) >= c37(l), s"default must dominate CH strict_order at level $l")
      assert(c27(l) >= c38(l), s"default must dominate CH strict_dedup at level $l")
    }
    assert(Seq(c31, c29, c33, c37, c38).forall(_(0L) == c27(0L)),
      "all six modes census the same user universe")
  }
}
