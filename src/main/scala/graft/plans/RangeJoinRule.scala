package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, Generate, HintInfo, Join, JoinHint, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, TimestampType}

/** Optimizer rule: re-plan an interval-overlap join with NO equi key as a
  * bin-exploded equi-join.
  *
  * A join whose condition is only opposing range predicates —
  * `a.lo <= b.hi AND b.lo <= a.hi` (interval overlap) or
  * `b.lo <= a.t AND a.t <= b.hi` (point-in-interval) — gives Spark's join
  * planner no equi key, so it falls back to BroadcastNestedLoopJoin or
  * CartesianProduct: O(|L|·|R|) comparisons and a broadcast of a whole
  * side. This rule rewrites the LOGICAL plan instead: each side explodes
  * to the fixed-width bins its interval spans, the join becomes an
  * equi-join on bin (hash-partitionable, AQE-eligible, no broadcast of the
  * big side), the ORIGINAL predicate is re-checked exactly inside the bin
  * match, and multiplicity is preserved without a distinct by the
  * reference-point condition: a matching pair is emitted only in the FIRST
  * bin the two intervals share, `bin == max(binOf(minL), binOf(minR))`
  * (the grid-join dedup used by spatial engines).
  *
  * Correctness notes (RangeJoinRuleSpec pins each):
  *  - matching rows always share a bin: for any pair satisfying the two
  *    opposing predicates, max(minL,minR) <= min(maxL,maxR), so the value
  *    range [min,max] of each side — which the explode covers completely,
  *    via least/greatest it also covers malformed lo>hi intervals — always
  *    intersects;
  *  - the bin transform (floor(seconds / width)) is monotone, so each
  *    side's bin set is the full integer range between its endpoints and
  *    the shared bins are contiguous — exactly one satisfies the
  *    reference-point equality;
  *  - NULL bounds: sequence(null,·) is NULL, explode emits nothing — the
  *    same rows the naive join drops (NULL comparison is never TRUE);
  *  - the rewritten join HAS an equality conjunct, so the rule can never
  *    match its own output (no fixed-point loop).
  *
  * Scope guards: inner joins only, no equi conjunct already present (then
  * the hash planner is already right), no user join hint (an explicit
  * broadcast wins), deterministic condition, bounds typed timestamp/int/
  * long, and all four bound expressions sharing ONE data type — a condition
  * mixing a timestamp pair with a long pair (`a.ts <= b.ts2 AND
  * b.seq <= a.max_seq`) is a band predicate on two different axes, not an
  * interval overlap, and binning it would build Least/Greatest over mixed
  * operands; it stays on the nested-loop path. A stats gate skips the
  * rewrite when either side's estimated size is within
  * `spark.sql.autoBroadcastJoinThreshold`: BroadcastNestedLoopJoin with a
  * tiny broadcast side beats two explodes plus a shuffle, so the rewrite
  * only fires big×big (where the nested loop is the catastrophe).
  *
  * Pathological spans (an SCD2 sentinel like valid_to = 9999-12-31 would
  * explode one row into millions of bins): rows whose interval covers more
  * than `spark.graft.rangeJoin.maxBinsPerRow` (default 1024) bins take a
  * per-row nested-loop fallback instead — the plan becomes a three-branch
  * union (small×small bin join, large×all and small×large nested loops,
  * each re-checking the exact original predicate) whose branches partition
  * the pair space, so results stay identical while no row ever explodes
  * past the cap. The fallback joins carry a marker hint so the fixed-point
  * optimizer batch can never re-match them.
  *
  * `spark.graft.rangeJoin.enabled` (default true) switches the rule;
  * `spark.graft.rangeJoin.binSize` (default 3600 — seconds for timestamps,
  * plain units for numerics) tunes bin width, which only moves the
  * near-miss constant, never results.
  */
case class RangeJoinRule(session: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean

  private def binSize: Long =
    conf.getConfString("spark.graft.rangeJoin.binSize", "3600").toLong

  private def maxBinsPerRow: Long =
    conf.getConfString("spark.graft.rangeJoin.maxBinsPerRow", "1024").toLong

  /** Stats gate: with a truly tiny side, BroadcastNestedLoopJoin beats two
    * explodes plus a shuffle. "Tiny" must be measured against the nested
    * loop's |L|·|R| comparison cost, NOT against broadcastability: a side
    * at the 10 MB autoBroadcastJoinThreshold is ~10⁵ rows, and 10⁵ × 10⁵
    * comparisons is exactly the quadratic blowup the rewrite exists to
    * prevent (measured: j10 at sf0.1 ran 25 s as BNLJ vs ~1 s rewritten).
    * The bound is therefore min(autoBroadcastJoinThreshold,
    * spark.graft.rangeJoin.smallSideBytes [256 KiB ≈ a few thousand rows —
    * where |small|·|big| comparisons still undercut per-row shuffle cost]);
    * threshold < 0 (broadcast disabled) means nothing qualifies.
    */
  private def broadcastSmall(p: LogicalPlan): Boolean =
    RangeJoinRule.smallSide(p, conf)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val w = binSize
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if hint == JoinHint.NONE && cond.deterministic &&
            !broadcastSmall(left) && !broadcastSmall(right) =>
        extractOverlap(j, cond) match {
          case Some(ov) => rewrite(j, left, right, cond, ov, w)
          case None => j
        }
    }
  }

  /** The four bound expressions of an overlap condition: one `l <= r`
    * conjunct (left-only expr vs right-only expr) and one `r <= l`.
    */
  private case class Overlap(lLow: Expression, rHigh: Expression,
                             rLow: Expression, lHigh: Expression)

  private def extractOverlap(j: Join, cond: Expression): Option[Overlap] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def side(e: Expression): Int =
      if (e.references.isEmpty) 0
      else if (e.references.subsetOf(j.left.outputSet)) 1
      else if (e.references.subsetOf(j.right.outputSet)) 2
      else 0
    def supported(e: Expression): Boolean = e.dataType match {
      case TimestampType | LongType | IntegerType => true
      case _ => false
    }
    // an equi conjunct between the sides means the hash planner already
    // has a key — never second-guess it
    val hasEqui = conjuncts.exists {
      case EqualTo(x, y) => (side(x) == 1 && side(y) == 2) ||
        (side(x) == 2 && side(y) == 1)
      case EqualNullSafe(x, y) => (side(x) == 1 && side(y) == 2) ||
        (side(x) == 2 && side(y) == 1)
      case _ => false
    }
    if (hasEqui) return None
    // normalize every comparison conjunct to x <= y (strictness is
    // irrelevant for binning; the original condition is re-applied exactly)
    val le = conjuncts.collect {
      case LessThanOrEqual(x, y) => (x, y)
      case LessThan(x, y) => (x, y)
      case GreaterThanOrEqual(x, y) => (y, x)
      case GreaterThan(x, y) => (y, x)
    }.filter { case (x, y) => supported(x) && supported(y) }
    val lrs = le.filter { case (x, y) => side(x) == 1 && side(y) == 2 }
    val rls = le.filter { case (x, y) => side(x) == 2 && side(y) == 1 }
    // all four bounds must live on ONE axis (identical types): a timestamp
    // pair plus a long pair is two band predicates, not an overlap, and
    // Least/Greatest over mixed operands would not even analyze
    val combos = for {
      (lLow, rHigh) <- lrs
      (rLow, lHigh) <- rls
      if rHigh.dataType == lLow.dataType && rLow.dataType == lLow.dataType &&
        lHigh.dataType == lLow.dataType
    } yield Overlap(lLow, rHigh, rLow, lHigh)
    combos.headOption
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, ov: Overlap, w: Long): LogicalPlan = {
    // Sequence and Cast are TimeZoneAwareExpressions — without an explicit
    // timeZoneId the rewritten plan is unresolved and the optimizer rejects it
    val tz = Some(conf.sessionLocalTimeZone)
    // floor(seconds / w): monotone; exact for |seconds| < 2^53 / w
    def toBin(e: Expression): Expression =
      Floor(Divide(Cast(e, DoubleType, tz), Literal(w.toDouble)))
    def bins(lo: Expression, hi: Expression): Expression =
      Sequence(toBin(Least(Seq(lo, hi))), toBin(Greatest(Seq(lo, hi))),
        Some(Literal(1L)), tz)
    // per-row explode bound: rows spanning more bins than this take the
    // nested-loop fallback branch instead of exploding
    def fitsCap(cap: Long)(lo: Expression, hi: Expression): Expression =
      LessThan(Subtract(toBin(Greatest(Seq(lo, hi))),
        toBin(Least(Seq(lo, hi)))), Literal(cap))
    val cap = maxBinsPerRow
    val (srcL, srcR, fallback) = if (cap > 0) {
      val small = fitsCap(cap) _
      // NULL-bound rows: the cap predicate is NULL, both Filters drop them
      // — the same rows the original join can never match
      val smallL = Filter(small(ov.lLow, ov.lHigh), left)
      val smallR = Filter(small(ov.rLow, ov.rHigh), right)
      val largeL = Filter(Not(small(ov.lLow, ov.lHigh)), left)
      val largeR = Filter(Not(small(ov.rLow, ov.rHigh)), right)
      // broadcast the large-interval side: it is tiny by construction
      // (pathological sentinel rows), and Filter stats would otherwise let
      // the planner broadcast the big side. The hint also being != NONE
      // means this rule can never re-match its own fallback in the
      // fixed-point batch.
      val bcast = Some(HintInfo(strategy = Some(BROADCAST)))
      // (large L × all R) ∪ (small L × large R) ∪ (small L × small R)
      // partitions the pair space exactly — each original pair lands in
      // precisely one branch, and every branch re-checks `cond` verbatim
      val fb = Seq(
        Project(j.output,
          Join(largeL, right, Inner, Some(cond), JoinHint(bcast, None))),
        Project(j.output,
          Join(smallL, largeR, Inner, Some(cond), JoinHint(None, bcast))))
      (smallL: LogicalPlan, smallR: LogicalPlan, fb)
    } else (left, right, Seq.empty[LogicalPlan])
    val binL = AttributeReference("__graft_bin_l", LongType, nullable = false)()
    val binR = AttributeReference("__graft_bin_r", LongType, nullable = false)()
    val genL = Generate(Explode(bins(ov.lLow, ov.lHigh)), Nil,
      outer = false, None, Seq(binL), srcL)
    val genR = Generate(Explode(bins(ov.rLow, ov.rHigh)), Nil,
      outer = false, None, Seq(binR), srcR)
    // first-shared-bin reference point: emit each matching pair exactly once
    val refPoint = EqualTo(binL,
      Greatest(Seq(toBin(Least(Seq(ov.lLow, ov.lHigh))),
        toBin(Least(Seq(ov.rLow, ov.rHigh))))))
    val newCond = And(And(cond, EqualTo(binL, binR)), refPoint)
    val binJoin = Project(j.output,
      Join(genL, genR, Inner, Some(newCond), JoinHint.NONE))
    if (fallback.isEmpty) binJoin
    else Union(binJoin +: fallback, byName = false, allowMissingCol = false)
  }
}

object RangeJoinRule {
  /** The [[RangeJoinRule]] stats gate, shared with query code: a consumer
    * about to feed BOTH sides of an overlap join from one subtree can ask
    * the same question the rule will — "would this side take the
    * nested-loop path?" — and materialize (localCheckpoint) the shared
    * subtree ONLY when the rewrite is coming. The rewrite's three-branch
    * union references each side up to three times, so leaving the subtree
    * lazy re-executes it per branch (j10 measured 6 session-window
    * aggregations for one query); materializing it unconditionally would
    * instead blind the gate (a LogicalRDD has no stats) and turn the
    * tiny-side BNLJ plan — which beats explode+shuffle — into the rewrite.
    */
  def smallSide(p: LogicalPlan,
                conf: org.apache.spark.sql.internal.SQLConf): Boolean = {
    val t = conf.autoBroadcastJoinThreshold
    val cap = conf
      .getConfString("spark.graft.rangeJoin.smallSideBytes", "262144").toLong
    t >= 0 && p.stats.sizeInBytes <= math.min(t, cap)
  }
}

/** `SparkSessionExtensions` hook: `.withExtensions(GraftExtensions)` on any
  * builder, or `spark.sql.extensions=graft.plans.GraftExtensions`. Injects
  * the optimizer rule above and registers the engine's native codegen
  * expressions as SQL functions, so the pure-SQL face of the library can
  * run the same per-row dedup/similarity kernels the DataFrame API uses
  * (SqlInterfaceSpec pins SQL == DataFrame for each):
  *
  *   graft_dot_long(a, b)                 exact integer dot product
  *   graft_shingle_hashes(text, n)        distinct word-n-gram 60-bit hashes
  *   graft_minhash_sig(shingles, k)       all k minhashes in one pass
  *   graft_lsh_band_sig(vec, bands, planesPerBand, dims)  banded sign-LSH
  *
  * Size parameters must be integer literals — they select codegen shapes
  * (hyperplane matrices, signature widths), not per-row data.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import org.apache.spark.sql.catalyst.FunctionIdentifier

  private def litInt(fn: String, args: Seq[Expression], pos: Int): Int =
    args(pos) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an integer literal, got $other")
    }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.size != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.size}")

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans.GraftExtensions", name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(RangeJoinRule.apply)
    ext.injectFunction((FunctionIdentifier("graft_dot_long"),
      info("graft_dot_long", "exact integer dot product"),
      (args: Seq[Expression]) => {
        arity("graft_dot_long", args, 2)
        graft.functions.DotProductLong(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "distinct word-n-gram hashes"),
      (args: Seq[Expression]) => {
        arity("graft_shingle_hashes", args, 2)
        graft.functions.ShingleHashes(args(0),
          litInt("graft_shingle_hashes", args, 1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "k minhashes of a shingle-hash array"),
      (args: Seq[Expression]) => {
        arity("graft_minhash_sig", args, 2)
        graft.functions.MinHashSig(args(0), litInt("graft_minhash_sig", args, 1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_lsh_band_sig"),
      info("graft_lsh_band_sig", "banded random-hyperplane LSH signature"),
      (args: Seq[Expression]) => {
        arity("graft_lsh_band_sig", args, 4)
        graft.functions.LshBandSig(args(0),
          litInt("graft_lsh_band_sig", args, 1),
          litInt("graft_lsh_band_sig", args, 2),
          litInt("graft_lsh_band_sig", args, 3))
      }))
  }
}

object GraftExtensions extends GraftExtensions
