package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RangeJoinRule: the no-equi-key interval join must re-plan as a binned
  * equi-join with IDENTICAL results — same rows, same multiplicity — and
  * must leave every join the hash planner already handles alone: joins with
  * an equi key, joins with a broadcast-small side (stats gate), and
  * conditions whose bounds mix axes (type gate). Rows with pathological
  * spans take the per-row nested-loop fallback instead of exploding.
  */
class RangeJoinRuleSpec extends SparkSpecBase
    with org.scalatest.BeforeAndAfterAll {

  // several tests here pin binSize=10 for tiny fixtures; the session is
  // JVM-shared across suites (SparkSpecBase), so restore the default or
  // later plan-shape tests see 10-unit bins
  override def afterAll(): Unit = {
    spark.conf.unset("spark.graft.rangeJoin.binSize")
    super.afterAll()
  }

  private def withRule[A](on: Boolean)(f: => A): A = {
    val key = "spark.graft.rangeJoin.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Simulate big×big: with the default 10 MB autoBroadcastJoinThreshold the
    * stats gate correctly refuses to rewrite these tiny local frames (that
    * case has its own test below); disabling broadcast is how a 100 TB
    * two-sided join looks to the rule.
    */
  private def bigBig[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def intervals(rows: Seq[(Long, Long, Long)], p: String): DataFrame = {
    import spark.implicits._
    rows.toDF(s"${p}_id", s"${p}_lo", s"${p}_hi")
  }

  // spans chosen so several pairs share MANY bins at width 10 — the
  // reference-point dedup is what keeps multiplicity at 1
  private val L = Seq((1L, 0L, 95L), (2L, 40L, 44L), (3L, 200L, 205L),
    (4L, 90L, 130L), (4L, 90L, 130L)) // duplicate row: multiplicity 2 preserved
  private val R = Seq((10L, 50L, 120L), (11L, 3L, 7L), (12L, 210L, 300L),
    (13L, 400L, 401L))

  private def naive(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq

  /** The rewrite fired: the bin key exists and drives a real equi join.
    * (The plan also carries the two hinted nested-loop fallback branches
    * for over-cap rows — empty at runtime here, pruned by AQE.)
    */
  private def assertRewritten(s: String): Unit = {
    assert(s.contains("__graft_bin"), s"the bin key must drive the join:\n$s")
    assert(s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin") ||
      s.contains("BroadcastHashJoin"),
      s"the small-span branch must be an equi join on the bin key:\n$s")
  }

  test("overlap join rewrites to an equi-join; results identical incl. multiplicity") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "10")
    val a = intervals(L, "a")
    val b = intervals(R, "b")
    val off = withRule(false) {
      val d = naive(a, b)
      val s = planString(d)
      assert(s.contains("BroadcastNestedLoopJoin") || s.contains("CartesianProduct"),
        s"without the rule this must be a nested loop, got:\n$s")
      sortedRows(d)
    }
    val on = withRule(true)(bigBig {
      val d = naive(a, b)
      assertRewritten(planString(d))
      sortedRows(d)
    })
    assert(on == off, "rewritten results must equal the naive join exactly")
    assert(on.nonEmpty && on.size == off.size)
    // the duplicate (4,90,130) row must match (10,50,120) twice — once per
    // input row, exactly once per pair despite 5 shared bins
    assert(on.count(r => r(0) == 4L && r(3) == 10L) == 2)
  }

  test("point-in-interval form rewrites and agrees") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "10")
    import spark.implicits._
    val pts = Seq((100L, 55L), (101L, 5L), (102L, 207L), (103L, 999L))
      .toDF("p_id", "p_t")
    val iv = intervals(R, "b")
    def q = pts.join(iv, col("b_lo") <= col("p_t") && col("p_t") <= col("b_hi"))
    val off = withRule(false)(sortedRows(q))
    val on = withRule(true)(bigBig {
      val d = q
      assertRewritten(planString(d))
      sortedRows(d)
    })
    assert(on == off && on.nonEmpty)
  }

  test("null bounds drop identically on both paths") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "10")
    import spark.implicits._
    val a = Seq((1L, Some(0L), Some(95L)), (2L, None, Some(50L)),
      (3L, Some(10L), None)).toDF("a_id", "a_lo", "a_hi")
    val b = intervals(R, "b")
    val off = withRule(false)(sortedRows(naive(a, b)))
    val on = withRule(true)(bigBig(sortedRows(naive(a, b))))
    assert(on == off)
    assert(on.forall(_(0) == 1L), "rows with NULL bounds never match")
  }

  test("joins with an equi key are left alone") {
    import spark.implicits._
    val a = Seq((1L, 0L, 95L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((1L, 50L, 120L)).toDF("b_id", "b_lo", "b_hi")
    val d = withRule(true)(bigBig {
      a.join(b, col("a_id") === col("b_id") &&
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
    })
    assert(!planString(d).contains("__graft_bin"),
      "an existing equi key means the hash planner is already right")
    assert(d.count() == 1)
  }

  test("malformed lo>hi intervals agree with the naive join") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "10")
    val a = intervals(Seq((1L, 95L, 0L), (2L, 130L, 90L)), "a")
    val b = intervals(R, "b")
    val off = withRule(false)(sortedRows(naive(a, b)))
    val on = withRule(true)(bigBig(sortedRows(naive(a, b))))
    assert(on == off, "least/greatest binning must cover reversed intervals")
  }

  test("stats gate: a broadcast-small side keeps the nested loop") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "10")
    val a = intervals(L, "a")
    val b = intervals(R, "b")
    // default autoBroadcastJoinThreshold (10 MB): these local frames are
    // broadcast-small, and BNLJ with a tiny broadcast side beats two
    // explodes plus a shuffle — the rule must stand down
    val d = withRule(true)(naive(a, b))
    val s = planString(d)
    assert(!s.contains("__graft_bin"),
      s"broadcast-small sides must not be rewritten:\n$s")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("CartesianProduct"))
    assert(sortedRows(d) == withRule(false)(sortedRows(naive(a, b))))
  }

  test("type gate: bounds on two different axes are left alone") {
    import spark.implicits._
    val t0 = 1700000000000L
    val a = Seq((1L, new java.sql.Timestamp(t0), 10L),
      (2L, new java.sql.Timestamp(t0 + 3600000L), 99L))
      .toDF("a_id", "a_ts", "a_seq")
    val b = Seq((10L, new java.sql.Timestamp(t0 + 60000L), 5L),
      (11L, new java.sql.Timestamp(t0 + 7200000L), 50L))
      .toDF("b_id", "b_ts", "b_seq")
    // one timestamp conjunct, one long conjunct: a band predicate on two
    // axes, not an interval overlap — binning it would build Least/Greatest
    // over mixed timestamp/long operands and fail analysis
    def q = a.join(b, col("a_ts") <= col("b_ts") && col("b_seq") <= col("a_seq"))
    val on = withRule(true)(bigBig {
      val d = q
      assert(!planString(d).contains("__graft_bin"),
        "mixed-axis bounds must not be rewritten")
      sortedRows(d)
    })
    val off = withRule(false)(sortedRows(q))
    assert(on == off && on.nonEmpty)
  }

  test("pathological spans take the per-row nested-loop fallback") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "10")
    // an SCD2-style open interval: 4e11 bins at width 10 — exploding it
    // would OOM / overflow Sequence; the cap routes the ROW, not the query,
    // to a nested loop
    val sentinel = 4000000000000L
    val a = intervals(L :+ ((5L, 0L, sentinel)), "a")
    val b = intervals(R :+ ((14L, 100L, sentinel)), "b")
    val off = withRule(false)(sortedRows(naive(a, b)))
    val on = withRule(true)(bigBig {
      val d = naive(a, b)
      val s = planString(d)
      assertRewritten(s)
      assert(s.contains("Union"), s"fallback branches must union in:\n$s")
      assert(s.contains("BroadcastNestedLoopJoin"),
        "over-cap rows join through the hinted nested-loop branch")
      sortedRows(d)
    })
    assert(on == off, "fallback branches must partition the pair space exactly")
    // the open a-interval overlaps every b row; the open b row overlaps the
    // 4 a rows whose a_hi >= 100 (3, both 4s, and the open row 5)
    assert(on.count(_(0) == 5L) == b.count())
    assert(on.count(_(3) == 14L) == 4)
    // disabling the cap reproduces the failure the guard exists for
    withRule(true)(bigBig {
      spark.conf.set("spark.graft.rangeJoin.maxBinsPerRow", "0")
      try intercept[Throwable](naive(a, b).collect())
      finally spark.conf.unset("spark.graft.rangeJoin.maxBinsPerRow")
    })
  }
}
