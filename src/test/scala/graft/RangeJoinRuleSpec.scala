package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RangeJoinRule: the no-equi-key interval join must re-plan as a binned
  * equi-join with IDENTICAL results — same rows, same multiplicity — and
  * must leave every join the hash planner already handles alone.
  */
class RangeJoinRuleSpec extends SparkSpecBase {

  private def withRule[A](on: Boolean)(f: => A): A = {
    val key = "spark.graft.rangeJoin.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
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
    val on = withRule(true) {
      val d = naive(a, b)
      val s = planString(d)
      assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
        s"rule must remove the nested loop, got:\n$s")
      assert(s.contains("__graft_bin"), "the bin key must drive the join")
      sortedRows(d)
    }
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
    val on = withRule(true) {
      val d = q
      assert(!planString(d).contains("BroadcastNestedLoopJoin"))
      sortedRows(d)
    }
    assert(on == off && on.nonEmpty)
  }

  test("null bounds drop identically on both paths") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "10")
    import spark.implicits._
    val a = Seq((1L, Some(0L), Some(95L)), (2L, None, Some(50L)),
      (3L, Some(10L), None)).toDF("a_id", "a_lo", "a_hi")
    val b = intervals(R, "b")
    val off = withRule(false)(sortedRows(naive(a, b)))
    val on = withRule(true)(sortedRows(naive(a, b)))
    assert(on == off)
    assert(on.forall(_(0) == 1L), "rows with NULL bounds never match")
  }

  test("joins with an equi key are left alone") {
    import spark.implicits._
    val a = Seq((1L, 0L, 95L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((1L, 50L, 120L)).toDF("b_id", "b_lo", "b_hi")
    val d = withRule(true) {
      a.join(b, col("a_id") === col("b_id") &&
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
    }
    assert(!planString(d).contains("__graft_bin"),
      "an existing equi key means the hash planner is already right")
    assert(d.count() == 1)
  }

  test("malformed lo>hi intervals agree with the naive join") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "10")
    val a = intervals(Seq((1L, 95L, 0L), (2L, 130L, 90L)), "a")
    val b = intervals(R, "b")
    val off = withRule(false)(sortedRows(naive(a, b)))
    val on = withRule(true)(sortedRows(naive(a, b)))
    assert(on == off, "least/greatest binning must cover reversed intervals")
  }
}
