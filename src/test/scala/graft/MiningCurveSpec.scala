package graft

/** Semantic contracts for the round-11 mining queries that the DuckDB
  * hash-match alone can't express as an invariant:
  *
  * - s23 (hard-negative triplets): the positive really is the top
  *   same-label neighbor, negatives are rank-ordered different-label
  *   neighbors, and margin = pos_cos − neg_cos exactly.
  * - d32 (dedup threshold → yield curve): raising τ can only evict FEWER
  *   documents (max-jac thresholding is monotone), yields are consistent
  *   with totals, and the τ = 0.3 row equals the full canonical pair set's
  *   eviction count (every committed pair has jac ≥ 0.3).
  */
class MiningCurveSpec extends SparkSpecBase {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf("sf0.001")).collect()

  test("s23: positive outranks the query's same-label field; margins exact") {
    val out = rows("s23_hard_negatives")
    assert(out.nonEmpty, "sample queries must produce triplets")
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rs) =>
      // one positive per query, repeated on every negative row
      assert(rs.map(r => (r.getLong(2), r.getDouble(3))).distinct.size == 1,
        s"query $q must carry exactly one positive")
      // negatives rank-ordered by (cos desc, id asc), ranks 1..k contiguous
      val negs = rs.sortBy(_.getLong(1))
      assert(negs.map(_.getLong(1)).toSeq == (1L to negs.length).toSeq)
      val ordered = negs.map(r => (r.getDouble(5), r.getLong(4)))
      assert(ordered.sameElements(ordered.sortBy(p => (-p._1, p._2))),
        s"query $q negatives must be (cos desc, id asc)-ordered")
      // margin is the exact double subtraction, no re-derivation drift
      rs.foreach { r =>
        assert(r.getDouble(6) == r.getDouble(3) - r.getDouble(5))
      }
      // positive and negatives never collide
      assert(!negs.map(_.getLong(4)).contains(rs.head.getLong(2)))
    }
  }

  test("d32: eviction is monotone non-increasing in tau; totals consistent") {
    val out = rows("d32_threshold_yield").sortBy(_.getDouble(0))
    assert(out.length == 4, "four thresholds")
    val evicted = out.map(_.getLong(2))
    assert(evicted.zip(evicted.tail).forall { case (lo, hi) => hi <= lo },
      s"higher tau must evict no more docs: ${evicted.toSeq}")
    // per-row consistency: retained + evicted is the same corpus every row
    val totals = out.map(r => r.getLong(1) + r.getLong(2)).distinct
    assert(totals.length == 1, "doc total must not vary with tau")
    val tokTotals = out.map(r => r.getLong(3) + r.getLong(4)).distinct
    assert(tokTotals.length == 1, "token total must not vary with tau")
    out.foreach { r =>
      assert(r.getDouble(5) ==
        r.getLong(3).toDouble / (r.getLong(3) + r.getLong(4)))
    }
    // tau = 0.3 floor: every canonical pair is jac >= 0.3, so the curve's
    // first row must equal the pair set's distinct higher-id count
    val pairEvicted = SparkEntry.queries("d03_minhash_lsh")(spark, sf("sf0.001"))
      .select("j").distinct().count()
    assert(out.head.getLong(2) == pairEvicted,
      "tau=0.3 eviction must equal the full pair set's keep-lower-id eviction")
  }
}
