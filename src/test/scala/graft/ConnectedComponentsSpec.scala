package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("label propagation finds exact components incl. chains and isolates") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("i", "j")
    val got = ConnectedComponents.labelPropagation(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("empty edge set yields an empty labeling on both algorithms") {
    // legal input: a bucketed candidate stage (d11's banded LSH) can find
    // zero qualifying pairs — components() must return empty, not throw on
    // the NULL SUM convergence witness
    val empty = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(ConnectedComponents.labelPropagation(empty).isEmpty)
    assert(ConnectedComponents.starContraction(empty).isEmpty)
    assert(ConnectedComponents.components(empty).isEmpty)
  }

  test("long chain converges within the iteration budget") {
    val n = 15
    val edges = (0 until n).map(k => (k.toLong, (k + 1).toLong)).toDF("i", "j")
    val got = ConnectedComponents.labelPropagation(edges, maxIter = 20)
      .select("component").distinct().as[Long].collect().toSeq
    assert(got == Seq(0L), "one component labeled by its minimum")
  }

  test("star contraction agrees with label propagation on every topology") {
    val rnd = new scala.util.Random(11)
    val cases = Seq(
      // chain + pair + triangle (the exact-components case above)
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
        (20L, 21L), (21L, 22L), (20L, 22L)),
      // stars already, reversed orientation, self-loop noise
      Seq((5L, 1L), (6L, 1L), (7L, 1L), (9L, 9L)),
      // random sparse graph
      Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(p => p._1 != p._2))
    for (es <- cases) {
      val edges = es.toDF("i", "j")
      val prop = ConnectedComponents.labelPropagation(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = ConnectedComponents.starContraction(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == prop, s"disagreement on $es")
    }
  }

  test("deep chain: contraction converges where propagation's budget fails") {
    val n = 200 // diameter 200 ≫ the default 20-round propagation budget
    val edges = (0 until n).map(k => (k.toLong, (k + 1).toLong)).toDF("i", "j")
    intercept[IllegalStateException](
      ConnectedComponents.labelPropagation(edges).collect())
    val got = ConnectedComponents.starContraction(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == n + 1 && got.forall(_._2 == 0L),
      "every chain node labeled by the minimum in O(log n) rounds")
  }

  test("components() auto-falls back to star contraction on deep graphs") {
    // default dispatch, no system property: propagation's budget fails on a
    // diameter-200 chain, and components() must complete via contraction
    // instead of throwing — same exact labels
    val n = 200
    val edges = (0 until n).map(k => (k.toLong, (k + 1).toLong)).toDF("i", "j")
    val got = ConnectedComponents.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == n + 1 && got.forall(_._2 == 0L))
    // forced propagation keeps the throwing contract
    sys.props("graft.cc.algo") = "propagation"
    try intercept[IllegalStateException](
      ConnectedComponents.components(edges).collect())
    finally sys.props -= "graft.cc.algo"
  }

  test("both algorithms agree on the real near-dup pair graph (d07 input)") {
    val pairs = graft.operators.MinHashLSH.nearDuplicates(
      Tables.documents(spark, sf("sf0.001")),
      col("doc_id"), col("text"), shingleN = 3, k = 8, r = 2, threshold = 0.3)
      .select(col("i"), col("j"))
      .localCheckpoint(true)
    val prop = ConnectedComponents.labelPropagation(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = ConnectedComponents.starContraction(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prop.nonEmpty && star == prop)
  }

  test("components() dispatches on graft.cc.algo and both label identically") {
    val edges = Seq((3L, 9L), (9L, 4L), (50L, 40L)).toDF("i", "j")
    val default = ConnectedComponents.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sys.props("graft.cc.algo") = "star"
    try {
      val viaStar = ConnectedComponents.components(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(default == viaStar)
      assert(default == Map(3L -> 3L, 9L -> 3L, 4L -> 3L, 40L -> 40L, 50L -> 40L))
    } finally sys.props -= "graft.cc.algo"
  }
}
