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

  test("long chain converges within the iteration budget") {
    val n = 15
    val edges = (0 until n).map(k => (k.toLong, (k + 1).toLong)).toDF("i", "j")
    val got = ConnectedComponents.labelPropagation(edges, maxIter = 20)
      .select("component").distinct().as[Long].collect().toSeq
    assert(got == Seq(0L), "one component labeled by its minimum")
  }
}
