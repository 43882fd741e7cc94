package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ScoredId, TopKByScore}

class AggregatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("TopKByScore unit semantics: ordering, ties, capacity, merge") {
    val agg = new TopKByScore(3)
    val items = Seq(
      ScoredId(5, 0.9), ScoredId(1, 0.9), // tie → lower id first
      ScoredId(2, 0.95), ScoredId(7, 0.1), ScoredId(3, 0.5))
    val reduced = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(reduced).map(_.id) == Seq(2, 1, 5))
    // merge of partial buffers equals reduce over the union
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == agg.finish(reduced))
  }

  test("TopKByScore over a DataFrame equals the window row_number form") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 2000).map { _ =>
      (rnd.nextInt(10).toLong, rnd.nextInt(500).toLong,
        math.floor(rnd.nextDouble() * 100) / 100) // coarse scores force ties
    }.toDF("query_id", "neighbor_id", "cos")
      .distinct() // (query, neighbor) duplicated rows would tie ambiguously
    val k = 5

    val topk = TopKByScore(k)
    val viaAgg = pairs.groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).as("rk"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val viaWindow = pairs
      .withColumn("rk", (row_number().over(w) - 0).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))

    val a = viaAgg.collect().map(_.toSeq).toSet
    val b = viaWindow.collect().map(_.toSeq).toSet
    assert(a == b, "aggregator must be plan-for-plan interchangeable with window ranking")
  }

  test("CollectCapped: full collection under the cap, O(cap) witness above it") {
    import graft.functions.CollectCapped
    val agg = new CollectCapped(3)
    // under cap: everything kept
    assert(Seq(1L, 2L).foldLeft(agg.zero)(agg.reduce).sorted == Seq(1L, 2L))
    // over cap: buffer pins at cap+1 — the df-exceeded witness
    assert((1L to 100L).foldLeft(agg.zero)(agg.reduce).size == 4)
    // merge never grows past cap+1 and keeps saturated buffers cheap
    val l = (1L to 4L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(l, (5L to 9L).foldLeft(agg.zero)(agg.reduce)).size == 4)
    assert(agg.merge(Seq(1L), Seq(2L, 3L)).sorted == Seq(1L, 2L, 3L))

    // DataFrame form: groups ≤ cap identical to collect_list; > cap flagged
    val df = ((1 to 10).map(i => ("big", i.toLong)) ++
      Seq(("small", 1L), ("small", 2L))).toDF("k", "v")
    val cl = CollectCapped(3)
    val got = df.groupBy(col("k")).agg(sort_array(cl(col("v"))).as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("small") == Seq(1L, 2L))
    assert(got("big").size == 4, "over-cap group truncates at cap+1")
  }
}
