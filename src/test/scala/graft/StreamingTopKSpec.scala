package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{KeyedItem, StreamingTopK, TopKSnapshot}

/** Streaming SpaceSaving heavy hitters (StreamingTopK): exact agreement
  * with the batch groupBy when nothing evicts, the sketch's error
  * guarantees when it does, and O(capacity) state either way.
  */
class StreamingTopKSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_stopk_$n").toString
  }

  /** Zipf-ish item stream over two groups: item u{k} appears ~300/k times
    * in group "buy" (9 distinct), plus a small uniform tail group "view".
    */
  private def events: Seq[KeyedItem] = {
    var s = 0L
    val buys = (1 to 9).flatMap { k =>
      (0 until 300 / k).map { _ =>
        s += 1; KeyedItem(t(s), s, "buy", f"u$k%02d")
      }
    }
    val views = (0 until 40).map { i =>
      s += 1; KeyedItem(t(s), s, "view", f"v${i % 8}")
    }
    buys ++ views
  }

  private def finalSnapshot(rows: Seq[TopKSnapshot]): Map[String, Seq[TopKSnapshot]] =
    rows.groupBy(_.group).map { case (g, rs) =>
      val nMax = rs.map(_.n_total).max
      g -> rs.filter(_.n_total == nMax).sortBy(_.rank)
    }

  test("capacity >= distinct: final snapshot equals the exact groupBy counts") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedItem]
    val q = StreamingTopK.track(in.toDS(), capacity = 16)
      .writeStream.format("memory").queryName("stopk_exact")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val snaps = try {
      events.grouped(97).foreach { g => in.addData(g: _*); q.processAllAvailable() }
      spark.table("stopk_exact").as[TopKSnapshot].collect().toSeq
    } finally q.stop()
    val last = finalSnapshot(snaps)
    val exact = StreamingTopK.exactTopK(events.toDF(), col("group"),
        col("item"), capacity = 16)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    val streamed = last.values.flatten
      .map(s0 => (s0.group, s0.rank, s0.item, s0.cnt)).toSet
    assert(streamed == exact,
      "with no evictions SpaceSaving IS the exact count table")
    assert(last.values.flatten.forall(_.err == 0L), "nothing evicted => err 0")
  }

  test("small capacity: heavy items survive and counts obey the error bound") {
    // capacity 4 over 9 distinct buy items: n = sum(300/k), n/m bounds err
    val ds = events.filter(_.group == "buy").toDS()
    val out = StreamingTopK.track(ds, capacity = 4).collect().toSeq
    val last = finalSnapshot(out)("buy")
    val total = events.count(_.group == "buy").toLong
    assert(last.size == 4)
    // the dominant item is guaranteed tracked: only u01 (300 of 847) has
    // true frequency above n/m = 211 — SpaceSaving promises nothing about
    // lighter items like u02 (150), which this adversarially sequential
    // order (each item's run arrives whole) does in fact evict
    val tracked = last.map(_.item).toSet
    assert(tracked.contains("u01"))
    // SpaceSaving invariants: cnt - err <= true count <= cnt; err <= n/m
    val truth = events.filter(_.group == "buy").groupBy(_.item)
      .map { case (i, es) => i -> es.size.toLong }
    last.foreach { s0 =>
      val tc = truth.getOrElse(s0.item, 0L)
      assert(s0.cnt >= tc && s0.cnt - s0.err <= tc,
        s"${s0.item}: cnt=${s0.cnt} err=${s0.err} true=$tc")
      assert(s0.err <= total / 4)
    }
    assert(last.head.item == "u01" && last.head.cnt == 300L &&
      last.head.err == 0L, "the never-evicted top item keeps an exact count")
  }

  test("state stays at capacity rows however long the stream runs") {
    var s = 0L
    val many = (0 until 5000).map { i =>
      s += 1; KeyedItem(t(s), s, "g", s"item${i % 977}")
    }
    val out = StreamingTopK.track(many.toDS(), capacity = 8).collect().toSeq
    val last = finalSnapshot(out)("g")
    assert(last.size == 8, "977 distinct items, state holds exactly 8")
    assert(last.map(_.n_total).max == 5000L)
  }
}
