package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingStats, ValueEvent}

/** Streaming running-moments anomaly detection (StreamingStats): O(1)
  * integer state per key, verdicts over the strictly preceding
  * distribution, and exact agreement with the batch cumulative-window form
  * (query r15's plan) on the same events.
  */
class StreamingStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_sstats_$n").toString
  }

  /** 40 calm events (vq alternating 1000±10) then one 6-sigma spike and
    * one calm straggler, all one type; a second type stays under burn-in.
    */
  private def events: Seq[ValueEvent] = {
    val calm = (0 until 40).map(i =>
      ValueEvent(i.toLong, t(i.toLong), "buy",
        if (i % 2 == 0) 990L else 1010L))
    val spike = ValueEvent(40L, t(40), "buy", 1500L)
    val after = ValueEvent(41L, t(41), "buy", 1000L)
    val other = (0 until 5).map(i =>
      ValueEvent(100L + i, t(i.toLong), "view", 5000L + i))
    calm ++ Seq(spike, after) ++ other
  }

  test("spike is flagged against the preceding distribution; burn-in holds") {
    val out = StreamingStats.score(events.toDS(), streaming = false)
      .collect().map(v => v.event_id -> v).toMap
    assert(out(40L).anomalous, "the 6-sigma spike must flag")
    assert(out(40L).zscore > 3.0)
    assert(out(40L).n_before == 40L)
    // events under the burn-in never flag, whatever their value
    assert((0 until 30).forall(i => !out(i.toLong).anomalous))
    assert(!out(104L).anomalous, "5 events of 'view' stay under burn-in")
    // the straggler AFTER the spike is scored against sums that now
    // include the spike — still calm
    assert(!out(41L).anomalous)
  }

  test("streaming micro-batches agree row-for-row with the batch window form") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ValueEvent]
    val q = StreamingStats.score(in.toDS())
      .writeStream.format("memory").queryName("sstats_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val streamed = try {
      events.grouped(7).foreach { g => in.addData(g: _*); q.processAllAvailable() }
      spark.table("sstats_agree").collect()
        .map(r => (r.getLong(0), r.getLong(4), r.getDouble(5), r.getBoolean(6)))
        .toSet
    } finally q.stop()
    val batch = StreamingStats
      .batchZScores(events.toDF(), col("event_id"), col("ts"),
        col("event_type"), col("vq") / 100.0)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("n_before"),
        r.getAs[Double]("zscore"), r.getAs[Boolean]("anomalous")))
      .toSet
    assert(streamed == batch,
      "flatMapGroupsWithState and the cumulative window must agree exactly")
  }

  test("state is three integers regardless of events seen") {
    // the detector's state never grows: feed 1000 events, state is one
    // MomentState row per key with the exact sums
    val many = (0 until 1000).map(i =>
      ValueEvent(i.toLong, t(i.toLong), "buy", (i % 7).toLong))
    val out = StreamingStats.score(many.toDS(), streaming = false).collect()
    assert(out.length == 1000)
    // exact-sum check: last event's n_before covers everything before it
    assert(out.map(_.n_before).max == 999L)
  }
}
