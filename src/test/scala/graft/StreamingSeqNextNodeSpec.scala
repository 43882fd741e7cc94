package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{NodeEvent, SeqNode, StreamingSeqNextNode}

/** Streaming sequence next/prev-node (StreamingSeqNextNode, the live form
  * of r35/r36's path analysis): on ordered delivery the n=1 forward
  * emissions census to r35 (with pending users accounting for the batch
  * 'none' bucket), each user's LAST backward emission censuses to r36
  * exactly, journeys survive micro-batch boundaries, and the expiring
  * variant flushes a pending forward slot to 'none'.
  */
class StreamingSeqNextNodeSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_ssnn_$n").toString
  }

  private def runOrdered(events: Seq[NodeEvent],
                         batchSize: Int = 400): Seq[SeqNode] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[NodeEvent]
    val name = s"ssnn_t$n"
    val q = StreamingSeqNextNode.detect(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      events.grouped(batchSize).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
      spark.table(name).as[SeqNode].collect().toSeq
    } finally q.stop()
  }

  test("ordered replay at sf0.001: forward n=1 census == r35; last backward census == r36") {
    val dir = sf("sf0.001")
    val raw = Tables.events(spark, dir)
    val typed = StreamingSeqNextNode.nodeEvents(raw, col("user_id"),
        col("ts"), col("event_type"), col("event_id"), "view", "click")
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)).toSeq
    val live = runOrdered(typed)

    // r35: forward at n = 1; users still pending at stream end are the
    // batch 'none' bucket (their boundary click was their final event)
    val fwd1 = live.filter(e => e.direction == "forward" && e.n == 1L)
    val fwdCensus = fwd1.groupBy(_.node).view.mapValues(_.size.toLong).toMap
    val batch35 = SparkEntry.queries("r35_sequence_next_node")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nones = batch35.getOrElse("none", 0L)
    assert(fwdCensus == (batch35 - "none"),
      "live forward n=1 must census to r35 minus the pending bucket")
    val usersWithJourneys = live.filter(_.direction == "backward")
      .map(_.user_id).distinct.size.toLong
    assert(usersWithJourneys - fwd1.size.toLong == nones,
      "users left pending == the batch 'none' bucket")

    // r36: each user's LAST backward emission
    val back = live.filter(_.direction == "backward")
      .groupBy(_.user_id).view.mapValues(es => es.maxBy(_.n).node).toMap
    val backCensus = back.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val batch36 = SparkEntry.queries("r36_sequence_prev_node")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(backCensus == batch36,
      "live last-backward census must equal r36")
  }

  test("journeys and the pending slot survive micro-batch boundaries") {
    // u1: view | batch cut | click | batch cut | error — the boundary
    // click lands a batch after its view, and the forward node a batch
    // after the click
    val evs = Seq(
      NodeEvent(1L, t(0), 1, "view", 1L),
      NodeEvent(1L, t(10), 2, "click", 2L),
      NodeEvent(1L, t(20), 0, "error", 3L))
    val live = runOrdered(evs, batchSize = 1)
    assert(live.toSet == Set(
      SeqNode(1L, 1L, "backward", "none", t(10)),
      SeqNode(1L, 1L, "forward", "error", t(20))))
  }

  test("backward reads the full-sequence predecessor; second journey renumbers") {
    // u1: signup view click view click — journey 1's view preceded by
    // signup; journey 2's view preceded by the first click
    val evs = Seq(
      NodeEvent(1L, t(0), 0, "signup", 1L),
      NodeEvent(1L, t(1), 1, "view", 2L),
      NodeEvent(1L, t(2), 2, "click", 3L),
      NodeEvent(1L, t(3), 1, "view", 4L),
      NodeEvent(1L, t(4), 2, "click", 5L))
    val live = runOrdered(evs)
    assert(live.filter(_.direction == "backward").map(e => (e.n, e.node)) ==
      Seq((1L, "signup"), (2L, "click")))
    // journey 1's forward node is the second view; journey 2 stays pending
    assert(live.filter(_.direction == "forward").map(e => (e.n, e.node)) ==
      Seq((1L, "view")))
  }

  test("a click-click run completes only one journey; unrelated types pass freely") {
    val evs = Seq(
      NodeEvent(1L, t(0), 1, "view", 1L),
      NodeEvent(1L, t(1), 0, "promo", 2L), // non-condition: lastSub holds
      NodeEvent(1L, t(2), 2, "click", 3L),
      NodeEvent(1L, t(3), 2, "click", 4L)) // subsequence predecessor = click
    val live = runOrdered(evs)
    assert(live.count(_.direction == "backward") == 1)
    assert(live.filter(_.direction == "forward").map(_.node) == Seq("click"))
  }

  test("expiring variant flushes a pending forward slot to 'none'") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[NodeEvent]
    val q = StreamingSeqNextNode.detectExpiring(in.toDS(),
        watermarkDelayMs = 1000L)
      .writeStream.format("memory").queryName("ssnn_expire")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(
        NodeEvent(1L, t(0), 1, "view", 1L),
        NodeEvent(1L, t(1), 2, "click", 2L)) // boundary click, then silence
      q.processAllAvailable()
      // another user far in the future advances the watermark past u1's
      // horizon; the next batch fires u1's timeout
      in.addData(NodeEvent(2L, t(10000), 0, "noise", 3L))
      q.processAllAvailable()
      in.addData(NodeEvent(2L, t(10001), 0, "noise", 4L))
      q.processAllAvailable()
      val got = spark.table("ssnn_expire").as[SeqNode].collect().toSeq
      assert(got.exists(e =>
        e.user_id == 1L && e.direction == "forward" && e.node == "none"),
        s"pending slot must flush to 'none' at expiry; got $got")
      assert(got.count(e => e.user_id == 1L && e.direction == "forward") == 1)
    } finally q.stop()
  }
}
