package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config.Duration
import graft.streaming.StreamingDedup

/** SURVEY.md §7.4 contract: `dropDuplicatesWithinWatermark` (state evicted by
  * watermark delay) and `keepFirstStateful` (exact GlassFlow window-reopen
  * semantics) AGREE whenever the dedup window exceeds the stream horizon —
  * the reference's operating regime (8h window, minutes of data). Pinned
  * over randomized duplicate patterns across micro-batch boundaries.
  */
class DedupContractSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
  private def tmp() = java.nio.file.Files.createTempDirectory("graft_dc").toString

  test("both streaming dedups emit the same keys when window >> horizon") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    // 60 events over a 300s horizon: ~20 distinct keys, heavy duplication
    val events = (0 until 60).map { i =>
      Ev(s"k${rnd.nextInt(20)}", t(rnd.nextInt(300)), s"p$i")
    }
    val batches = events.grouped(15).toSeq // 4 micro-batches

    def runQuery(mk: MemoryStream[Ev] => org.apache.spark.sql.DataFrame,
                 name: String): Set[String] = {
      val in = MemoryStream[Ev]
      val q = mk(in).writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", tmp()).start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        spark.table(name).select("event_id").as[String].collect().toSet
      } finally q.stop()
    }

    val window = Duration.parse("8h") // >> 300s horizon
    val viaWatermark = runQuery(in =>
      StreamingDedup.withinWatermark(in.toDF(), Seq("event_id"), "ts", window),
      "dc_wm")
    // watermark delay = dedup window (ST3: the documented contract — a
    // tighter delay would drop out-of-order rows as late before they reach
    // the state function, which the reference can't observe because its
    // event time is broker arrival time)
    val viaStateful = runQuery(in =>
      StreamingDedup.keepFirstStateful[Ev](
        in.toDF().withWatermark("ts", window.asSparkInterval).as[Ev],
        _.event_id, _.ts, window).toDF(),
      "dc_sf")

    assert(viaWatermark == viaStateful,
      "the two dedup implementations must agree in the reference regime")
    assert(viaWatermark == events.map(_.event_id).toSet,
      "every distinct key survives exactly once")
  }
}
