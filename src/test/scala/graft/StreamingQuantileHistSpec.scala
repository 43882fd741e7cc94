package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{GroupedValue, QHistConfig, StreamingQuantileHist}

/** Streaming histogram quantiles (StreamingQuantileHist, r34's live
  * form): the sketch is pure integer arithmetic, so the live fold, the
  * batch twin, and the registered r34 query agree EXACTLY; merging is an
  * elementwise sum, so batch splitting and arrival order are invisible;
  * state is buckets+2 longs per group at any stream length.
  */
class StreamingQuantileHistSpec extends SparkSpecBase {
  import spark.implicits._

  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_qhist_$n").toString
  }

  private def snap(rows: Seq[GroupedValue], cfg: QHistConfig)
    : Map[String, (Long, Long, Long, Long)] =
    StreamingQuantileHist.track(rows.toDS(), cfg).collect()
      .groupBy(_.group).map { case (g, ss) =>
        val s = ss.maxBy(_.n_total)
        g -> (s.n_total, s.p50, s.p90, s.p99)
      }

  test("hand-computed ranks: first cumulative crossing's upper bound") {
    val cfg = QHistConfig(lo = 0L, width = 10L, buckets = 20)
    val rows = (1L to 100L).map(v => GroupedValue("g", v))
    // ranks 50/90/99; cum hits 50 in [50,60), 90 and 99 in [90,100)
    assert(snap(rows, cfg) == Map("g" -> ((100L, 60L, 100L, 100L))))
  }

  test("underflow reports lo, overflow reports Long.MaxValue") {
    val cfg = QHistConfig(lo = 0L, width = 10L, buckets = 20)
    val rows = Seq(-5L, -5L, -5L, 5L, 10000L).map(GroupedValue("g", _))
    // n=5: rank(50)=3 lands in underflow (ub = lo), rank(99)=5 in overflow
    assert(snap(rows, cfg) == Map(
      "g" -> ((5L, 0L, Long.MaxValue, Long.MaxValue))))
  }

  test("streaming snapshots equal the batch twin AND r34 on the events table") {
    val dir = sf("sf0.001")
    val cfg = QHistConfig(lo = 0L, width = 100L, buckets = 512)
    val cents = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cv"))
    val typed = StreamingQuantileHist.grouped(cents,
      col("event_type"), col("cv")).collect()
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[GroupedValue]
    val q = StreamingQuantileHist.track(in.toDS(), cfg)
      .writeStream.format("memory").queryName("qhist_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val live = try {
      typed.grouped(700).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      spark.table("qhist_agree").as[graft.streaming.QHistSnapshot]
        .collect().groupBy(_.group)
        .map { case (g, ss) =>
          val s = ss.maxBy(_.n_total); g -> (s.n_total, s.p50, s.p90, s.p99)
        }
    } finally q.stop()
    val batch = SparkEntry.queries("r34_hist_quantiles")(spark, dir)
      .collect().map { r =>
        r.getAs[String]("grp") -> (r.getAs[Long]("n_total"),
          r.getAs[Long]("p50"), r.getAs[Long]("p90"), r.getAs[Long]("p99"))
      }.toMap
    assert(live == batch,
      "live snapshots must equal the registered batch query exactly")
  }

  test("merging is an elementwise sum: batch splitting is invisible") {
    val cfg = QHistConfig(lo = 0L, width = 7L, buckets = 100)
    val vals = (1 to 3000).map(i =>
      GroupedValue(s"g${i % 3}", (i * 2654435761L) % 800L))
    val one = snap(vals, cfg)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[GroupedValue]
    val q = StreamingQuantileHist.track(in.toDS(), cfg)
      .writeStream.format("memory").queryName("qhist_split")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val many = try {
      vals.grouped(137).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      spark.table("qhist_split").as[graft.streaming.QHistSnapshot]
        .collect().groupBy(_.group)
        .map { case (g, ss) =>
          val s = ss.maxBy(_.n_total); g -> (s.n_total, s.p50, s.p90, s.p99)
        }
    } finally q.stop()
    assert(one == many, "split folds must merge to the one-batch sketch")
  }

  test("no disorder contract: shuffled replay produces the same sketch") {
    val cfg = QHistConfig(lo = 0L, width = 5L, buckets = 50)
    val vals = (1 to 500).map(i => GroupedValue("g", (i * 37L) % 300L))
    assert(snap(vals, cfg) == snap(vals.reverse, cfg),
      "a histogram is a multiset statistic — order-free")
  }

  test("state is one row of buckets+2 longs per group, forever") {
    val cfg = QHistConfig(lo = 0L, width = 10L, buckets = 32)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[GroupedValue]
    val q = StreamingQuantileHist.track(in.toDS(), cfg)
      .writeStream.format("memory").queryName("qhist_state")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      (1 to 4).foreach { _ =>
        in.addData((1 to 1000).map(i =>
          GroupedValue(s"g${i % 2}", i.toLong)): _*)
        q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 2L, "one state row per group at any stream length")
    } finally q.stop()
  }
}
