package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config._
import graft.sources.ClickHouseSink
import graft.streaming.StreamingPipeline

/** Live ClickHouse smoke profile — runs only when `SPARK_GRAFT_CH_URL`
  * points at a reachable JDBC URL (e.g. `jdbc:clickhouse://host:8123/db`,
  * with a ClickHouse JDBC driver jar on the classpath); cancelled (not
  * failed) otherwise, so the offline suite stays green. Proves the pieces
  * the offline specs can only unit-test: real DDL execution, the batched
  * JDBC write path, and batchId-keyed replay suppression off-parquet
  * (reference live edge: src/utils/clickhouse.py:22-52).
  */
class LiveSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private val urlOpt = sys.env.get("SPARK_GRAFT_CH_URL")

  private def liveUrl(): String = {
    assume(urlOpt.isDefined, "SPARK_GRAFT_CH_URL not set — live sink smoke skipped")
    val url = urlOpt.get
    val hasDriver =
      try { java.sql.DriverManager.getDriver(url); true }
      catch { case _: java.sql.SQLException => false }
    assume(hasDriver, s"no JDBC driver registered for $url — add the driver jar")
    url
  }

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)

  private val cfg = PipelineConfig(
    pipelineId = "live_smoke",
    sourceSchema = Seq(SchemaField("event_id", "string")),
    dedup = DedupConfig(enabled = true, idField = "event_id",
      timeWindow = Duration.parse("1h")),
    join = None,
    sink = SinkConfig("graft_live_smoke", maxBatchSize = 500,
      maxDelayTime = Duration.parse("1s"),
      tableMapping = Seq(
        FieldMapping("event_id", "event_id", "string"),
        FieldMapping("payload", "val", "string"))))

  private def dropTables(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(s"DROP TABLE IF EXISTS `${cfg.sink.table}`")
      st.execute(s"DROP TABLE IF EXISTS `${cfg.sink.table}__epochs`")
      st.close()
    } finally conn.close()
  }

  private def countRows(url: String): Long =
    spark.read.format("jdbc").option("url", url)
      .option("dbtable", cfg.sink.table).load().count()

  test("DDL executes and the streaming pipeline lands deduped rows over JDBC") {
    val url = liveUrl()
    dropTables(url)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        ClickHouseSink.createTableDdl(cfg.sink, cfg.join))
    } finally conn.close()

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val checkpoint =
      java.nio.file.Files.createTempDirectory("graft_live_ck").toString
    val out = StreamingPipeline.transform(in.toDF(), cfg, "ts")
    val q = StreamingPipeline.sink(out, cfg, checkpoint) { (batch, batchId) =>
      ClickHouseSink.writeBatchIdempotent(batch, batchId, url, cfg.sink, cfg.join)
      ()
    }.start()
    try {
      // 6 events, 2 duplicates ⇒ 4 unique (the reference's exact-count oracle)
      in.addData(Ev("e1", t(0), "a"), Ev("e2", t(1), "b"), Ev("e1", t(2), "dup"))
      q.processAllAvailable()
      in.addData(Ev("e3", t(3), "c"), Ev("e2", t(4), "dup"), Ev("e4", t(5), "d"))
      q.processAllAvailable()
      assert(countRows(url) == 4L, "added_records == total_generated (unique)")
    } finally q.stop()
  }

  test("replayed batch ids write nothing (idempotent JDBC sink)") {
    val url = liveUrl()
    dropTables(url)
    val batch = Seq(("r1", "x"), ("r2", "y")).toDF("event_id", "val")
    assert(ClickHouseSink.writeBatchIdempotent(batch, 7L, url, cfg.sink, cfg.join))
    assert(!ClickHouseSink.writeBatchIdempotent(batch, 7L, url, cfg.sink, cfg.join),
      "same batchId must be suppressed")
    assert(countRows(url) == 2L, "replay must not duplicate rows")
    assert(ClickHouseSink.writeBatchIdempotent(batch, 8L, url, cfg.sink, cfg.join))
    assert(countRows(url) == 4L)
  }
}
