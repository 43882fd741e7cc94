package graft

import org.apache.spark.sql.functions._

import graft.config.{Duration, FieldMapping, SinkConfig}
import graft.mockjdbc.MockJdbc
import graft.sources.ClickHouseSink

/** S5 through a full in-JVM JDBC endpoint (MockJdbc): Spark's JDBC write
  * path — probe, CREATE TABLE with the MergeTree/ORDER BY
  * `createTableOptions`, prepared-INSERT batches flushed at `batchsize` —
  * and the batchId-keyed replay suppression, end-to-end with no server.
  * LiveSinkSpec remains the live ground truth when SPARK_GRAFT_CH_URL is
  * set; this pins the Spark-side mechanics offline.
  */
class MockSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private def sinkCfg(table: String, batch: Int) = SinkConfig(
    table = table,
    maxBatchSize = batch,
    maxDelayTime = Duration.parse("10s"),
    tableMapping = Seq(
      FieldMapping("event_id", "event_id", "uuid"),
      FieldMapping("user_id", "user_id", "string"),
      FieldMapping("n", "n", "long")))

  test("Spark JDBC write lands rows in MergeTree-optioned table, batched") {
    MockJdbc.ensureRegistered()
    val db = MockJdbc.reset("sink1")
    val cfg = sinkCfg("events_out", batch = 7)
    val rows = (1 to 23).map(i => (s"e$i", s"u${i % 3}", i.toLong))
    val df = rows.toDF("event_id", "user_id", "n")
      // single partition: batch flush sizes are then deterministic (7,7,7,2)
      .coalesce(1)

    ClickHouseSink.writeBatch(df, s"${MockJdbc.Prefix}sink1", cfg, None)

    // table created with the reference's engine clause from createTableOptions
    assert(db.ddl.exists(d => d.contains("events_out") &&
      d.contains("ENGINE = MergeTree()") && d.contains("ORDER BY (`event_id`)")),
      s"DDL missing MergeTree/ORDER BY clause: ${db.ddl}")
    // every row arrived, flushed at the configured batchsize
    assert(db.rows("events_out").size == 23)
    val flushes = db.batchFlushes.filter(_._1 == "events_out").map(_._2)
    assert(flushes.sum == 23, s"flushes: $flushes")
    assert(flushes.forall(_ <= 7), s"a flush exceeded batchsize: $flushes")
    assert(flushes.count(_ == 7) == 3, s"expected 3 full batches: $flushes")
  }

  test("batchId-keyed replay suppression writes a batch exactly once") {
    MockJdbc.ensureRegistered()
    val db = MockJdbc.reset("sink2")
    val cfg = sinkCfg("dedup_out", batch = 100)
    val df = Seq(("a", "u1", 1L), ("b", "u2", 2L)).toDF("event_id", "user_id", "n")

    val url = s"${MockJdbc.Prefix}sink2"
    assert(ClickHouseSink.writeBatchIdempotent(df, 42L, url, cfg, None),
      "first delivery must write")
    assert(db.rows("dedup_out").size == 2)
    assert(db.rows("dedup_out__epochs").size == 1, "epoch marker recorded")

    assert(!ClickHouseSink.writeBatchIdempotent(df, 42L, url, cfg, None),
      "replayed batchId must be suppressed")
    assert(db.rows("dedup_out").size == 2, "replay wrote rows")

    assert(ClickHouseSink.writeBatchIdempotent(df, 43L, url, cfg, None),
      "a NEW batchId writes")
    assert(db.rows("dedup_out").size == 4)
    assert(db.rows("dedup_out__epochs").size == 2)
  }

  test("streaming foreachBatch into the mock endpoint delivers every row once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    MockJdbc.ensureRegistered()
    val db = MockJdbc.reset("sink3")
    val cfg = sinkCfg("stream_out", batch = 50)
    val url = s"${MockJdbc.Prefix}sink3"

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, String, Long)]
    val q = src.toDF().toDF("event_id", "user_id", "n")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_mocksink").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        ClickHouseSink.writeBatchIdempotent(b, id, url, cfg, None); ()
      }
      .start()
    try {
      src.addData(("x", "u1", 1L), ("y", "u2", 2L))
      q.processAllAvailable()
      src.addData(("z", "u3", 3L))
      q.processAllAvailable()
    } finally q.stop()

    assert(db.rows("stream_out").size == 3,
      s"rows: ${db.rows("stream_out")}")
    assert(db.rows("stream_out__epochs").size == 2, "one epoch marker per batch")
  }
}
