package graft

import org.apache.spark.sql.streaming.Trigger

import graft.config._
import graft.sources.IdempotentParquetSink
import graft.streaming.{StreamingDedup, StreamingPipeline}

/** Streaming-mode throughput: rate source at `SPARK_GRAFT_STREAM_RPS`
  * (default 1M rows/s offered) → windowed dedup → mapping projection →
  * idempotent parquet sink, run for `SPARK_GRAFT_STREAM_SECS` (default 30 s)
  * of processing. Prints one JSON line with sustained rows/sec — directly
  * comparable to BASELINE.md's glassflow_rps (8,018–9,429), which measures
  * the same shape: Kafka-source dedup ETL sustained rate.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rps = sys.env.getOrElse("SPARK_GRAFT_STREAM_RPS", "1000000").toLong
    val secs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "30").toInt
    val spark = GraftSession.local("graft-stream-bench")
    // State-store provider knob. The SESSION default is already RocksDB
    // (GraftSession — dedup state on local disk, the provider an 8h/100 TB
    // window needs: state = O(distinct keys in window), not bounded by
    // executor heap). SPARK_GRAFT_STATE_STORE=hdfs overrides to Spark's
    // stock heap-backed provider for an apples-to-apples throughput
    // comparison; the choice is recorded in the JSON.
    val stateStore = sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "rocksdb")
    if (stateStore.equalsIgnoreCase("hdfs"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_sb_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sb_ckpt").toString

    val events = StreamingPipeline.rateSource(spark, rps)
    val deduped = StreamingDedup.withinWatermark(events, Seq("event_id"), "ts",
      Duration.parse("8h"))
    val projected = graft.operators.MappingProjection(deduped, Seq(
      FieldMapping("event_id", "event_id", "uuid"),
      FieldMapping("user_id", "user_id", "uuid"),
      FieldMapping("created_at", "created_at", "datetime")))
    val sink = new IdempotentParquetSink(sinkDir)
    val q = projected.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(1000))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.writeBatch(b, id); ()
      }
      .start()

    // fixed-duration measurement: stop after the window (processAllAvailable
    // would chase a live rate source forever when offered > sustained)
    val t0 = System.nanoTime()
    Thread.sleep(secs * 1000L)
    q.stop()
    val elapsed = (System.nanoTime() - t0) / 1e9
    q.recentProgress.takeRight(3).foreach(p => System.err.println(
      s"[streambench] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durMs=${p.batchDuration}"))
    val sunk = sink.read(spark).count()
    val sustained = math.round(sunk / elapsed)
    println(s"""{"metric":"stream_rps","value":$sustained,"unit":"rows/sec","rows":$sunk,"elapsed_sec":$elapsed,"offered_rps":$rps,"state_store":"${stateStore.toLowerCase}"}""")
    spark.stop()
  }
}
