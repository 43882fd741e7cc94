package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.config.PipelineConfig
import graft.operators.{EventGenerator, MappingProjection}

/** The reference pipeline, streaming form:
  *
  *   source (rate/Kafka/memory) → windowed dedup (ST1) → optional temporal
  *   join (J1) → mapping projection (P1) → batched sink (S5).
  *
  * Mirrors the GlassFlow engine's configured dataflow
  * (reference: config/glassflow/deduplication_pipeline.json) with Spark
  * Structured Streaming. The sink's two flush knobs map exactly:
  * `max_delay_time` → `Trigger.ProcessingTime` (micro-batch cadence);
  * `max_batch_size` → sink writer batch size (JDBC `batchsize` for
  * ClickHouse, row-group sizing for files).
  */
object StreamingPipeline {

  /** S1 streaming form — rate-limited synthetic event stream: the `rate`
    * source emits (timestamp, value) at `rps` rows/sec; the generator's
    * deterministic template expressions turn `value` into the reference's
    * event fields (reference producer rate cap: src/utils/publish.py:13).
    */
  def rateSource(spark: SparkSession, rps: Long, seed: Long = 42L): DataFrame = {
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rps.toString).load()
    val id = col("value")
    base.select(
      EventGenerator.uuidCol(id, seed, "eid").as("event_id"),
      EventGenerator.uuidCol(id, seed, "uid").as("user_id"),
      date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss").as("created_at"),
      col("timestamp").as("ts"))
  }

  /** Apply the configured transform chain to a streaming event DataFrame
    * carrying an event-time column `tsCol`. When the config enables the
    * temporal join (J1) and a right-side stream is supplied, deduped events
    * join it on `joinKey` within ±`timeWindow` (the GlassFlow joined-
    * pipeline dataflow; the reference's benchmark config ships it disabled,
    * deduplication_pipeline.json join.enabled=false). The right stream must
    * carry the join key and an event-time column `rightTsCol`, with
    * non-key columns already named for the sink mapping.
    */
  def transform(events: DataFrame, cfg: PipelineConfig, tsCol: String,
                rightSource: Option[DataFrame] = None,
                rightTsCol: String = "r_ts"): DataFrame = {
    val deduped =
      if (cfg.dedup.enabled)
        StreamingDedup.withinWatermark(events, Seq(cfg.dedup.idField), tsCol,
          cfg.dedup.timeWindow)
      else events
    val joined = (cfg.join, rightSource) match {
      case (Some(j), Some(right)) if j.enabled =>
        // dedup already watermarked the left side; don't redefine it
        TemporalJoin.stream(deduped, right,
            j.joinKey, s"r_${j.joinKey}", tsCol, rightTsCol, j.timeWindow,
            watermarkLeft = !cfg.dedup.enabled)
          .drop(s"r_${j.joinKey}", rightTsCol)
      case _ => deduped
    }
    MappingProjection(joined, cfg.sink.tableMapping)
  }

  /** Wire the sink: micro-batch cadence from `max_delay_time`, per-batch
    * write via `foreachBatch` (the hook where a JDBC/ClickHouse writer with
    * `batchsize = max_batch_size` plugs in — graft.sources.ClickHouseSink).
    */
  def sink(out: DataFrame, cfg: PipelineConfig, checkpointDir: String)
          (writeBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    out.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(cfg.sink.maxDelayTime.millis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId)
      }

  /** End-to-end: events → transform → idempotent parquet sink (the offline
    * stand-in for ClickHouse; the oracle needs exact row counts, reference:
    * src/pipeline_test.py:21-23, so replayed micro-batches must write
    * nothing — see IdempotentParquetSink). Returns the started query.
    */
  def start(events: DataFrame, cfg: PipelineConfig, tsCol: String,
            sinkDir: String, checkpointDir: String): StreamingQuery = {
    val idempotent = new graft.sources.IdempotentParquetSink(sinkDir)
    sink(transform(events, cfg, tsCol), cfg, checkpointDir) { (batch, batchId) =>
      idempotent.writeBatch(batch, batchId)
    }.start()
  }
}
