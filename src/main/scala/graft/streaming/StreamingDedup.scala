package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.config.Duration

/** Dedup state per key: epoch millis of the first occurrence that opened the
  * current suppression window. Top-level so Catalyst can codegen its encoder.
  */
case class FirstSeen(openedAt: Long)

/** ST1 — windowed deduplication, streaming form.
  *
  * The reference's central operator: keep the first occurrence per id field
  * within `time_window`; later duplicates dropped (reference:
  * config/glassflow/deduplication_pipeline.json:44-49; oracle "sink rows ==
  * unique generated": src/pipeline_test.py:21-23).
  *
  * Two implementations, by fidelity/performance trade-off:
  *
  *  1. `withinWatermark` — Spark-native `dropDuplicatesWithinWatermark`:
  *     state per key, evicted by watermark delay. Scales to 100 TB streams:
  *     state is hash-partitioned by key across executors, RocksDB-backed
  *     when `spark.sql.streaming.stateStore.providerClass` is set (see
  *     `GraftSession`), and map-side nothing — dedup state ops are O(1) per
  *     row. This is the production path.
  *
  *  2. `keepFirstStateful` — exact GlassFlow semantics ("suppress duplicates
  *     seen within `time_window` of the FIRST occurrence; a re-occurrence
  *     after the window is treated as new") via `flatMapGroupsWithState`
  *     with event-time timeout. The two agree whenever window ≫ stream
  *     horizon (the reference's regime: 8h window, minutes of data) —
  *     SURVEY.md §7.4 pins this with a property test.
  */
object StreamingDedup {

  /** Production path: watermarked drop-duplicates. `df` must carry an
    * event-time column `tsCol` (e.g. the Kafka message timestamp — the
    * reference stamps LogAppendTime, src/utils/kafka.py:46-48).
    */
  def withinWatermark(df: DataFrame, idCols: Seq[String], tsCol: String,
                      window: Duration): DataFrame =
    df.withWatermark(tsCol, window.asSparkInterval)
      .dropDuplicatesWithinWatermark(idCols)

  /** Exact GlassFlow window semantics, generic over the event type.
    *
    * Per key: the first event opens a window `[t0, t0 + window)`; events with
    * ts inside it are suppressed; an event at ts ≥ t0 + window is emitted as
    * new and re-opens the window. State is evicted by event-time timeout once
    * the watermark passes the window end — state size is O(distinct keys in
    * window), partitioned by key (no driver state), exactly the bound the
    * reference's engine maintains.
    *
    * Pass `streaming = false` for the batch path (whole group arrives in one
    * invocation; event-time timeouts don't exist without a watermark, so the
    * batch form runs with NoTimeout) — used by the batch-vs-streaming
    * agreement test.
    */
  def keepFirstStateful[T](ds: Dataset[T], key: T => String, ts: T => Timestamp,
                           window: Duration, streaming: Boolean = true)
                          (implicit et: Encoder[T]): Dataset[T] = {
    implicit val stateEnc: Encoder[FirstSeen] = Encoders.product[FirstSeen]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val windowMs = window.millis

    // Eviction note (now owned by SketchEngine): the timeout lands once
    // the watermark passes the window end, clamped to watermark+1 — with
    // EventTimeTimeout Spark filters rows behind the watermark before
    // they reach the fold (StreamingSpec pins that), but a row landing
    // exactly ON the boundary can still yield opened + windowMs <=
    // watermark, and setTimeoutTimestamp throws on a timeout <= the
    // current watermark.
    val sketch = new SketchEngine.Sketch[String, T, FirstSeen, T] {
      override def init: FirstSeen = FirstSeen(Long.MinValue)
      override def onSlice(k: String, events: Iterator[T], st: FirstSeen,
                           wmMs: Long,
                           out: scala.collection.mutable.ArrayBuffer[T])
        : SketchEngine.Next[FirstSeen] = {
        val sorted = events.toSeq.sortBy(e => ts(e).getTime)
        var opened = st.openedAt
        sorted.foreach { e =>
          val t = ts(e).getTime
          if (opened == Long.MinValue || t >= opened + windowMs) {
            out += e
            opened = t
          } // else: inside the window of the current first — suppress
        }
        if (opened != Long.MinValue) SketchEngine.Update(FirstSeen(opened))
        else SketchEngine.Unchanged
      }
      override def horizonMs(st: FirstSeen): Long = st.openedAt + windowMs
    }
    SketchEngine.run(ds, key, sketch, expiring = streaming)
  }
}
