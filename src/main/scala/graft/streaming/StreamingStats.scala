package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One value event entering the running-moments detector. `vq` is the
  * value quantized to integer cents (round(value × 100)) — the exact-sum
  * convention every moments query in the repo uses (r03/r10/r14).
  */
case class ValueEvent(event_id: Long, ts: Timestamp, event_type: String,
                      vq: Long)

/** Per-key running-moment state: event count and EXACT integer power sums
  * of the quantized values seen so far. Three longs per key — state size
  * is O(1) in stream length. (Σvq² grows as n·vq²: with |vq| ≤ 5e4 cents
  * the long holds ~3.7e9 events per key; a longer-lived deployment rolls
  * the epoch or widens to a 128-bit sum, both state-shape-preserving.)
  */
case class MomentState(n: Long, s1: Long, s2: Long)

/** Per-event verdict: the z-score of the value against the distribution of
  * the STRICTLY PRECEDING events of its type (so a verdict never depends
  * on the event itself), and the anomaly flag. `n_before` is that
  * preceding count; z is reported only when `n_before ≥ minN` and the
  * variance is positive (else 0 and not anomalous).
  */
case class ValueVerdict(event_id: Long, ts: Timestamp, event_type: String,
                        vq: Long, n_before: Long, zscore: Double,
                        anomalous: Boolean)

/** Streaming anomaly detection over the event value stream — the online
  * drift/outlier monitor of an ingestion pipeline: every arriving event is
  * scored against the running mean/stddev of everything its type has seen
  * BEFORE it, one pass, `flatMapGroupsWithState` keyed by event type.
  *
  * The state is three integers (count + exact power sums), so unlike the
  * windowed dedup operators there is nothing to lapse: state is O(1) per
  * key forever, and the operator never re-reads history. Within a
  * micro-batch events are processed in (ts, event_id) order, so the
  * verdict stream is exactly the batch cumulative-window computation
  * ([[batchZScores]]) applied to the same events — pinned by
  * StreamingStatsSpec's batch==streaming agreement case, and the batch
  * form is oracle-checked end-to-end as query r15.
  *
  * Scale note: running moments are inherently sequential PER KEY, so the
  * stateful stage's parallelism is the key cardinality. event_type has 5
  * values in the test corpus; a 100 TB deployment shards the key into
  * (type, epoch) — the integer sums merge associatively across epochs —
  * which this operator supports by keying on whatever column the caller
  * passes. No other shape survives the semantics (a per-row window over
  * the full history would sort the stream; this is one O(1) fold).
  */
object StreamingStats {

  /** Minimum preceding-sample count before a z-score is trusted. */
  val DefaultMinN = 30

  /** Project a raw events frame into the detector's typed input. */
  def valueEvents(events: DataFrame, idCol: Column, tsCol: Column,
                  typeCol: Column, valueCol: Column): Dataset[ValueEvent] = {
    implicit val enc: Encoder[ValueEvent] = Encoders.product[ValueEvent]
    events.select(idCol.as("event_id"), tsCol.as("ts"),
        typeCol.as("event_type"),
        round(valueCol.cast("double") * 100).cast("long").as("vq"))
      .as[ValueEvent]
  }

  /** z of `vq` against exact preceding sums — shared by the streaming fold
    * and the agreement spec's expectations. Deterministic: one expression
    * tree over exact integers, mirrored in r15's SQL.
    */
  def zOf(vq: Long, n: Long, s1: Long, s2: Long): Double = {
    val nd = n.toDouble
    val mean = s1.toDouble / nd
    val variance = s2.toDouble / nd - mean * mean
    if (variance > 0) (vq.toDouble - mean) / math.sqrt(variance) else 0.0
  }

  /** The stateful scoring stage. `zThreshold` flags |z| ≥ threshold;
    * `streaming = false` runs the identical group function over a batch
    * Dataset (NoTimeout), which is what the agreement spec pins.
    */
  def score(events: Dataset[ValueEvent], minN: Int = DefaultMinN,
            zThreshold: Double = 3.0, streaming: Boolean = true)
    : Dataset[ValueVerdict] = {
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stEnc: Encoder[MomentState] = Encoders.product[MomentState]
    implicit val outEnc: Encoder[ValueVerdict] = Encoders.product[ValueVerdict]

    // per-event verdicts need the family's (ts, event_id) order (each
    // row is judged against the moments STRICTLY before it), so this
    // sketch sorts its slice; the moments themselves are primitives —
    // no per-event state allocation beyond the verdict row
    val sketch = new SketchEngine.Sketch[String, ValueEvent, MomentState,
      ValueVerdict] {
      override def init: MomentState = MomentState(0L, 0L, 0L)
      override def onSlice(key: String, evs: Iterator[ValueEvent],
                           st0: MomentState, wmMs: Long,
                           out: scala.collection.mutable.ArrayBuffer[ValueVerdict])
        : SketchEngine.Next[MomentState] = {
        val seq = evs.toSeq
        val sorted =
          if (seq.lengthCompare(2) < 0) seq
          else seq.sortBy(e => (e.ts.getTime, e.event_id))
        var n = st0.n
        var s1 = st0.s1
        var s2 = st0.s2
        sorted.foreach { e =>
          val z = if (n >= minN) zOf(e.vq, n, s1, s2) else 0.0
          val flagged = n >= minN && math.abs(z) >= zThreshold
          out += ValueVerdict(e.event_id, e.ts, key, e.vq, n, z, flagged)
          n += 1
          s1 += e.vq
          s2 += e.vq * e.vq
        }
        SketchEngine.Update(MomentState(n, s1, s2))
      }
    }
    SketchEngine.run(events, (_: ValueEvent).event_type, sketch,
      expiring = false)
  }

  /** The batch equivalent: cumulative strictly-preceding window sums per
    * type — same exact integer sums, same z expression. This IS query r15's
    * plan; the agreement spec runs [[score]] over micro-batches and
    * compares row-for-row.
    */
  def batchZScores(events: DataFrame, idCol: Column, tsCol: Column,
                   typeCol: Column, valueCol: Column,
                   minN: Int = DefaultMinN, zThreshold: Double = 3.0)
    : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = events.select(idCol.as("event_id"), tsCol.as("ts"),
      typeCol.as("event_type"),
      round(valueCol.cast("double") * 100).cast("long").as("vq"))
    // ANSI mode raises on /0 and common-subexpression elimination hoists
    // the division out of the `when` branch, so the denominator must be
    // made safe unconditionally; rows with n_before < minN never read z,
    // and for scored rows (n_before >= minN >= 1) this IS n_before.
    val nd = when(col("n_before") > 0, col("n_before").cast("double"))
      .otherwise(lit(1.0))
    val mean = col("s1").cast("double") / nd
    val variance = col("s2").cast("double") / nd - mean * mean
    val z = when(col("n_before") >= minN && variance > 0,
      (col("vq").cast("double") - mean) / sqrt(variance)).otherwise(0.0)
    base
      .withColumn("n_before", count(lit(1)).over(w))
      .withColumn("s1", coalesce(sum(col("vq")).over(w), lit(0L)))
      .withColumn("s2", coalesce(sum(col("vq") * col("vq")).over(w), lit(0L)))
      .select(col("event_id"), col("ts"), col("event_type"), col("vq"),
        col("n_before"), z.as("zscore"),
        (col("n_before") >= minN && abs(z) >= zThreshold).as("anomalous"))
  }
}
