package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation entering the quantile tracker: `group` is the scope
  * (e.g. event type), `v` the value ALREADY quantized to the sketch's
  * integer domain (cents, micros, bytes — quantization happens in
  * codegen via [[StreamingQuantileHist.grouped]], so the JVM fold only
  * increments counters).
  */
case class GroupedValue(group: String, v: Long)

/** Fixed-resolution integer-bucket histogram geometry: `buckets` equal
  * `width`-wide buckets covering [lo, lo + buckets·width), plus an
  * underflow bucket (index 0, values < lo) and an overflow bucket
  * (index buckets+1). Pure integer arithmetic end to end — the reason
  * the sketch is BIT-EXACT across engines where KLL/t-digest are only
  * approximately reproducible.
  */
case class QHistConfig(lo: Long, width: Long, buckets: Int) {
  require(width > 0, "bucket width must be positive")
  require(buckets >= 1, "need at least one bucket")

  /** Bucket index of a value: 0 underflow, 1..buckets in-range,
    * buckets+1 overflow.
    */
  def bucketOf(v: Long): Int =
    if (v < lo) 0
    else {
      val i = (v - lo) / width
      if (i >= buckets) buckets + 1 else (i + 1).toInt
    }

  /** The reported quantile value for a bucket — its exclusive upper
    * bound (`lo` for underflow, Long.MaxValue for overflow): a
    * deterministic conservative rounding, never below the true
    * quantile and at most one bucket width above it.
    */
  def upperBound(i: Int): Long =
    if (i <= 0) lo
    else if (i > buckets) Long.MaxValue
    else lo + i.toLong * width
}

/** Per-group sketch state: one counter per bucket (buckets + 2 longs,
  * fixed at configuration time — state size is independent of stream
  * length, cardinality, or value distribution).
  */
case class QHistState(counts: Array[Long])

/** One per-batch quantile report for `group`: the p50/p90/p99 bucket
  * upper bounds after `n_total` observations. Consumers keep the row
  * with the largest n_total per group (the [[StreamingTopK]]
  * supersession rule).
  */
case class QHistSnapshot(group: String, n_total: Long,
                         p50: Long, p90: Long, p99: Long)

/** Streaming mergeable quantile sketch — r05's exact-percentile shape
  * LIVE via flatMapGroupsWithState, as a fixed-resolution integer-bucket
  * histogram (chosen over KLL deliberately: same determinism stance as
  * [[StreamingKMV]] — every quantity here is integer arithmetic, so the
  * batch twin, the live fold, and any other engine agree BIT-FOR-BIT,
  * where sampling-based sketches agree only in distribution).
  *
  * The estimator: count observations per bucket; the p-th percentile is
  * the upper bound of the first bucket where the cumulative count
  * reaches rank = ⌈n·p/100⌉ (computed as (n·p + 99) div 100 — integer
  * ceiling, no floats anywhere). The report is conservative within one
  * bucket width — the resolution/state trade the `buckets` knob sets,
  * exactly like a production latency histogram.
  *
  * MERGEABLE: the sketch of a union is the elementwise SUM of the
  * bucket arrays — the per-batch fold this operator runs, the reason
  * one sketch per shuffle partition composes at 100 TB, and the reason
  * batch splitting is invisible (pinned by StreamingQuantileHistSpec).
  *
  * Agreement: [[batchQuantiles]] is the same geometry and rank rule as
  * a declarative DataFrame pass (bucket → count → running sum → first
  * crossing); the spec requires snapshot == batch EQUAL on shared rows.
  * Disorder contract: NONE — a histogram is a multiset statistic, so
  * like the KMV sketch (and unlike every sequence operator here) late
  * or reordered data folds in identically.
  *
  * Scale shape: ONE stateful stage keyed by group, state buckets+2
  * longs per group forever, per-batch fold one array increment per
  * observation. Nothing to watermark — the sketch never grows.
  */
object StreamingQuantileHist extends Serializable {

  /** Project a raw frame into the tracker's typed input; `valueCol`
    * must already be integral (quantize in the caller's codegen —
    * e.g. `round(value * 100)` for cents).
    */
  def grouped(df: DataFrame, groupCol: Column, valueCol: Column)
    : Dataset[GroupedValue] = {
    implicit val enc: Encoder[GroupedValue] = Encoders.product[GroupedValue]
    df.select(groupCol.cast("string").as("group"),
        valueCol.cast("long").as("v"))
      .as[GroupedValue]
  }

  /** Integer-exact percentile rank: ⌈n·p/100⌉. */
  private def rankOf(n: Long, p: Int): Long = (n * p + 99) / 100

  /** The p-th percentile of a bucket-count array under `cfg` — the
    * upper bound of the first cumulative crossing.
    */
  def quantileOf(cfg: QHistConfig, counts: Array[Long], n: Long,
                 p: Int): Long = {
    val rank = rankOf(n, p)
    var cum = 0L
    var i = 0
    while (i < counts.length) {
      cum += counts(i)
      if (cum >= rank) return cfg.upperBound(i)
      i += 1
    }
    Long.MaxValue // n == 0 only; callers snapshot after folding >= 1 row
  }

  /** The stateful stage: per group, add the batch's observations into
    * the bucket counters and emit one snapshot per group per
    * micro-batch.
    */
  def track(events: Dataset[GroupedValue], cfg: QHistConfig)
    : Dataset[QHistSnapshot] = {
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stEnc: Encoder[QHistState] = Encoders.product[QHistState]
    implicit val outEnc: Encoder[QHistSnapshot] =
      Encoders.product[QHistSnapshot]

    // order-free slice fold (bucket increments commute) on the sketch
    // family's shared core — one pass over the iterator, no sort
    val sketch = new SketchEngine.Sketch[String, GroupedValue, QHistState,
      QHistSnapshot] {
      override def init: QHistState =
        QHistState(new Array[Long](cfg.buckets + 2))
      override def onSlice(group: String, evs: Iterator[GroupedValue],
                           st: QHistState, wmMs: Long,
                           out: scala.collection.mutable.ArrayBuffer[QHistSnapshot])
        : SketchEngine.Next[QHistState] = {
        val counts = st.counts
        evs.foreach { e => counts(cfg.bucketOf(e.v)) += 1L }
        var n = 0L
        var i = 0
        while (i < counts.length) { n += counts(i); i += 1 }
        out += QHistSnapshot(group, n,
          quantileOf(cfg, counts, n, 50),
          quantileOf(cfg, counts, n, 90),
          quantileOf(cfg, counts, n, 99))
        SketchEngine.Update(QHistState(counts))
      }
    }
    SketchEngine.run(events, (_: GroupedValue).group, sketch,
      expiring = false)
  }

  /** The latest snapshot per group of a collected snapshot stream — the
    * n_total-max row, the [[StreamingTopK]] supersession rule.
    */
  def latest(snapshots: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    snapshots
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("group")).orderBy(col("n_total").desc)))
      .filter(col("_rk") === 1).drop("_rk")
  }

  /** The batch twin — identical geometry, identical rank rule, as one
    * declarative pass (bucket expression → per-bucket counts → running
    * sum over bucket order → first crossing per percentile). Used by
    * the agreement spec and by r34's registered query; the plan is a
    * map-side-combined count on the (group, bucket) key — at most
    * groups × (buckets + 2) rows ever shuffle — plus a window over that
    * tiny frame.
    */
  def batchQuantiles(df: DataFrame, group: String, value: String,
                     cfg: QHistConfig): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = cfg.buckets
    val bucket = expr(
      s"""CASE WHEN $value < ${cfg.lo} THEN 0
         |  WHEN (($value - ${cfg.lo}) DIV ${cfg.width}) >= $b THEN ${b + 1}
         |  ELSE (($value - ${cfg.lo}) DIV ${cfg.width}) + 1 END""".stripMargin)
    // Long-typed literals + a BIGINT cast on bucket: with int-sized lo/width
    // the bare interpolation would evaluate `bucket * width` in 32-bit
    // arithmetic and silently wrap (non-ANSI Spark) past 2^31, diverging
    // from the streaming twin's `lo + i.toLong * width`.
    val ub = expr(
      s"""CASE WHEN bucket <= 0 THEN ${cfg.lo}L
         |  WHEN bucket > $b THEN ${Long.MaxValue}L
         |  ELSE ${cfg.lo}L + CAST(bucket AS BIGINT) * ${cfg.width}L END"""
        .stripMargin)
    val wAll = Window.partitionBy(col(group))
    val wCum = wAll.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0L)
    def rank(p: Int) = expr(s"(n_total * $p + 99) DIV 100")
    def at(p: Int) =
      min(when(col("cum") >= rank(p), ub)).as(s"p$p")
    df.groupBy(col(group), bucket.cast("int").as("bucket"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_total", sum(col("c")).over(wAll))
      .groupBy(col(group))
      .agg(max(col("n_total")).as("n_total"), at(50), at(90), at(99))
  }
}
