package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.Duration

/** J1 — temporal (windowed) stream-stream join.
  *
  * The reference declares a two-topic join on per-source `join_key` within a
  * time window (reference: config/glassflow/deduplication_pipeline.json:53-55
  * — shipped disabled; src/pre_process.py:9-12 reads the join key for the
  * sink ORDER BY). Spark-native form: both sides watermarked, equi-key plus
  * a time-bound range predicate, so the state store can evict rows once the
  * watermark passes the tolerance — bounded state at any scale.
  *
  * The equi-key conjunct makes this a shuffled (hash-partitioned) join on
  * `key` with a range filter inside each key partition — never a cartesian.
  */
object TemporalJoin {

  /** Streaming inner join: rows match when keys are equal and
    * |left.ts - right.ts| <= tolerance. Both inputs must be streaming
    * DataFrames with event-time columns `leftTs`/`rightTs`.
    *
    * Column names of `left` and `right` must be disjoint (project/alias
    * upstream — the reference does the same via table_mapping renames).
    *
    * Pass `watermarkLeft = false` when the left side already carries a
    * watermark from an upstream stateful operator (e.g. windowed dedup) —
    * Spark disallows redefining a watermark downstream of stateful state,
    * and the upstream delay then governs join-state eviction.
    */
  def stream(left: DataFrame, right: DataFrame,
             leftKey: String, rightKey: String,
             leftTs: String, rightTs: String,
             tolerance: Duration, watermarkLeft: Boolean = true): DataFrame = {
    val l =
      if (watermarkLeft) left.withWatermark(leftTs, tolerance.asSparkInterval)
      else left
    val r = right.withWatermark(rightTs, tolerance.asSparkInterval)
    val ms = tolerance.millis
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $ms MILLISECONDS") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $ms MILLISECONDS"))
  }

  /** Streaming LEFT OUTER temporal join: like [[stream]], but left rows
    * that find no partner within the tolerance are still emitted (with
    * null right columns) once the watermark passes `left.ts + tolerance` —
    * i.e. once it is provable no matching right row can still arrive. The
    * enrichment-join shape (events × maybe-present context) where losing
    * unmatched facts is wrong. Spark requires BOTH watermarks plus the
    * time-range conjunct for outer stream-stream joins — exactly what this
    * builds — so join state stays watermark-bounded like the inner form.
    *
    * Note the delivery caveat inherited from micro-batching: null-padded
    * rows for expired left state flush on the NEXT micro-batch after the
    * watermark advances (a trailing empty batch in tests; a heartbeat in
    * production).
    */
  def streamOuter(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTs: String, rightTs: String,
                  tolerance: Duration): DataFrame = {
    val l = left.withWatermark(leftTs, tolerance.asSparkInterval)
    val r = right.withWatermark(rightTs, tolerance.asSparkInterval)
    val ms = tolerance.millis
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $ms MILLISECONDS") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $ms MILLISECONDS"),
      "left_outer")
  }

  /** Batch analog with identical match semantics (used for oracle checks and
    * the batch path). Same plan shape: shuffle on key, range filter in the
    * joined partition. Timestamp interval arithmetic (µs-exact) — never
    * truncated to millis, so boundary rows agree with any SQL oracle.
    */
  def batch(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTs: Column, rightTs: Column,
            tolerance: Duration): DataFrame = {
    val iv = expr(s"INTERVAL ${tolerance.millis} MILLISECONDS")
    left.join(right,
      col(leftKey) === col(rightKey) &&
        rightTs >= leftTs - iv && rightTs <= leftTs + iv)
  }

  /** As-of join (batch): for each left row, the single latest right row with
    * the same key and right.ts <= left.ts (within `tolerance`). Composed from
    * built-ins: temporal-join candidates → max_by per left row — two
    * shuffles, both on the join key, so AQE can pipeline them.
    *
    * `rightTiebreak` makes the pick total when right rows share a timestamp
    * (max_by over the (ts, tiebreak) struct — lexicographic, like the
    * equivalent ROW_NUMBER ordering in SQL).
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: Column, rightTs: Column,
           tolerance: Duration, rightTiebreak: Column = lit(0L)): DataFrame = {
    val iv = expr(s"INTERVAL ${tolerance.millis} MILLISECONDS")
    val joined = left.join(right,
      col(leftKey) === col(rightKey) &&
        rightTs <= leftTs && rightTs >= leftTs - iv)
    val leftCols = left.columns.map(col)
    val rightPayload = struct(right.columns.map(col): _*)
    joined.groupBy(leftCols: _*)
      .agg(max_by(rightPayload, struct(rightTs, rightTiebreak)).as("__asof"))
      .select(leftCols ++ right.columns.map(c => col(s"__asof.$c")): _*)
  }
}
