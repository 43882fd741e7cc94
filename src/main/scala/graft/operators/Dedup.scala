package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ST1 — windowed deduplication, the reference's central operator
  * (reference: config/glassflow/deduplication_pipeline.json:44-49 — keep the
  * first occurrence per `id_field` within `time_window`; later duplicates
  * dropped; oracle: sink rows == unique generated,
  * src/pipeline_test.py:21-23).
  *
  * Batch forms (this file) + streaming form (graft.streaming.StreamingDedup,
  * `dropDuplicatesWithinWatermark`). All batch variants are single-shuffle:
  * one exchange on the key, then a per-partition sort or hash-agg — the plan
  * a 1000-executor cluster wants (state partitions by key; no driver
  * involvement; AQE can coalesce/split skewed partitions).
  */
object Dedup {

  /** Keep the first occurrence per key, globally (the window ≫ data horizon
    * case — the reference's actual regime: 8h window vs minutes of data).
    * Implemented as min_by over a deterministic (ts, tiebreak) struct: a
    * hash-aggregate with partial (map-side) combine — cheaper than a
    * row_number window, which cannot partial-aggregate.
    */
  def keepFirst(df: DataFrame, key: Seq[String], ts: Column,
                tiebreak: Column): DataFrame = {
    val ord = struct(ts, tiebreak)
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(key.map(col): _*)
      .agg(min_by(payload, ord).as("__first"))
      .select(df.columns.map(c => col(s"__first.$c")): _*)
  }

  /** Exact-duplicate elimination on a full row (training-data exact dedup). */
  def exact(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Tumbling-window dedup: keep the first occurrence per (key, window
    * bucket). The deterministic batch analog of "suppress duplicates within
    * time_window": duplicates landing in the same `windowMillis` bucket as
    * the original are dropped; a re-occurrence in a later bucket is kept as
    * new (matching GlassFlow's bounded dedup horizon).
    */
  def tumbling(df: DataFrame, key: Seq[String], ts: Column,
               windowMillis: Long, tiebreak: Column): DataFrame = {
    val bucket = floor(unix_millis(ts) / lit(windowMillis)).as("__bucket")
    val withBucket = df.withColumn("__bucket", bucket)
    keepFirst(withBucket, key :+ "__bucket", ts, tiebreak).drop("__bucket")
  }

  /** Keep-first via window-function ranking; used where the full ordered
    * ranking is also wanted (returns rank column when keepAll). Single
    * shuffle + sort per key.
    */
  def rankDuplicates(df: DataFrame, key: Seq[String], ts: Column,
                     tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(ts, tiebreak)
    df.withColumn("occurrence", row_number().over(w))
  }

  /** Skew-hardened keep-first: two-phase min_by. Phase 1 aggregates per
    * (key, salt) where salt = hash(tiebreak) mod `saltBuckets` — a hot key's
    * rows spread over `saltBuckets` reducers; phase 2 merges the per-salt
    * winners per key. min_by is associative, so the result is EXACTLY
    * keepFirst's (property-tested).
    *
    * Measured (stress skew arm, results/stress_latest.json + README):
    * [[keepFirst]] is itself nearly skew-immune — map-side partial combine
    * collapses a hot key to one row per upstream partition before the
    * shuffle, so at a 50%-hot-key 40M-row profile the salted form wins only
    * ~1.1×. Keep it for the regimes partial combine doesn't cover (very
    * wide agg buffers pressuring the per-task combine map under a hot key);
    * the plan that actually dies under skew is window RANKING
    * ([[rankDuplicates]]: 3.4× degradation at the same profile — one task
    * sorts the whole hot partition), which is why every keep-first path
    * here is min_by aggregation.
    */
  def keepFirstSalted(df: DataFrame, key: Seq[String], ts: Column,
                      tiebreak: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    val ord = struct(ts, tiebreak)
    val payload = struct(df.columns.map(col): _*)
    val salted = df
      .withColumn("__salt", pmod(hash(tiebreak), lit(saltBuckets)))
      .withColumn("__ord", ord)
    val phase1 = salted.groupBy((key.map(col) :+ col("__salt")): _*)
      .agg(min(col("__ord")).as("__o1"),
        min_by(payload, col("__ord")).as("__first"))
    phase1.groupBy(key.map(col): _*)
      .agg(min_by(col("__first"), col("__o1")).as("__first"))
      .select(df.columns.map(c => col(s"__first.$c")): _*)
  }
}
