package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S2 — duplicate injector.
  *
  * The reference re-emits a fraction of events keyed by `key_field` within the
  * dedup window; arithmetic: unique = sent/(1+ratio), duplicates =
  * unique*ratio (reference: src/generate_events.py:31-43, verified against
  * results/19_05_001_results.csv:2).
  *
  * Two modes:
  *  - `injectEveryK`: fully deterministic — re-emit every k-th row (ratio =
  *    1/k). Used by oracle-checked queries since any SQL engine reproduces it.
  *  - `injectSampled`: seeded Bernoulli sample, the production analog of the
  *    reference's random re-emission. Same distributed shape: a union of the
  *    original scan with a sampled scan — no shuffle, no driver involvement,
  *    scales linearly with input splits.
  */
object DuplicateInjector {

  /** Re-emit rows where rowId % k == 0. Exact ratio 1/k. */
  def injectEveryK(df: DataFrame, rowId: Column, k: Int): DataFrame =
    df.unionAll(df.where(pmod(rowId, lit(k)) === 0))

  /** Re-emit a ~`ratio` Bernoulli sample (seeded, without replacement). */
  def injectSampled(df: DataFrame, ratio: Double, seed: Long): DataFrame =
    df.unionAll(df.sample(withReplacement = false, ratio, seed))

  /** Reference arithmetic helpers (src/generate_events.py:31-39). */
  def uniqueOf(sent: Long, ratio: Double): Long = (sent / (1 + ratio)).toLong
  def duplicatesOf(sent: Long, ratio: Double): Long =
    sent - uniqueOf(sent, ratio)
}
