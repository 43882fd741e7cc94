package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One pre-hashed observation entering the cardinality tracker: `group`
  * is the counting scope (e.g. event type, or a constant for a global
  * count), `h` the 60-bit md5 prefix of the counted value (first 15 hex
  * digits parsed base-16) — hashing AND prefix-folding happen in codegen
  * BEFORE the stateful stage ([[StreamingKMV.keyedHashes]]), so the JVM
  * fold only ever compares longs.
  */
case class KeyedHash(group: String, h: Long)

/** KMV synopsis for one group: the ≤ k smallest 60-bit hash prefixes
  * seen (sorted ascending) and the total observations folded. State is
  * O(k) per group REGARDLESS of stream length or true cardinality — 64
  * longs (512 bytes of payload) where an exact distinct-count needs the
  * whole key set, a Bloom filter needs bits proportional to the expected
  * population, and the former hex-string synopsis paid ~10× this in
  * string + store overhead.
  */
case class KmvState(hashes: Seq[Long], n_total: Long)

/** One per-batch cardinality report for `group`: the estimate after
  * `n_total` observations. While fewer than k distinct prefixes have been
  * seen the synopsis IS the distinct set and `est_distinct` is exact
  * (`kth_frac` = -1 marks that regime); past k it is (k-1)/kth_frac.
  */
case class KmvSnapshot(group: String, n_total: Long, n_tracked: Long,
                       kth_frac: Double, est_distinct: Double)

/** Streaming KMV distinct-count — r13's k-minimum-values sketch LIVE via
  * flatMapGroupsWithState: the online cardinality monitor ("how many
  * distinct users/events/documents has this stream carried?") that an
  * exact `approx_count_distinct`-style batch aggregate answers only at
  * query time and an exact distinct() cannot answer on an unbounded
  * stream without unbounded state.
  *
  * The KMV estimator (Bar-Yossef et al., "Counting distinct elements in a
  * data stream", RANDOM 2002): hash every value to a uniform fraction,
  * keep the k smallest hashes; the kth smallest fraction f estimates the
  * cardinality as (k-1)/f. Unlike HLL registers the synopsis is fully
  * DETERMINISTIC — any engine with md5 derives the identical k-set — and
  * MERGEABLE: the union of two k-sets re-truncated to k is the sketch of
  * the union, which is exactly the per-batch fold this operator runs and
  * the reason one sketch per shuffle partition composes at 100 TB.
  *
  * The hash domain is the md5's FIRST 15 HEX DIGITS as a 60-bit long
  * (round 14; previously the full 32-char hex string): ordering by the
  * prefix agrees with ordering by the full hex wherever prefixes differ,
  * and two distinct values sharing a 60-bit prefix is a ~n²/2⁶¹ event —
  * the synopsis is DEFINED over distinct prefixes so both engines
  * collapse such a collision identically. The fold compares longs
  * instead of 32-char strings and, once the synopsis is full, drops
  * every batch value ≥ the kth minimum with one comparison — the
  * overwhelming majority at high cardinality, since the kth minimum
  * sits near k/|distinct| of the domain.
  *
  * Agreement (pinned by StreamingKMVSpec): after any prefix of an
  * event-id stream, the latest snapshot's (kth_frac, est_distinct)
  * equals r13's batch values over the same rows BIT-FOR-BIT — same md5,
  * same 15-hex-digit 60-bit prefix, same prefix/2⁶⁰ fraction, same
  * (k-1)/f arithmetic (both engines round the 60-bit integer to double
  * with the same IEEE nearest-even cast). Order CANNOT matter: a min-k
  * set is order-free, so unlike every other operator here the agreement
  * needs no ordered-delivery caveat and no disorder contract — late
  * data folds in identically.
  *
  * Scale shape: ONE stateful stage keyed by group, state k longs per
  * group, per-batch fold one long comparison per observation plus
  * O(c log c) over the c values that beat the kth minimum. Nothing to
  * watermark — the sketch never grows past k. Snapshots supersede by
  * n_total like [[StreamingTopK]]'s.
  */
object StreamingKMV extends Serializable {

  /** Default synopsis size — matches r13's KmvK so the agreement is
    * direct.
    */
  val DefaultK = 64

  /** 2⁶⁰ — the prefix domain size; exactly representable as a double. */
  val Domain: Double = 1152921504606846976.0d

  /** Project a raw frame into the tracker's typed input: the value is
    * md5-hashed and prefix-folded in codegen (identical to r13's
    * `conv(substring(md5(cast(... as string)), 1, 15), 16, 10)`) so the
    * stateful stage only compares longs.
    */
  def keyedHashes(df: DataFrame, groupCol: Column, valueCol: Column)
    : Dataset[KeyedHash] = {
    implicit val enc: Encoder[KeyedHash] = Encoders.product[KeyedHash]
    df.select(groupCol.cast("string").as("group"),
        conv(substring(md5(valueCol.cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .as[KeyedHash]
  }

  /** The 60-bit prefix of an md5 hex rendering — the JVM-side twin of
    * [[keyedHashes]]'s codegen expression, for specs and consumers that
    * already hold hex digests.
    */
  def prefixOf(hh: String): Long =
    java.lang.Long.parseLong(hh.substring(0, 15), 16)

  /** The uniform fraction of a 60-bit prefix — prefix / 2⁶⁰, the same
    * rendering r13 and its DuckDB oracle use.
    */
  def fracOf(h: Long): Double = h / Domain

  /** The slice fold as a [[SketchEngine.Sketch]] — order-free (a min-k
    * set), so the iterator folds in one pass, no sort, no
    * materialization.
    */
  private final class KmvSketch(k: Int)
    extends SketchEngine.Sketch[String, KeyedHash, KmvState, KmvSnapshot] {
    override def init: KmvState = KmvState(Nil, 0L)
    override def onSlice(group: String, evs: Iterator[KeyedHash],
                         st: KmvState, wmMs: Long,
                         out: scala.collection.mutable.ArrayBuffer[KmvSnapshot])
      : SketchEngine.Next[KmvState] = {
      var n = st.n_total
      val cur = st.hashes // sorted ascending, distinct, ≤ k
      // once the synopsis is full, a value ≥ the kth minimum can never
      // enter it (k smaller-or-equal prefixes already exist) — one long
      // comparison rejects it before any set work
      val cutoff = if (cur.length >= k) cur.last else Long.MaxValue
      val cand = scala.collection.mutable.TreeSet.empty[Long]
      evs.foreach { e =>
        n += 1
        if (e.h < cutoff) cand += e.h
      }
      // k-set union re-truncated to k — the KMV merge
      val merged =
        if (cand.isEmpty) cur
        else (cand ++ cur).toIndexedSeq.sorted.distinct.take(k)
      val tracked = merged.length.toLong
      val (frac, est) =
        if (tracked < k) (-1.0, tracked.toDouble) // synopsis IS the set
        else {
          val f = fracOf(merged.last)
          (f, (k - 1).toDouble / f)
        }
      out += KmvSnapshot(group, n, tracked, frac, est)
      SketchEngine.Update(KmvState(merged, n))
    }
  }

  /** The stateful stage: per group, fold the batch's distinct prefixes
    * into the k-minimum set and emit one snapshot per group per
    * micro-batch. Consumers keep the row with the largest n_total per
    * group. An instance of [[SketchEngine]] since round 18 — the
    * timeout/emit/state plumbing is the sketch family's shared core.
    */
  def track(events: Dataset[KeyedHash], k: Int = DefaultK)
    : Dataset[KmvSnapshot] = {
    require(k >= 2, "(k-1)/kth_frac needs k >= 2")
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stEnc: Encoder[KmvState] = Encoders.product[KmvState]
    implicit val outEnc: Encoder[KmvSnapshot] = Encoders.product[KmvSnapshot]
    SketchEngine.run(events, (_: KeyedHash).group, new KmvSketch(k),
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
}
