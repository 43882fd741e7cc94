package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One pre-hashed observation entering the cardinality tracker: `group`
  * is the counting scope (e.g. event type, or a constant for a global
  * count), `hh` the md5 hex of the counted value — hashing happens in
  * codegen BEFORE the stateful stage ([[StreamingKMV.keyedHashes]]), so
  * the JVM fold only ever merges strings.
  */
case class KeyedHash(group: String, hh: String)

/** KMV synopsis for one group: the ≤ k smallest md5 hashes seen (sorted
  * ascending) and the total observations folded. State is O(k) per group
  * REGARDLESS of stream length or true cardinality — 64 hex strings
  * where an exact distinct-count needs the whole key set and a Bloom
  * filter needs bits proportional to the expected population.
  */
case class KmvState(hashes: Seq[String], n_total: Long)

/** One per-batch cardinality report for `group`: the estimate after
  * `n_total` observations. While fewer than k distinct hashes have been
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
  * Agreement (pinned by StreamingKMVSpec): after any prefix of an
  * event-id stream, the latest snapshot's (kth_frac, est_distinct)
  * equals r13's batch values over the same rows BIT-FOR-BIT — same md5,
  * same first-8-hex-digit fraction, same (k-1)/f arithmetic. Order
  * CANNOT matter: a min-k set is order-free, so unlike every other
  * operator here the agreement needs no ordered-delivery caveat and no
  * disorder contract — late data folds in identically.
  *
  * Scale shape: ONE stateful stage keyed by group, state k strings per
  * group, per-batch fold O((k + batch) log(k + batch)) per group after
  * an in-batch distinct. Nothing to watermark — the sketch never grows
  * past k. Snapshots supersede by n_total like [[StreamingTopK]]'s.
  */
object StreamingKMV extends Serializable {

  /** Default synopsis size — matches r13's KmvK so the agreement is
    * direct.
    */
  val DefaultK = 64

  /** Project a raw frame into the tracker's typed input: the value is
    * md5-hashed in codegen (identical to r13's `md5(cast(... as string))`)
    * so the stateful stage only merges hex strings.
    */
  def keyedHashes(df: DataFrame, groupCol: Column, valueCol: Column)
    : Dataset[KeyedHash] = {
    implicit val enc: Encoder[KeyedHash] = Encoders.product[KeyedHash]
    df.select(groupCol.cast("string").as("group"),
        md5(valueCol.cast("string")).as("hh"))
      .as[KeyedHash]
  }

  /** The uniform fraction of a hash — first 8 hex digits / 2³², the same
    * rendering r13 and its DuckDB oracle use.
    */
  def fracOf(hh: String): Double =
    java.lang.Long.parseLong(hh.substring(0, 8), 16) / 4294967296.0

  /** The stateful stage: per group, fold the batch's distinct hashes into
    * the k-minimum set and emit one snapshot per group per micro-batch.
    * Consumers keep the row with the largest n_total per group.
    */
  def track(events: Dataset[KeyedHash], k: Int = DefaultK)
    : Dataset[KmvSnapshot] = {
    require(k >= 2, "(k-1)/kth_frac needs k >= 2")
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stEnc: Encoder[KmvState] = Encoders.product[KmvState]
    implicit val outEnc: Encoder[KmvSnapshot] = Encoders.product[KmvSnapshot]

    def fn(group: String, evs: Iterator[KeyedHash],
           state: GroupState[KmvState]): Iterator[KmvSnapshot] = {
      val st = state.getOption.getOrElse(KmvState(Nil, 0L))
      var n = st.n_total
      val batch = scala.collection.mutable.TreeSet.empty[String]
      evs.foreach { e => n += 1; batch += e.hh }
      // k-set union re-truncated to k — the KMV merge
      val merged = (batch ++ st.hashes).toIndexedSeq.sorted.distinct.take(k)
      state.update(KmvState(merged, n))
      val tracked = merged.length.toLong
      val (frac, est) =
        if (tracked < k) (-1.0, tracked.toDouble) // synopsis IS the set
        else {
          val f = fracOf(merged.last)
          (f, (k - 1).toDouble / f)
        }
      Iterator.single(KmvSnapshot(group, n, tracked, frac, est))
    }

    events.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
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
