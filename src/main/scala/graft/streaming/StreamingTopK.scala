package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One item observation entering the heavy-hitter tracker: `seq` is a
  * per-source monotone id that (with ts) fixes the in-batch processing
  * order, `group` the tracking scope (e.g. event type), `item` the thing
  * being counted (e.g. user id).
  */
case class KeyedItem(ts: Timestamp, seq: Long, group: String, item: String)

/** SpaceSaving summary for one group: parallel arrays of the ≤ capacity
  * tracked items, their (over-)counts, and the overestimation error each
  * count carries (the evicted predecessor's count at takeover time), plus
  * the total observations folded so far. State size is O(capacity) per
  * group REGARDLESS of stream length or item cardinality — the entire
  * point of the sketch.
  */
case class TopKState(items: Array[String], counts: Array[Long],
                     errs: Array[Long], n_total: Long)

/** One row of a per-batch snapshot: the tracked items of `group` ranked by
  * estimated count after `n_total` observations. `cnt` overestimates the
  * true frequency by at most `err` (SpaceSaving invariant: true ∈
  * [cnt − err, cnt]); `err` = 0 means the count is exact.
  */
case class TopKSnapshot(group: String, n_total: Long, rank: Long,
                        item: String, cnt: Long, err: Long)

/** Streaming heavy hitters — the SpaceSaving sketch (Metwally, Agrawal,
  * El Abbadi, "Efficient computation of frequent and top-k elements in
  * data streams", ICDT 2005) keyed by group via flatMapGroupsWithState:
  * the online "who is flooding the pipeline" monitor (dominant users,
  * hot domains, runaway crawl hosts) that an exact groupBy cannot answer
  * on an unbounded stream without unbounded state.
  *
  * Algorithm (per group, capacity m): a tracked item's count increments;
  * an untracked item takes over the minimum-count slot, inheriting its
  * count + 1 with error = the evicted count (or fills a free slot with
  * count 1, error 0). Guarantees: any item with true frequency > n/m is
  * tracked, and every reported count overestimates truth by at most its
  * recorded error ≤ n/m. With m ≥ distinct(items) nothing is ever
  * evicted and the sketch IS the exact count table — which is what the
  * batch==streaming agreement spec pins against the exact groupBy
  * ([[exactTopK]]).
  *
  * Determinism: events fold in (ts, seq) order within every micro-batch;
  * eviction picks the (count, item)-smallest slot and snapshots rank by
  * (count desc, item) — bit-identical replay across engines and runs.
  *
  * Scale shape: ONE stateful stage whose shuffle key is the group and
  * whose state is capacity rows' worth of strings per group — O(groups ·
  * m), knob-bounded, nothing to watermark (the sketch never grows). The
  * per-event linear probe over m slots is the textbook array form
  * (capacity ≤ a few hundred in practice); the O(1) stream-summary
  * linked-bucket variant is a drop-in replacement with identical output.
  */
object StreamingTopK {

  /** Default tracked-slot capacity per group. */
  val DefaultCapacity = 64

  /** Project a raw frame into the tracker's typed input. */
  def keyedItems(df: DataFrame, tsCol: Column, seqCol: Column,
                 groupCol: Column, itemCol: Column): Dataset[KeyedItem] = {
    implicit val enc: Encoder[KeyedItem] = Encoders.product[KeyedItem]
    df.select(tsCol.as("ts"), seqCol.cast("long").as("seq"),
        groupCol.cast("string").as("group"), itemCol.cast("string").as("item"))
      .as[KeyedItem]
  }

  /** The stateful tracking stage: emits one full ranked snapshot per group
    * per micro-batch (rank 1..tracked, ordered count desc then item).
    * Consumers keep the row set with the largest n_total per group — each
    * snapshot supersedes the previous one.
    */
  def track(items: Dataset[KeyedItem], capacity: Int = DefaultCapacity)
    : Dataset[TopKSnapshot] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stEnc: Encoder[TopKState] = Encoders.product[TopKState]
    implicit val outEnc: Encoder[TopKSnapshot] = Encoders.product[TopKSnapshot]

    // SpaceSaving's admission is arrival-order-sensitive (who holds a
    // counter when the table is full depends on the order), so the
    // slice sorts by the family's (ts, seq) order for deterministic
    // replay — then folds on mutable parallel arrays
    val sketch = new SketchEngine.Sketch[String, KeyedItem, TopKState,
      TopKSnapshot] {
      override def init: TopKState =
        TopKState(Array.empty, Array.empty, Array.empty, 0L)
      override def onSlice(key: String, evs: Iterator[KeyedItem],
                           st: TopKState, wmMs: Long,
                           out: scala.collection.mutable.ArrayBuffer[TopKSnapshot])
        : SketchEngine.Next[TopKState] = {
        val seq = evs.toSeq
        val sorted =
          if (seq.lengthCompare(2) < 0) seq
          else seq.sortBy(e => (e.ts.getTime, e.seq))
        val items = scala.collection.mutable.ArrayBuffer(st.items: _*)
        val counts = scala.collection.mutable.ArrayBuffer(st.counts: _*)
        val errs = scala.collection.mutable.ArrayBuffer(st.errs: _*)
        var n = st.n_total
        sorted.foreach { e =>
          n += 1
          val at = items.indexOf(e.item)
          if (at >= 0) counts(at) += 1
          else if (items.size < capacity) {
            items += e.item; counts += 1L; errs += 0L
          } else {
            // deterministic victim: smallest (count, item)
            var v = 0
            var i = 1
            while (i < items.size) {
              if (counts(i) < counts(v) ||
                (counts(i) == counts(v) && items(i) < items(v))) v = i
              i += 1
            }
            errs(v) = counts(v)
            counts(v) = counts(v) + 1
            items(v) = e.item
          }
        }
        val ranked = items.indices
          .sortBy(i => (-counts(i), items(i)))
        ranked.zipWithIndex.foreach { case (i, rk) =>
          out += TopKSnapshot(key, n, rk + 1L, items(i), counts(i), errs(i))
        }
        SketchEngine.Update(
          TopKState(items.toArray, counts.toArray, errs.toArray, n))
      }
    }
    SketchEngine.run(items, (_: KeyedItem).group, sketch, expiring = false)
  }

  /** The exact batch equivalent the agreement spec pins against: true
    * per-(group, item) counts ranked identically (count desc, item),
    * truncated to `capacity`. With streaming capacity ≥ distinct items per
    * group the sketch's final snapshot equals this frame with err = 0.
    */
  def exactTopK(df: DataFrame, groupCol: Column, itemCol: Column,
                capacity: Int = DefaultCapacity): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("group"))
      .orderBy(col("cnt").desc, col("item"))
    df.select(groupCol.cast("string").as("group"),
        itemCol.cast("string").as("item"))
      .groupBy(col("group"), col("item"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= capacity)
      .select(col("group"), col("rank"), col("item"), col("cnt"))
  }
}
