package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate (a kNN neighbor, a ranked doc, …). */
final case class ScoredId(id: Long, score: Double)

/** Top-k by (score desc, id asc) as a typed `Aggregator` — the scalable form
  * of "rank and keep k".
  *
  * A window `row_number ≤ k` must shuffle EVERY candidate row to sort inside
  * each partition key; this aggregator partial-combines map-side, so the
  * shuffle carries at most k rows per (input partition × group) — at 100 TB
  * the difference between shuffling the full candidate matrix and shuffling
  * k·|queries| rows. Ordering matches `ROW_NUMBER() OVER (ORDER BY score
  * DESC, id)` exactly, so results are interchangeable with the window form
  * (pinned by AggregatorSpec).
  *
  * k is small (top-k semantics), so the buffer is a sorted Vector — inserts
  * are O(k) array copies, cheaper in practice than heap node churn at k ≤ ~100.
  */
final class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (buf.size < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    (x ++ y).sorted(ord).take(k)

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopKByScore {
  /** Column form: `top_k(id, score)` → array<struct<id,score>> sorted by
    * (score desc, id asc). (The product input encoder flattens ScoredId into
    * two UDAF parameters.)
    */
  def apply(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKByScore(k), ExpressionEncoder[ScoredId]())
    (id: Column, score: Column) => fn(id, score)
  }
}
