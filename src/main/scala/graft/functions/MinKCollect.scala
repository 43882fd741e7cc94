package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One j12 path event — the (ts, event_id, event_type) struct a session's
  * first-k slice is built from. `event_id` is unique per event, so
  * (ts, event_id) is a total order and the min-k set is deterministic.
  */
case class PathEv(ts: Timestamp, event_id: Long, event_type: String)

/** `sort_array(collect_list(x))[1..k]` with a hard buffer bound: keeps the
  * k SMALLEST elements per group, partial-combining map-side — the min-k
  * sibling of [[CollectCapped]].
  *
  * A bare collect-then-slice materializes a group's ENTIRE history in one
  * aggregation buffer before the slice sees it; for j12's session paths a
  * pathological always-active key (bot traffic — precisely what session
  * mining at 100 TB sees) makes that buffer data-dependent. This aggregator
  * makes every group cost O(k) memory regardless of group size: the buffer
  * is a sorted vector capped at k, an element enters only while it would
  * rank in the current top-k, and merge is a k-bounded sorted merge — all
  * associative+commutative, so map-side partials combine exactly.
  *
  * `finish` returns the buffer ascending — already the slice the caller
  * wants, no post-sort needed.
  */
final class MinKCollect[T](k: Int)(implicit ord: Ordering[T],
                                   seqEnc: Encoder[Seq[T]])
  extends Aggregator[T, Seq[T], Seq[T]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[T] = Vector.empty

  override def reduce(buf: Seq[T], a: T): Seq[T] =
    if (buf.size < k) (buf :+ a).sorted
    else if (ord.lt(a, buf.last)) ((buf :+ a).sorted: Seq[T]).take(k)
    else buf

  override def merge(x: Seq[T], y: Seq[T]): Seq[T] =
    if (y.isEmpty) x
    else if (x.isEmpty) y
    else ((x ++ y).sorted: Seq[T]).take(k)

  override def finish(buf: Seq[T]): Seq[T] = buf

  override def bufferEncoder: Encoder[Seq[T]] = seqEnc
  override def outputEncoder: Encoder[Seq[T]] = seqEnc
}

object MinKCollect {

  /** j12's collector: first `k` events of a session by (ts, event_id), as
    * an array of (ts, event_id, event_type) structs, ascending. The udaf
    * flattens [[PathEv]]'s encoder, so the column form takes the three
    * fields separately (in [[PathEv]] field order).
    */
  def pathEvents(k: Int): (Column, Column, Column) => Column = {
    implicit val ord: Ordering[PathEv] =
      Ordering.by((e: PathEv) => (e.ts.getTime, e.event_id))
    implicit val seqEnc: Encoder[Seq[PathEv]] = ExpressionEncoder()
    val fn = udaf(new MinKCollect[PathEv](k), Encoders.product[PathEv])
    (ts: Column, id: Column, tpe: Column) => fn(ts, id, tpe)
  }
}
