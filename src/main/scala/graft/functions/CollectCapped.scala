package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** `collect_list` with a hard buffer bound: keeps at most `cap + 1`
  * elements per group, partial-combining map-side.
  *
  * The d02 document-frequency cap drops shingle groups with df > cap — but
  * a plain `collect_list` would still materialize a corpus-wide
  * stop-shingle's full document list in one aggregation buffer before the
  * filter sees it. This aggregator makes over-cap groups cost O(cap)
  * memory instead of O(df): once a buffer holds cap + 1 elements it stops
  * growing, and cap + 1 is exactly the "df exceeded" witness the filter
  * needs. Groups at or under the cap are collected completely (truncation
  * only ever triggers past cap + 1), so surviving groups are identical to
  * `collect_list` — sort after for a deterministic list.
  */
final class CollectCapped(cap: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(cap > 0, s"cap must be positive, got $cap")

  private val limit = if (cap == Int.MaxValue) Int.MaxValue else cap + 1

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], a: Long): Seq[Long] =
    if (buf.size >= limit) buf else buf :+ a

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    if (x.size >= limit) x
    else if (y.size >= limit) y
    else (x ++ y).take(limit)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object CollectCapped {
  /** Column form: `collect_capped(x)` → array<long>, at most cap+1 long. */
  def apply(cap: Int): Column => Column = {
    val fn = udaf(new CollectCapped(cap), Encoders.scalaLong)
    (x: Column) => fn(x)
  }
}
