package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, posexplode, struct, udaf}

/** Bounded per-group top-k as a mergeable [[Aggregator]].
  *
  * The window-function form (`row_number over (partition by g order by
  * v desc)` then `rank <= k`) shuffles and SORTS every row of every
  * group; this aggregator keeps only the current top k in its buffer,
  * so the partial→final shuffle carries at most k rows per (group ×
  * map partition) and nothing is ever globally sorted — the shape that
  * survives a 100× scale-up of rows-per-group. The trade is k must be
  * small (the buffer is an in-memory list re-sorted per insert batch).
  *
  * Ordering is value DESC with tag ASC tie-break, so results are
  * deterministic under any partitioning. Null values are skipped (the
  * input value decodes as Option, so a null row is a no-op, not a
  * deserialization failure); null tags are not allowed (enforce
  * upstream).
  */
final case class TopKEntry(value: Double, tag: Long)

/** udaf input row: value nullable by construction. */
final case class TopKInput(value: Option[Double], tag: Long)

final class TopKAggregator(k: Int)
    extends Aggregator[TopKInput, List[TopKEntry], Seq[TopKEntry]] {
  require(k > 0 && k <= 1000, s"need 0 < k <= 1000, got $k")

  private def top(xs: List[TopKEntry]): List[TopKEntry] =
    xs.sortBy(e => (-e.value, e.tag)).take(k)

  override def zero: List[TopKEntry] = Nil

  override def reduce(b: List[TopKEntry], x: TopKInput): List[TopKEntry] =
    x.value match {
      case None => b // null values are skipped
      // cheap pre-filter: once the buffer is full, only candidates that
      // beat the current cutoff trigger a re-sort
      case Some(v) if b.lengthCompare(k) >= 0 && {
          val last = b.last
          v < last.value || (v == last.value && x.tag > last.tag)
        } => b
      case Some(v) => top(TopKEntry(v, x.tag) :: b)
    }

  override def merge(a: List[TopKEntry], b: List[TopKEntry]): List[TopKEntry] =
    if (a.isEmpty) b else if (b.isEmpty) a else top(a ++ b)

  override def finish(b: List[TopKEntry]): Seq[TopKEntry] = b

  override def bufferEncoder: Encoder[List[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[TopKEntry]]()
  override def outputEncoder: Encoder[Seq[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKEntry]]()
}

object TopKAggregator {

  /** Untyped Column form: `df.groupBy(g).agg(topK(3, $"v", $"id"))`
    * yields an array<struct<value,tag>> sorted best-first. (A product
    * input type surfaces as one SQL parameter per field.) */
  def topK(k: Int, value: Column, tag: Column): Column =
    udaf(new TopKAggregator(k))
      .apply(value.cast("double"), tag.cast("long"))

  /** Explode a topK result array to (rank, value, tag) rows, rank
    * starting at 1 in best-first order. */
  def exploded(arr: Column): Column = posexplode(arr)
}
