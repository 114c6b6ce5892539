package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate in a bounded top-k buffer. */
case class TopKEntry(score: Double, id: Long)

/** Exact per-group top-k as a typed `Aggregator` with O(k) state — the
  * scale path for "top N per group" that a window `row_number()` can't
  * give: a window sorts EVERY row of every group on the group's
  * partition (full shuffle + sort of the fact), while this aggregator
  * keeps a k-bounded buffer per partition and ships only O(k) rows per
  * (group, partition) through the shuffle, combining map-side like any
  * partial aggregate.
  *
  * Determinism: the buffer is a total order — score DESC, then id ASC
  * as the tie-break — so the surviving k entries and their ranks are
  * unique for any input multiset, under any partitioning or merge
  * order. Equal (score, id) duplicates are all retained (they occupy
  * multiple slots), matching the oracle's `row_number()` over the same
  * total order.
  *
  * The buffer is a sorted immutable list (insertion by linear scan):
  * k is small (single digits here) and each reduce touches at most k
  * elements — the classic bounded "heap" without the heap.
  */
class TopKAggregator(k: Int)
    extends Aggregator[TopKEntry, List[TopKEntry], Seq[TopKEntry]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  /** score DESC, id ASC — the published rank order. */
  private def beats(a: TopKEntry, b: TopKEntry): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[TopKEntry] = Nil

  override def reduce(buf: List[TopKEntry], e: TopKEntry): List[TopKEntry] = {
    // drop without scanning when the buffer is full and e loses to the tail
    if (buf.lengthCompare(k) >= 0 && !beats(e, buf.last)) buf
    else {
      val (better, worse) = buf.span(beats(_, e))
      (better ::: e :: worse).take(k)
    }
  }

  override def merge(a: List[TopKEntry], b: List[TopKEntry]): List[TopKEntry] = {
    // merge of two sorted lists, truncated at k
    val out = List.newBuilder[TopKEntry]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && beats(x.head, y.head))) { out += x.head; x = x.tail }
      else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: List[TopKEntry]): Seq[TopKEntry] = buf

  override def bufferEncoder: Encoder[List[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[TopKEntry]]()

  override def outputEncoder: Encoder[Seq[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKEntry]]()
}
