package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed `Aggregator` — the
  * bounded-state way to find heavy hitters over an UNBOUNDED key space
  * (tokens, n-grams, URLs) at 100 TB. An exact `groupBy(token).count`
  * shuffles one partial per distinct key per partition; this sketch
  * keeps at most k counters per partition, so aggregation state is O(k)
  * no matter how large the vocabulary grows.
  *
  * Guarantee (Misra & Gries 1982; mergeability per Agarwal et al.
  * 2012): for every item, `true_count − sketch_count ≤ N/(k+1)` where N
  * is the total stream length — under ANY partitioning and merge order.
  * So every item with true count > N/(k+1) is present in the final
  * summary; callers re-verify candidates exactly and use the bound to
  * certify the result ([[graft.text.HeavyHitters]]).
  *
  * The summary CONTENTS depend on arrival order (unlike the KMV
  * sketch), so nothing derived from the raw counters may be published
  * to an oracle-checked result — only the exactly re-verified
  * candidates are.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"Misra-Gries needs k >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
    b.get(t) match {
      case Some(c) => b.updated(t, c + 1)
      case None if b.size < k => b.updated(t, 1L)
      // full and unseen: decrement every counter (the classic MG step —
      // amortized O(1): each decrement cancels one prior increment)
      case None =>
        b.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }

  /** Merge = pointwise sum, then subtract the (k+1)-th largest count
    * from everything and drop non-positives — the summary-merge that
    * preserves the N/(k+1) error bound (errors add, bounds add).
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else b.foldLeft(a) { case (acc, (t, c)) => acc.updated(t, acc.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
