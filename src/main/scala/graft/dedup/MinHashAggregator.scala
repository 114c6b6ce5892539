package graft.dedup

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash sketch as an `Aggregator[IN, BUF, OUT]` — the typed-API
  * form of the sketch (SURVEY.md §7.4: `Aggregator` for MinHash), for
  * `Dataset`/`KeyValueGroupedDataset` pipelines where the inputs are
  * already shingle base-hashes. Identical math to Dedup.minhashBands
  * (shared `Dedup.permHash`), so the two paths are interchangeable —
  * equivalence is pinned in DedupSpec.
  *
  * The buffer is a fixed-length Long array (2b mins); merge is
  * element-wise min, so partial aggregation composes across partitions
  * exactly like the Column plan's map-side combine.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], baseHash: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val p = Dedup.permHash(baseHash, i)
      if (p < buf(i)) buf(i) = p
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
