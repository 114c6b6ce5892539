package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator` — the bounded-state way to count distincts at 100 TB.
  * An exact `COUNT(DISTINCT x)` re-shuffles every distinct value; this
  * sketch keeps only the k smallest distinct 60-bit hashes of the
  * values (Bar-Yossef et al. 2002), so aggregation state is O(k) per
  * group, partials combine map-side, and the merge is a k-way sorted
  * set union — associative and commutative, so the result is
  * IDENTICAL under any partitioning or AQE re-plan (it's the set of k
  * smallest distinct hashes, whatever order they arrived in). The
  * estimator `(k−1) · 2⁶⁰ / h_k` (h_k = largest kept hash) has
  * relative error ~1/√(k−2).
  *
  * Determinism discipline (matches the md5 hash policy of
  * [[graft.text.TextFunctions.fingerprint60]]): the input is the
  * 60-bit md5-prefix hash of the value's string form, and the
  * estimate divides exactly-representable doubles — so the DuckDB
  * oracle replays sketch AND estimate bit-for-bit (q16's oracle
  * computes the same k-th smallest distinct hash with a window
  * rank).
  */
class KmvAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert `h` into the sorted ≤k buffer if it is a new hash smaller
    * than the current k-th min; no-op otherwise.
    */
  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    if (buf.length == k && h >= buf(k - 1)) return buf
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) return buf // already present — DISTINCT semantics
    val ins = -pos - 1
    val outLen = math.min(buf.length + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // both sides sorted: linear merge, drop duplicates, stop at k
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvAggregator {
  /** Hash space size as an exactly-representable double: 2⁶⁰. */
  val HashSpace: Double = math.pow(2.0, 60)
}
