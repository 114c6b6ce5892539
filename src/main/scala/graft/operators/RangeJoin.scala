package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — equality on a key plus a bounded time/value
  * distance. The naive spelling (`a.key = b.key AND abs(a.t - b.t) < w`)
  * is a BroadcastNestedLoopJoin / per-key cross product. Banding maps
  * each row to `floor(t / w)` buckets and joins each left bucket against
  * its right bucket and the two neighbors — every qualifying pair shares
  * or neighbors a bucket (|Δt| < w ⟹ bucket distance ≤ 1), so this is
  * EXACT, and the join is a plain hash equi-join on (key, bucket):
  * shuffle-partitioned, AQE-skewable, linear in matches.
  *
  * This is also precisely the state layout of a stream-stream interval
  * join (Structured Streaming keeps w-bounded state per key).
  */
object RangeJoin {

  /** Pairs (a, b) with `a.key == b.key`, `|a.t − b.t| < width`, and
    * `a.id < b.id` (dedup + no self-pairs). Inputs need columns
    * (key, t, id); extra columns survive with `a_`/`b_` prefixes.
    */
  def within(
      df: DataFrame,
      key: String,
      timeCol: String,
      idCol: String,
      width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val bucketed = df.withColumn("__b", floor(col(timeCol) / width))
    val probe = bucketed
      .withColumn("__probe", explode(array(col("__b") - 1, col("__b"), col("__b") + 1)))
    val a = bucketed.columns.foldLeft(bucketed)((d, c) =>
      d.withColumnRenamed(c, s"a_$c"))
    val b = probe.columns.foldLeft(probe)((d, c) =>
      d.withColumnRenamed(c, s"b_$c"))
    a.join(b,
      col(s"a_$key") === col(s"b_$key") &&
        col("a___b") === col("b___probe") &&
        col(s"a_$idCol") < col(s"b_$idCol"))
      .filter(abs(col(s"a_$timeCol") - col(s"b_$timeCol")) < width)
      .drop("a___b", "b___b", "b___probe")
  }
}
