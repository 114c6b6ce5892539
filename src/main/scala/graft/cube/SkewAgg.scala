package graft.cube

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Salted two-phase aggregation for skewed keys (SURVEY.md §8 scale
  * decisions; the "salting for skew" tool the 100 TB posture requires).
  *
  * A `groupBy(hotKey)` sends every row of a hot key to one reducer.
  * Salting splits each key into `salts` sub-groups for the partial
  * aggregate, then combines partials in a second (tiny) aggregate —
  * reducer load drops by ~`salts`× on the hot key at the cost of one
  * extra shuffle over pre-aggregated partials. Only algebraic
  * aggregates compose this way (sum/count/min/max — not count-distinct).
  *
  * Note: Spark's own partial aggregation already handles *map-side*
  * combine; salting matters when the post-combine per-key load is still
  * skewed (many tasks × few keys), or under AQE-less engines. AQE's
  * skew-join handling covers joins, not single-key aggregations — this
  * covers the aggregation side.
  */
object SkewAgg {

  private val Dec = DecimalType(28, 2)

  /** Decimal-exact salted sum + count per key group. The salt hashes the
    * full row (deterministic, uniform); decimals stay decimals until the
    * final combine so the result is bit-identical to the unsalted plan.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: Column,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol.cast(Dec)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as("total"),
        sum(col("__pcnt")).as("n_rows"))
  }
}
