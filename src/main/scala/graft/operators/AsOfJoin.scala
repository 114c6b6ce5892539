package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the latest right row at or before the
  * left row's time within the same key (the operator behind "price as of
  * trade time" / "last touchpoint before conversion").
  *
  * Spark has no native as-of join; the naive spelling is a range join
  * (key equality + time inequality) that explodes to |L|×|R| per key
  * before aggregation. This is the scalable union-window form instead:
  * tag both sides, union, and take a running `last(payload, ignoreNulls)`
  * ordered by (time, side) per key — ONE shuffle on the key, linear in
  * |L|+|R|, no pair space, AQE-skew-splittable like any window.
  *
  * Contract: right rows must be unique per (key, time) — pre-aggregate
  * duplicates (e.g. `max(id)`) or the surviving payload is
  * nondeterministic. Ties (right.time == left.time) match, mirroring
  * `<=` semantics: the right side sorts before the left at equal times.
  */
object AsOfJoin {

  /** @param payload right-side columns carried onto matching left rows
    *                (null when no right row precedes — left-join
    *                semantics)
    */
  def latestPreceding(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val lAligned = payload.foldLeft(l)((df, p) =>
      df.withColumn(s"__p_$p", lit(null).cast(right.schema(p).dataType)))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    val rAligned = leftCols.foldLeft(
      payload.foldLeft(r)((df, p) => df.withColumnRenamed(p, s"__p_$p")))(
      (df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lAligned.select(
      (leftCols.map(col) ++ Seq(col("__t"), col("__side")) ++ payload.map(p => col(s"__p_$p"))): _*)
      .unionByName(rAligned.select(
        (leftCols.map(col) ++ Seq(col("__t"), col("__side")) ++ payload.map(p => col(s"__p_$p"))): _*))

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(s"__last_$p", last(col(s"__p_$p"), ignoreNulls = true).over(w)))
    filled
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ payload.map(p => col(s"__last_$p").as(p))): _*)
  }
}
