package graft.cube

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native implementation of the MDX query shape the reference ships to the
  * OLAP cube (SURVEY.md §2 group G; template documented at
  * `/root/reference/docs/ADD_NEW_PIPELINE.md:19-37`):
  *
  *   SELECT {measures} ON COLUMNS,
  *          NON EMPTY CrossJoin(dim.AllMembers...) ON ROWS
  *   FROM [cube] WHERE (slicer)
  *
  * becomes `fact.filter(slicer).groupBy(dims).agg(measures)` with an
  * optional NON EMPTY post-filter. The plan is fully declarative, so
  * Catalyst gives partial aggregation (map-side combine), predicate
  * pushdown of the slicer into the scan, and AQE shuffle sizing — the
  * properties that make a 47-measure group-by over 100 TB a single
  * shuffle of pre-combined partials rather than raw rows.
  */
object CubeQuery {

  /** One Axis0 measure: output name + aggregate expression (G1/G8/G9). */
  final case class Measure(name: String, agg: Column)

  /** Group by dim columns (the CrossJoin(...AllMembers) of G2), aggregate
    * all measures, and — when `nonEmpty` — drop groups whose measures are
    * all null (the MDX NON EMPTY of G3; relevant when measures are
    * conditional aggregates so a group can exist with no contributing
    * rows for any measure).
    */
  def run(
      fact: DataFrame,
      dims: Seq[(String, Column)],
      measures: Seq[Measure],
      slicer: Option[Column] = None,
      nonEmpty: Boolean = false): DataFrame = {
    require(measures.nonEmpty, "a cube query needs at least one measure")
    val sliced = slicer.map(fact.filter).getOrElse(fact)
    val grouped = sliced
      .groupBy(dims.map { case (n, c) => c.as(n) }: _*)
      .agg(measures.head.agg.as(measures.head.name),
        measures.tail.map(m => m.agg.as(m.name)): _*)
    if (nonEmpty)
      grouped.filter(measures.map(m => col(m.name).isNotNull).reduce(_ || _))
    else grouped
  }

  /** G10 — DrilldownLevel/rollup: hierarchy totals with the subtotal
    * rows labelled 'All', matching the cube artifact the reference then
    * filters out downstream (`modules/pipeline_runner.py:159-166`).
    * Subtotal rows are identified by `grouping()` — NOT by the column
    * being null — so a genuinely-NULL dimension value in the data stays
    * null (a detail row) instead of being mislabelled as a subtotal and
    * silently dropped by `dropAllRows`.
    */
  def rollupAll(
      fact: DataFrame,
      dims: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    val gcols = dims.map(d => grouping(col(d)).as(s"__g_$d"))
    val rolled = fact
      .rollup(dims.map(col): _*)
      .agg(measures.head.agg.as(measures.head.name),
        (measures.tail.map(m => m.agg.as(m.name)) ++ gcols): _*)
    val relabeled = dims.foldLeft(rolled)((df, d) =>
      df.withColumn(d,
        when(col(s"__g_$d") === 1, lit("All")).otherwise(col(d).cast("string"))))
    relabeled.drop(dims.map(d => s"__g_$d"): _*)
  }

  /** B4 — drop the 'All' aggregate rows so flat consumers never see mixed
    * grain (inverse of rollupAll's labelling). Null-safe compare: a
    * genuinely-NULL dim value must NOT trip the filter (a null in an
    * OR-chain of `===` propagates and would silently drop the row).
    */
  def dropAllRows(df: DataFrame, dims: Seq[String]): DataFrame =
    df.filter(!dims.map(col(_) <=> "All").reduce(_ || _))
}
