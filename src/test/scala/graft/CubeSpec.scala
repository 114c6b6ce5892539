package graft

import org.apache.spark.sql.functions._
import graft.cube.CubeQuery

/** Rollup labelling semantics: subtotal rows are identified by
  * grouping(), never by nullness, so genuinely-NULL dimension values
  * survive the 'All'-row filter.
  */
class CubeSpec extends SparkSpec {
  import spark.implicits._

  test("genuinely-NULL dim values survive dropAllRows after rollupAll") {
    val fact = Seq(
      (Some("A"), 1.0),
      (Some("B"), 2.0),
      (None: Option[String], 4.0)) // a real detail row with a null dim
      .toDF("flag", "x")
    val rolled = CubeQuery.rollupAll(fact, Seq("flag"),
      Seq(CubeQuery.Measure("sum_x", sum(col("x")))))
    // rollup emits 4 rows: A, B, null-detail, grand total
    val byLabel = rolled.collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(byLabel == Map(
      Some("A") -> 1.0, Some("B") -> 2.0,
      None -> 4.0,            // the genuine null is NOT relabelled 'All'
      Some("All") -> 7.0))    // only the grouping()-tagged subtotal is
    val detail = CubeQuery.dropAllRows(rolled, Seq("flag"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    // the null-dim detail row survives; only the subtotal is dropped
    assert(detail == Map(Some("A") -> 1.0, Some("B") -> 2.0, None -> 4.0))
  }
}
