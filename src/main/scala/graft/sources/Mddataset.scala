package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multidimensional cell-data decode — the Spark-native form of the
  * reference's XMLA mddataset parser
  * (`/root/reference/modules/generic_xmla_parser.py:64-170` and the
  * structure doc at `:6-9`): Axis0 carries the measure captions, Axis1
  * the dimension-member tuples, and the dense cell matrix addresses
  * cells by `CellOrdinal = row_idx * num_measures + col_idx`
  * (`modules/olap.py:134,142`).
  *
  * The reference pivots this client-side in pandas, all rows in memory
  * (`generic_xmla_parser.py:152-166` — its single least scalable
  * pattern). Here the decode is a declarative plan: integer div/mod to
  * recover (row, measure) from the ordinal, then a conditional-aggregate
  * pivot — one shuffle on row_idx, any data size.
  *
  * Values stay strings (the wire format); the reference's opportunistic
  * numeric inference (`generic_xmla_parser.py:144-148`) is deferred to
  * the mapping layer (graft.etl.Pipeline + Coercions), mirroring the
  * reference's own two-stage schema (inferred at ingest, declared in the
  * mapping — SURVEY.md §1.3).
  */
object Mddataset {

  /** Decode a cells frame into one row per Axis1 tuple.
    *
    * @param cells    (ordinal: long, value: string) — sparse is fine;
    *                 missing cells become nulls (the NON EMPTY artifact)
    * @param measures Axis0 captions in column order
    * @param tuples   optional Axis1 frame (row_idx: long, dim cols...)
    *                 joined onto the decoded rows
    */
  def decode(cells: DataFrame, measures: Seq[String],
      tuples: Option[DataFrame] = None): DataFrame = {
    require(measures.nonEmpty, "mddataset needs at least one Axis0 measure")
    val n = measures.size
    val addressed = cells.select(
      expr(s"ordinal div $n").as("row_idx"),
      (col("ordinal") % n).cast("int").as("m_idx"),
      col("value"))
    val aggs = measures.zipWithIndex.map { case (m, i) =>
      max(when(col("m_idx") === i, col("value"))).as(m)
    }
    val wide = addressed.groupBy("row_idx").agg(aggs.head, aggs.tail: _*)
    tuples match {
      case Some(t) => t.join(wide, Seq("row_idx"), "left")
      case None => wide
    }
  }
}
