package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-independent aggregation helpers for differential testing.
  *
  * A plain `sum(double)` depends on accumulation order, so a Spark result
  * and a DuckDB oracle can disagree in the last ulp (and at 100 TB, so can
  * two runs of the same Spark job after AQE re-plans). Fix: cast each
  * per-row value to a fixed-scale decimal first — binary doubles can never
  * land exactly on a decimal half-tie, so the rounding is engine-agnostic —
  * then sum decimals exactly, and hand back a double.
  *
  * The decimal-at-the-boundary policy also matches the reference, which
  * computes in float64 but stores decimal(·,2)
  * (`/root/reference/modules/pipeline_runner.py:108-112` vs
  * `dataverse_table_creation/create_oarsbidata_table.py:204-218`).
  *
  * Each helper documents its DuckDB-SQL mirror; `Oracle.scala` builds the
  * strings.
  */
object StableAgg {

  /** Exact sum of a double expression: SQL mirror
    * `CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Exact mean: SQL mirror
    * `CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)
}
