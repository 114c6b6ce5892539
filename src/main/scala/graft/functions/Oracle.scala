package graft.functions

/** DuckDB-SQL mirrors of the StableAgg helpers, so a query and its oracle
  * are generated from one measure definition and can never drift apart.
  * (The driver replays these strings in DuckDB and hash-compares values,
  * so the arithmetic must be bit-identical — see StableAgg's scaladoc for
  * why decimal-cast sums are the only portable spelling.)
  */
object Oracle {

  /** Mirror of StableAgg.dsum. */
  def dsum(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,$scale))) AS DOUBLE)"

  /** Mirror of StableAgg.davg. */
  def davg(expr: String, scale: Int = 4): String =
    s"${dsum(expr, scale)} / COUNT($expr)"
}
