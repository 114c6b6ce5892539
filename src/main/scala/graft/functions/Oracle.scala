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

  /** Mirror of graft.similarity.Similarity.lshSpecFor: the adaptive
    * sign-bit-LSH band geometry as a one-row CTE body
    * `(SELECT r, b FROM ...)` over a corpus-size SQL expression. The
    * band count table is the SAME pinned literal list as the Scala side
    * (miss budget 1e-3 at cosine 0.99) — spelled as integers in both
    * places precisely so no engine's transcendental rounding can make
    * the two derivations disagree at a ceil boundary.
    */
  def lshGeo(nExpr: String): String = {
    val bands = Seq(6, 7, 7, 8, 9, 9, 10, 10, 11, 12, 13, 13, 14, 15, 16,
      17, 18, 19, 20, 21, 22, 23, 24)
    val cases = bands.init.zipWithIndex
      .map { case (b, i) => s"WHEN ${i + 8} THEN $b" }.mkString(" ")
    s"""SELECT r, CASE r $cases ELSE ${bands.last} END AS b
       FROM (SELECT COALESCE(MIN(r), 30) AS r
             FROM range(8, 31) t(r)
             WHERE (CAST(1 AS BIGINT) << r) >= ($nExpr))"""
  }
}
