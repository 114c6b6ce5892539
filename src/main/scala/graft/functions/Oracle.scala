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
    * band count CASE arms are GENERATED from the Scala side's one
    * pinned integer table (miss budget 1e-3 at cosine 0.99) — integers,
    * not runtime transcendentals, precisely so no engine's rounding can
    * make the two derivations disagree at a ceil boundary.
    */
  def lshGeo(nExpr: String): String = {
    // generated from the ONE pinned band table (the Bpe.mergesSqlValues
    // single-source rule): an edit to the Scala geometry cannot leave a
    // stale literal copy steering every oracle replay
    val bands = graft.similarity.Similarity.BandsByBits
    val cases = bands.init.zipWithIndex
      .map { case (b, i) => s"WHEN ${i + 8} THEN $b" }.mkString(" ")
    s"""SELECT r, CASE r $cases ELSE ${bands.last} END AS b
       FROM (SELECT COALESCE(MIN(r), 30) AS r
             FROM range(8, 31) t(r)
             WHERE (CAST(1 AS BIGINT) << r) >= ($nExpr))"""
  }
}
