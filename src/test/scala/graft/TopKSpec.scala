package graft

import org.apache.spark.sql.functions._
import graft.functions.{TopKAggregator, TopKEntry}

/** Bounded top-k aggregator specs: exact agreement with a window
  * row_number under any partitioning, tie-break determinism, duplicate
  * retention, and groups smaller than k.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def topkOf(rows: Seq[(String, Double, Long)], k: Int, parts: Int): Seq[(String, Int, Long, Double)] =
    rows.toDF("g", "score", "id")
      .repartition(parts)
      .select(col("g"), struct(col("score"), col("id")).as("e"))
      .as[(String, TopKEntry)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .toDF("g", "topk")
      .select(col("g"), posexplode(col("topk")))
      .select(col("g"), (col("pos") + 1).as("rk"), col("col.id"), col("col.score"))
      .as[(String, Int, Long, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))

  private def windowed(rows: Seq[(String, Double, Long)], k: Int): Seq[(String, Int, Long, Double)] =
    rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy { case (s, id) => (-s, id) }
        .take(k).zipWithIndex
        .map { case ((s, id), i) => (g, i + 1, id, s) }
    }.sortBy(r => (r._1, r._2))

  test("top-k equals the window rank under 1/3/17 partitions") {
    val rng = new scala.util.Random(42)
    val rows = (1L to 500L).map(i =>
      (s"g${i % 7}", (rng.nextInt(50) * 0.5), i))
    val want = windowed(rows, 3)
    for (parts <- Seq(1, 3, 17))
      assert(topkOf(rows, 3, parts) == want, s"parts=$parts")
  }

  test("ties break by id ascending; equal duplicates occupy multiple slots") {
    val rows = Seq(
      ("g", 5.0, 30L), ("g", 5.0, 10L), ("g", 5.0, 20L), // three-way tie
      ("g", 9.0, 99L), ("g", 9.0, 99L),                  // exact duplicate row
      ("g", 1.0, 1L))
    // order: 9.0/99, 9.0/99 (dup retained), 5.0/10, 5.0/20 — the k=4 cut
    assert(topkOf(rows, 4, 3) == Seq(
      ("g", 1, 99L, 9.0), ("g", 2, 99L, 9.0), ("g", 3, 10L, 5.0), ("g", 4, 20L, 5.0)))
  }

  test("groups smaller than k publish all rows, ranked") {
    val rows = Seq(("a", 2.0, 1L), ("a", 3.0, 2L), ("b", 7.0, 9L))
    assert(topkOf(rows, 5, 2) == Seq(
      ("a", 1, 2L, 3.0), ("a", 2, 1L, 2.0), ("b", 1, 9L, 7.0)))
  }

  test("q17 on the real tables matches an independent window computation") {
    val got = CubeQueries.q17.query(spark, sfDir)
      .as[(String, Int, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    val rev = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(graft.functions.StableAgg.dsum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
      .as[(String, Long, Double)].collect().toSeq
    val want = windowed(rev.map(r => (r._1, r._3, r._2)), 3)
    assert(got == want)
    assert(got.nonEmpty)
  }
}
