package graft

import graft.operators.RangeJoin

/** Bucket-banding exactness for the range join: in-bucket and
  * neighbor-bucket pairs found, boundary distance excluded, no
  * duplicates.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded range join equals the inequality-join definition") {
    val rows = Seq(
      ("k", 1L, 0L), ("k", 2L, 95L),    // same bucket (w=100)
      ("k", 3L, 105L),                  // neighbor bucket of id 2, |Δ|=10
      ("k", 4L, 195L),                  // |Δ| to id 3 = 90 (match), to id 2 = 100 (boundary → no)
      ("k", 5L, 400L),                  // isolated
      ("x", 6L, 0L))                    // other key
      .toDF("key", "id", "t")
    val got = RangeJoin.within(rows, "key", "t", "id", width = 100L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val brute = (for {
      a <- Seq((1L, 0L, "k"), (2L, 95L, "k"), (3L, 105L, "k"), (4L, 195L, "k"), (5L, 400L, "k"), (6L, 0L, "x"))
      b <- Seq((1L, 0L, "k"), (2L, 95L, "k"), (3L, 105L, "k"), (4L, 195L, "k"), (5L, 400L, "k"), (6L, 0L, "x"))
      if a._3 == b._3 && a._1 < b._1 && math.abs(a._2 - b._2) < 100
    } yield (a._1, b._1)).toSet
    assert(got == brute)
    assert(got == Set((1L, 2L), (2L, 3L), (3L, 4L))) // boundary 2-4 excluded
  }
}
