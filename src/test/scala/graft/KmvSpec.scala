package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvAggregator

/** KMV distinct-sketch specs: the aggregator's set semantics (the k
  * smallest DISTINCT hashes, whatever the arrival order), partitioning
  * invariance of the merge, and estimator accuracy against the exact
  * count on the real lineitem table.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("kmv buffer is the k smallest distinct hashes under any partitioning") {
    val k = 16
    val kmv = udaf(new KmvAggregator(k), org.apache.spark.sql.Encoders.scalaLong)
    // values with heavy duplication, shuffled arrival order
    val vals = (1L to 200L).flatMap(v => Seq(v * 7919 % 1000, v * 104729 % 1000))
    val expected = vals.distinct.sorted.take(k)
    for (parts <- Seq(1, 3, 17)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(kmv(col("h")).as("sketch"))
        .select("sketch").as[Array[Long]].head()
      assert(got.toSeq == expected, s"parts=$parts")
    }
  }

  test("kmv sketch smaller than k when distincts are fewer; merge dedups") {
    val k = 64
    val kmv = udaf(new KmvAggregator(k), org.apache.spark.sql.Encoders.scalaLong)
    val got = Seq.fill(50)(Seq(5L, 9L, 5L, 1L)).flatten.toDF("h")
      .repartition(8)
      .agg(kmv(col("h")).as("sketch"))
      .select("sketch").as[Array[Long]].head()
    assert(got.toSeq == Seq(1L, 5L, 9L))
  }

  test("q16: estimate within 3/sqrt(k-2) of exact on lineitem") {
    val rows = CubeQueries.q16.query(spark, sfDir)
      .select("l_returnflag", "n_exact", "kmv_k", "kmv_estimate")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("n_exact")).toDouble
      val est = r.getDouble(r.fieldIndex("kmv_estimate"))
      val kk = r.getInt(r.fieldIndex("kmv_k"))
      if (kk < 64) assert(est == exact, s"${r.getString(0)}: partial sketch must be exact")
      else {
        val relErr = math.abs(est - exact) / exact
        assert(relErr < 3.0 / math.sqrt(64 - 2),
          s"${r.getString(0)}: est=$est exact=$exact relErr=$relErr")
      }
    }
  }
}
