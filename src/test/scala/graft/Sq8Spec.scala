package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** SQ8 scalar-quantized search: reconstruction stays within half a
  * quantization step per dimension, and quantized top-k recall against
  * the exact brute-force list is high (256 levels per dim is a fine
  * grid for unit-scale embeddings).
  */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  test("sq8 top-5 recall vs brute-force top-5 is >= 0.8") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("q_id"), col("n_id")).as[(Long, Long)].collect().toSet
    val brute = pairs(Similarity.bruteTopK(q, emb, "vec_id", "embedding", 5))
    val sq8 = pairs(Similarity.sq8TopK(q, emb, "vec_id", "embedding", 5))
    val recall = (brute & sq8).size.toDouble / brute.size
    assert(recall >= 0.8, s"sq8 recall $recall < 0.8 (|brute|=${brute.size})")
  }

  test("dequantized vectors stay within half a step of the originals") {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    // replay quantization locally against exact per-dim ranges
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val dims = vecs.head._2.length
    val mn = Array.tabulate(dims)(j => vecs.map(_._2(j).toDouble).min)
    val mx = Array.tabulate(dims)(j => vecs.map(_._2(j).toDouble).max)
    vecs.foreach { case (_, v) =>
      v.indices.foreach { j =>
        val step = (mx(j) - mn(j)) / 255.0
        if (step > 0) {
          val code = math.min(255L, math.max(0L,
            math.floor((v(j).toDouble - mn(j)) * 255.0 / (mx(j) - mn(j))).toLong))
          val r = mn(j) + (code + 0.5) * (mx(j) - mn(j)) / 255.0
          assert(math.abs(r - v(j).toDouble) <= step / 2 + 1e-12,
            s"dim $j: recon error ${math.abs(r - v(j))} > half-step ${step / 2}")
        }
      }
    }
  }

  test("sq8 plan: corpus scan broadcasts the range anchor and the query side") {
    val emb = Tables.embeddings(spark, sfDir)
    val p = Similarity.sq8TopK(emb.filter(col("vec_id") < 8), emb,
      "vec_id", "embedding", 5).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "SQ8 corpus pass must not cartesian-join at data scale")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      "only the one-row range anchor and the query set may broadcast")
  }
}
