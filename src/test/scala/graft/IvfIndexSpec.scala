package graft

import org.apache.spark.sql.functions._
import graft.similarity.IvfIndex

/** Persisted IVF index: the build-once/probe-many path must return
  * exactly what the in-memory s02 IVF plan returns, and the probe must
  * prune unprobed cell partitions at the file index.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  test("probe equals the in-memory s02 plan bit-for-bit; unprobed cells prune") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    val emb = Tables.embeddings(spark, sfDir)
    IvfIndex.build(emb, "vec_id", "embedding", "label", root)

    val got = IvfIndex.topK(spark, root,
      emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5, probes = 2)
    val want = Queries.byName("s02_ivf_topk").query(spark, sfDir)
    // exact equality including the double cosine: both paths accumulate
    // the same decimal(28,12) products, so the doubles are bit-identical
    val gotSet = got.as[(Long, Long, Double, Int)].collect().toSet
    val wantSet = want.as[(Long, Long, Double, Int)].collect().toSet
    assert(gotSet == wantSet,
      s"index path diverged: only-got=${(gotSet -- wantSet).take(3)} " +
        s"only-want=${(wantSet -- gotSet).take(3)}")

    // partition pruning: the corpus scan carries the probed-cells filter
    // as a PartitionFilter (file-index pruning, not a post-scan filter)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n"))

    // rebuild publishes a fresh immutable version dir — in-flight readers
    // of v1 are undisturbed, and the new reader answers identically
    assert(IvfIndex.build(emb, "vec_id", "embedding", "label", root) == 2)
    assert(IvfIndex.topK(spark, root, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 5).as[(Long, Long, Double, Int)]
      .collect().toSet == gotSet)
  }
}
