package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.StableAgg._

/** Persisted IVF (inverted-file) index for embedding search — the
  * build-once / probe-many form of the s02 in-memory IVF plan.
  *
  * At 100 TB the corpus cannot be re-quantized per query: the index is
  * materialized once as
  *
  * {{{
  * root/
  *   v00001/                            one immutable dir per build,
  *     vectors/cell=<c>/part-*.parquet  corpus PARTITIONED by cell,
  *                                      norms precomputed
  *     centroids/part-*.parquet         one mean vector + norm per cell
  *   v00002/                            rebuild = fresh dir + one rename
  * }}}
  *
  * and a query then (1) broadcasts the tiny centroid table, (2) ranks
  * cells per query vector, (3) reads ONLY the probed cells' partitions —
  * the `cell isin (...)` filter prunes at the parquet partition level, so
  * a 2-probe query over an nlist-cell index touches ~2/nlist of the data
  * no matter how large the corpus grows. Scoring reuses the exact
  * decimal-accumulated dot/norm kernels ([[Similarity.dot]]), so results
  * are bit-identical to the in-memory s02 plan (`IvfIndexSpec` pins
  * equality) and order-independent across partitionings.
  *
  * The cell assignment is caller-provided (here: the corpus `label`; in
  * general a k-means assignment computed upstream) — the index layout and
  * probe mechanics are the same either way.
  */
object IvfIndex {

  private val VersionRe = raw"v(\d{5})".r

  private def newestVersion(spark: SparkSession, root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).flatMap(_.getPath.getName match {
      case VersionRe(v) => Some(v.toInt)
      case _ => None
    }).foldLeft(0)(math.max)
  }

  private def versionDir(root: String, v: Int) = f"$root/v$v%05d"
  private def vectorsPath(root: String, v: Int) = s"${versionDir(root, v)}/vectors"
  private def centroidsPath(root: String, v: Int) = s"${versionDir(root, v)}/centroids"

  /** Build (or rebuild) the index: cell-partitioned corpus with
    * precomputed norms + per-cell mean centroids (decimal-exact means,
    * so the build is deterministic for any partitioning). Each build
    * writes a fresh `v<N>` directory and publishes it with one rename —
    * readers of the previous version are undisturbed (and never see a
    * stale file listing for an overwritten path), a crash before the
    * rename leaves the old index intact, and versions older than the
    * previous one are pruned. Returns the published version.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String, cellCol: String,
      root: String): Int = {
    val spark = corpus.sparkSession
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = newestVersion(spark, root) + 1
    val tmp = new org.apache.hadoop.fs.Path(rootP,
      s"tmp-${java.util.UUID.randomUUID()}")
    val v = corpus.select(col(idCol).as("vec_id"), col(cellCol).as("cell"),
      col(vecCol).as("emb"))
      .withColumn("ns", Similarity.normSq(col("emb")))
    v.write.partitionBy("cell").parquet(s"$tmp/vectors")
    val ex = v.select(col("cell"), posexplode(col("emb")).as(Seq("pos", "val0")))
      .withColumn("val", col("val0").cast("double"))
    val cent = ex.groupBy(col("cell"), col("pos"))
      .agg((dsum(col("val"), 12) / count(col("val"))).as("cval"))
    val centArr = cent.groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cval")))),
        s => s.getField("cval")).as("cent"))
      .withColumn("cns", Similarity.normSq(col("cent")))
    centArr.write.parquet(s"$tmp/centroids")
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(versionDir(root, next))))
      sys.error(s"concurrent index build: version $next already published at $root")
    // retain newest + previous (in-flight readers); prune older
    (1 until next - 1).foreach(old =>
      fs.delete(new org.apache.hadoop.fs.Path(versionDir(root, old)), true))
    next
  }

  /** Top-k by cosine for each query vector, probing the `probes` nearest
    * cells. The probed-cell list is control-plane-small (≤ queries ×
    * probes values), so collecting it to build the partition-pruning
    * filter is not a driver bottleneck.
    */
  def topK(spark: SparkSession, root: String, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, probes: Int = 2): DataFrame = {
    val ver = newestVersion(spark, root)
    require(ver > 0, s"no published index at $root")
    val cent = spark.read.parquet(centroidsPath(root, ver))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_emb"))
      .withColumn("q_ns", Similarity.normSq(col("q_emb")))
    // probe selection: queries × centroids is (small × small)
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("c_cos").desc, col("cell"))
    val probed = q.crossJoin(broadcast(cent))
      .withColumn("c_cos", Similarity.cosine(
        Similarity.dot(col("q_emb"), col("cent")), col("q_ns"), col("cns")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= probes)
      .select(col("q_id"), col("q_emb"), col("q_ns"), col("cell"))
    val cells = probed.select("cell").distinct().collect().map(_.get(0))
    // the isin filter prunes whole cell partitions at the file index —
    // IvfIndexSpec pins PartitionFilters on this scan
    val corpus = spark.read.parquet(vectorsPath(root, ver))
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
    val scored = broadcast(probed).join(corpus, "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", Similarity.cosine(
        Similarity.dot(col("q_emb"), col("emb")), col("q_ns"), col("ns")))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cosine"), col("rank"))
  }
}
