package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Embedding similarity search (SURVEY.md §2.H): brute-force cosine
  * top-k as the exact baseline, IVF (inverted-file, coarse-quantizer
  * probing) as the scale path.
  *
  * Numeric discipline: dot products and norms accumulate per-element
  * products as fixed-scale decimals (exact, order-independent — see
  * graft.functions.StableAgg) and only the final ratio is a double, so
  * rankings are reproducible across engines, AQE re-plans, and cluster
  * sizes. Floats are widened to double *before* multiplying (a 24-bit ×
  * 24-bit product is exact in double).
  */
object Similarity {

  // 28,12 not 38,12: decimal addition at the 38-precision cap forces
  // Spark to drop a scale digit per step (allowPrecisionLoss), which
  // would silently re-round the accumulator. At (28,12), (28,12)+(28,12)
  // → (29,12) stays exact and the cast back is lossless.
  private val Dec = DecimalType(28, 12)
  private def dzero: Column = lit(java.math.BigDecimal.ZERO).cast(Dec)

  /** Exact decimal-accumulated dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      dzero,
      (acc, x) => (acc + x.cast(Dec)).cast(Dec)).cast("double")

  /** Exact decimal-accumulated squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      dzero,
      (acc, x) => (acc + x.cast(Dec)).cast(Dec)).cast("double")

  /** Cosine similarity from precomputed squared norms. */
  def cosine(dotCol: Column, normSqA: Column, normSqB: Column): Column =
    dotCol / (sqrt(normSqA) * sqrt(normSqB))

  /** Fast double-fold dot product — used only as a conservative
    * prefilter (its deviation from the exact decimal dot is bounded by
    * ~64·ulp, far below the filter margin).
    */
  def dotApprox(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** All pairs with cosine ≥ threshold — the embedding near-dup
    * operator. Two-phase: a cheap double-arithmetic dot prunes the n²
    * pair space with a safety margin, then the exact decimal cosine is
    * recomputed only for survivors (a tiny set at any real threshold),
    * so the published values stay order-independent and
    * oracle-reproducible while the hot loop stays primitive-typed. At
    * corpus scale restrict the pair space first with `ivfTopK`-style
    * bucketing or sign-bit sketching.
    */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = emb.select(col(idCol).as("vec_id"), col(vecCol).as("emb"))
      .withColumn("ns", normSq(col("emb")))
    // corpus tables often arrive as one file → one partition; spread the
    // streaming side so the O(n²) probe uses every core/executor
    val par = emb.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val a = v.repartition(par)
      .select(col("vec_id").as("va"), col("emb").as("ea"), col("ns").as("na"))
    val b = v.select(col("vec_id").as("vb"), col("emb").as("eb"), col("ns").as("nb"))
    a.join(b, col("va") < col("vb"))
      .withColumn("cos_approx", cosine(dotApprox(col("ea"), col("eb")), col("na"), col("nb")))
      .filter(col("cos_approx") >= threshold - 1e-6)
      .withColumn("cosine", cosine(dot(col("ea"), col("eb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select("va", "vb", "cosine")
  }

  /** Brute-force cosine top-k: each query row against the whole corpus,
    * rank by similarity (deterministic id tie-break). The query side is
    * broadcast — the corpus streams through map tasks untouched, which
    * is the right baseline shape at 100 TB (one pass, no corpus
    * shuffle).
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_emb"))
      .withColumn("q_ns", normSq(col("q_emb"))))
    val par = corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val c = corpus.repartition(par)
      .select(col(idCol).as("n_id"), col(vecCol).as("n_emb"))
      .withColumn("n_ns", normSq(col("n_emb")))
    val scored = q.join(c, col("q_id") =!= col("n_id"))
      .withColumn("cosine", cosine(dot(col("q_emb"), col("n_emb")), col("q_ns"), col("n_ns")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "cosine", "rank")
  }
}
