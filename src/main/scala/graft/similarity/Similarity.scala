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

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * md5-derived integer in [-1e6, 1e6]. The md5 discipline (same as the
    * MinHash band salts in graft.dedup) makes the "random" projection
    * replayable bit-for-bit in any engine with md5 — the property that
    * lets a DuckDB oracle reproduce the exact candidate set.
    */
  private def planeWeight(p: Column, i: Column): Column =
    (conv(substring(md5(concat(p.cast("string"), lit("_"), i.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 2000001L - 1000000L).cast("double")

  /** Banded sign-bit LSH near-dup pairs — the embedding near-dup
    * operator at scale (SURVEY.md §2.H). Candidate generation is a
    * bucket equi-join on (band, band-hash) — the same recall/precision
    * split as the MinHash-LSH dedup (graft.dedup.Dedup.minhashLshPairs):
    * LSH proposes, the exact decimal cosine disposes. No operator in the
    * plan touches the n² pair space; the join is a shuffled hash/sort
    * join on band keys, never a nested-loop/theta join.
    *
    * Tuning math (Goemans–Williamson): P[sign bits agree] =
    * 1 − θ/π where θ = arccos(cosine). At a true near-dup threshold
    * (0.9+, θ ≤ 26°) a bit agrees with p ≥ 0.856 while random pairs
    * agree at only p ≈ 0.5 per bit — so widening a band sharpens
    * precision exponentially faster than it erodes recall, and recall
    * is then bought back with more bands. Below cosine ≈ 0.6 sign-bit
    * LSH cannot separate near-dups from noise (p_bit ≈ 0.63 vs 0.5) —
    * that regime is not a near-dup problem and callers should use
    * `bruteCosinePairs` or an IVF restriction instead.
    *
    * `bucketCap` drops pathological hot buckets (all-zero vectors, mass
    * duplicates) exactly like the df-cap on the shingle inverted index —
    * cost tracks genuine collisions, never a skew blowup.
    */
  /** Per-vector squared norms of a (vec_id, emb) frame — decimal-exact.
    * Shared by the pairs operator and the embedding store.
    */
  private[similarity] def normsOf(base: DataFrame): DataFrame =
    base.select(col("vec_id"), posexplode(col("emb")).as(Seq("pos", "val0")))
      .withColumn("val", col("val0").cast("double"))
      .groupBy(col("vec_id"))
      .agg(sum((col("val") * col("val")).cast(Dec)).cast("double").as("ns"))

  /** Banded sign-bit signatures of a (vec_id, emb) frame:
    * (vec_id, band, band_hash). Signatures via explode + broadcast
    * weight table + codegen'd decimal hash aggregation — NOT per-plane
    * array-HOF folds. Higher-order functions are CodegenFallback
    * (interpreted): measured 8× slower once other queries in the JVM
    * pollute the shared interpreted-eval JIT profiles (69 s vs 8 s for
    * the same plan), and never whole-stage-compiled even alone. The
    * exploded form computes the SAME decimal(28,12) products and exact
    * order-independent sums — sign bits, buckets, and published
    * cosines are bit-identical, so the DuckDB oracle is unaffected.
    * The md5 hyperplane weights are corpus-INDEPENDENT (a pure function
    * of (plane, pos)), which is what lets a store's history bands and a
    * later batch's bands agree by construction.
    */
  private[similarity] def signBitBands(base: DataFrame, dims: Int,
      planes: Int, bandBits: Int): DataFrame = {
    require(planes % bandBits == 0, "planes must divide into whole bands")
    val spark = base.sparkSession
    val ex = base.select(col("vec_id"), posexplode(col("emb")).as(Seq("pos", "val0")))
      .withColumn("val", col("val0").cast("double"))
    // (plane, pos) → md5 weight: a planes×dim control-plane table, each
    // weight evaluated once and broadcast (vs once per vector element)
    val weights = spark.range(planes.toLong * dims).select(
        floor(col("id") / dims).cast("int").as("plane"),
        pmod(col("id"), lit(dims)).cast("int").as("pos"))
      .withColumn("w", planeWeight(col("plane"), col("pos")))
    val proj = ex.join(broadcast(weights), "pos")
      .groupBy(col("vec_id"), col("plane"))
      .agg(sum((col("w") * col("val")).cast(Dec)).as("proj"))
    // band hash = the band's sign bits packed little-endian
    proj.select(col("vec_id"),
        floor(col("plane") / bandBits).cast("int").as("band"),
        when(col("proj") >= 0, expr(s"shiftleft(1, plane % $bandBits)"))
          .otherwise(lit(0)).as("bit"))
      .groupBy(col("vec_id"), col("band"))
      .agg(sum(col("bit")).cast("int").as("band_hash"))
  }

  /** Adaptive band geometry — the fix for the measured quadratic
    * candidate term of a FIXED key space (SCALECHECK r12: 4×8-bit bands
    * = 1,024 keys → d05's candidate shuffle grew 69× for 10× data; the
    * same saturation the 4×16-bit SimHash rework cured for d04).
    *
    * `bandBitsFor`: the band width r is the smallest r ∈ [8, 30] with
    * 2^r ≥ n. Random pairs (p_bit ≈ 0.5) then collide at ≈ n²/2^r ≤ n
    * expected candidates per band — the collision term is LINEAR in
    * corpus size by construction, at any n, instead of quadratic over a
    * saturated key space.
    *
    * `bandsFor`: widening a band erodes recall (a true pair must agree
    * on ALL r bits of some band), so the band count b buys it back:
    * b = ceil(ln(1/δ) / −ln(1 − p^r)) with miss budget δ = 1e-3 at the
    * reference similarity s* = 0.99 (p = 1 − arccos(0.99)/π ≈ 0.955).
    * The table is PINNED as literals (not computed with floating
    * transcendentals at runtime) so the Scala plan and a replaying SQL
    * oracle can never disagree by an ulp at a ceil boundary. Projection
    * cost is b·r planes per vector — it grows ~log²(n), the honest
    * price of constant recall with linear candidates.
    */
  private val BandsByBits: Vector[Int] =
    Vector(6, 7, 7, 8, 9, 9, 10, 10, 11, 12, 13, 13, 14, 15, 16, 17, 18,
      19, 20, 21, 22, 23, 24) // index r−8, r = 8..30
  def bandBitsFor(n: Long): Int = (8 to 30).find(r => (1L << r) >= n).getOrElse(30)
  def bandsFor(bandBits: Int): Int = BandsByBits(bandBits - 8)
  /** (planes, bandBits) for a corpus of `n` vectors. */
  def lshSpecFor(n: Long): (Int, Int) = {
    val r = bandBitsFor(n); (bandsFor(r) * r, r)
  }

  /** One-row bucket-histogram audit of the banded LSH key space:
    * (n_vectors, geometry, occupied buckets, buckets/rows the cap would
    * drop, max occupancy). Cap drops are a RECALL loss and must never
    * be silent — this is the guaranteed accounting path: a production
    * dedup run executes it alongside `lshCosinePairs` (same adaptive
    * geometry ⇒ same buckets) and files the counts in its run report.
    * The inline `observer` hook on `lshCosinePairs` is cheaper (zero
    * extra jobs) but best-effort: AQE's empty-relation propagation can
    * prune the observed node out of a plan whose candidate set turns
    * out empty, losing the metrics — an audit query's own action can
    * never lose its result.
    */
  def lshBucketAudit(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int = 0, bandBits: Int = 0, bucketCap: Int = 1000): DataFrame = {
    require((planes == 0) == (bandBits == 0),
      "pass both planes and bandBits explicitly, or neither (adaptive)")
    val spark = emb.sparkSession
    val base = emb.select(col(idCol).as("vec_id"), col(vecCol).as("emb"))
    val probe = base.agg(count(lit(1)), max(size(col("emb")))).head()
    val n = probe.getLong(0)
    if (probe.isNullAt(1)) {
      import spark.implicits._
      return Seq((0L, 0, 0, 0L, 0L, 0L, 0L))
        .toDF("n_vectors", "planes", "band_bits", "occupied_buckets",
          "capped_buckets", "capped_rows", "max_bucket")
    }
    val (pl, bb) = if (planes > 0) (planes, bandBits) else lshSpecFor(n)
    signBitBands(base, probe.getInt(1), pl, bb)
      .groupBy("band", "band_hash").count()
      .agg(lit(n).as("n_vectors"), lit(pl).as("planes"), lit(bb).as("band_bits"),
        count(lit(1)).as("occupied_buckets"),
        sum(when(col("count") > bucketCap, 1L).otherwise(0L)).as("capped_buckets"),
        sum(when(col("count") > bucketCap, col("count")).otherwise(0L)).as("capped_rows"),
        max(col("count")).as("max_bucket"))
  }

  def lshCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 0, bandBits: Int = 0,
      bucketCap: Int = 1000,
      observer: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require((planes == 0) == (bandBits == 0),
      "pass both planes and bandBits explicitly, or neither (adaptive)")
    val spark = emb.sparkSession
    val par = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = emb.repartition(par)
      .select(col(idCol).as("vec_id"), col(vecCol).as("emb"))
    val ns = normsOf(base)
    val v = base.join(ns, "vec_id")
    // one control-plane probe: corpus size (drives the adaptive band
    // geometry) and width. An empty corpus (a plausible daily slice)
    // has no max — return the empty pair set instead of NPE-ing.
    val probe = base.agg(count(lit(1)), max(size(col("emb")))).head()
    if (probe.isNullAt(1))
      return base.select(col("vec_id").as("va"), col("vec_id").as("vb"),
        lit(0.0).as("cosine")).limit(0)
    val dims = probe.getInt(1)
    val (pl, bb) =
      if (planes > 0) (planes, bandBits) else lshSpecFor(probe.getLong(0))
    require(pl % bb == 0, "planes must divide into whole bands")
    val sig = signBitBands(base, dims, pl, bb)
    val counted = sig.groupBy("band", "band_hash").count()
    // inline drop accounting (zero extra jobs, but best-effort under
    // AQE empty-relation propagation — see lshBucketAudit for the
    // guaranteed path)
    val countedObs = observer.map(o => counted.observe(o,
        sum(when(col("count") > bucketCap, 1L).otherwise(0L)).as("capped_buckets"),
        sum(when(col("count") > bucketCap, col("count")).otherwise(0L)).as("capped_rows")))
      .getOrElse(counted)
    val ok = countedObs.filter(col("count") <= bucketCap).select("band", "band_hash")
    val sigOk = sig.join(ok, Seq("band", "band_hash"))
    val cand = sigOk.select(col("band"), col("band_hash"), col("vec_id").as("va"))
      .join(sigOk.select(col("band"), col("band_hash"), col("vec_id").as("vb")),
        Seq("band", "band_hash"))
      .filter(col("va") < col("vb"))
      .select("va", "vb").distinct()
    val a = v.select(col("vec_id").as("va"), col("emb").as("ea"), col("ns").as("na"))
    val b = v.select(col("vec_id").as("vb"), col("emb").as("eb"), col("ns").as("nb"))
    // cheap double-fold dot prunes the candidate set with a safety margin
    // (deviation from the exact decimal dot is ~64·ulp ≪ 1e-6), then the
    // exact decimal cosine runs only on survivors — the published values
    // stay order-independent and oracle-reproducible
    cand.join(a, "va").join(b, "vb")
      .withColumn("cos_approx",
        cosine(dotApprox(col("ea"), col("eb")), col("na"), col("nb")))
      .filter(col("cos_approx") >= threshold - 1e-6)
      .withColumn("cosine", cosine(dot(col("ea"), col("eb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select("va", "vb", "cosine")
  }

  /** All pairs with cosine ≥ threshold — brute-force baseline, O(n²)
    * candidate generation. Test-scale/verification use only: the shipped
    * near-dup operator is `lshCosinePairs`, whose banded candidates keep
    * the pair space sub-quadratic. Two-phase: a cheap double-arithmetic
    * dot prunes the pair space with a safety margin, then the exact
    * decimal cosine is recomputed only for survivors, so the published
    * values stay order-independent and oracle-reproducible while the hot
    * loop stays primitive-typed.
    */
  def bruteCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
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
  /** Scalar-quantized (SQ8) top-k: the corpus is compressed to one
    * int8 code per dimension against per-dimension [min, max] ranges,
    * and queries score against the DEQUANTIZED midpoints (asymmetric
    * distance — the query side stays full-precision, so quantization
    * error enters once, not twice). This is the standard 4× memory/IO
    * reduction step for a 100 TB embedding corpus: ranges are d
    * numbers (a one-row broadcast anchor), codes shrink the scan, and
    * the query plan is otherwise the brute top-k single corpus pass.
    *
    * Everything is deterministic double arithmetic with the same
    * operation order on both engines (mins/maxes are exact float
    * selections, `floor` has no rounding ties to disagree on), so the
    * DuckDB oracle replays codes, reconstruction, and cosines
    * bit-for-bit.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val ex = corpus.select(posexplode(col(vecCol)).as(Seq("pos", "v0")))
      .select(col("pos"), col("v0").cast("double").as("v"))
    // per-dim ranges packed into two pos-ordered arrays: a one-row
    // control-plane anchor (d values), broadcast-cross-joined like the
    // cube queries' max-date anchors
    val packed = ex.groupBy("pos").agg(min("v").as("mn"), max("v").as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          s => s.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s.getField("mx")).as("mxs"))
    def mnAt(i: Column) = element_at(col("mns"), i + 1)
    def mxAt(i: Column) = element_at(col("mxs"), i + 1)
    val codes = transform(col("n_emb"), (x, i) =>
      when(mxAt(i) > mnAt(i),
        least(lit(255), greatest(lit(0),
          floor((x.cast("double") - mnAt(i)) * 255.0 / (mxAt(i) - mnAt(i))))))
        .otherwise(lit(0L)))
    val recon = transform(col("n_codes"), (cde, i) =>
      mnAt(i) + (cde.cast("double") + 0.5) * (mxAt(i) - mnAt(i)) / 255.0)
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_emb"))
      .crossJoin(broadcast(packed))
      .withColumn("n_codes", codes)
      .withColumn("n_rvec", recon)
      .withColumn("n_ns", normSq(col("n_rvec")))
      .select("n_id", "n_rvec", "n_ns")
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_emb"))
      .withColumn("q_ns", normSq(col("q_emb"))))
    val scored = q.join(c, col("q_id") =!= col("n_id"))
      .withColumn("cosine_sq8",
        cosine(dot(col("q_emb"), col("n_rvec")), col("q_ns"), col("n_ns")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine_sq8").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "cosine_sq8", "rank")
  }

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
