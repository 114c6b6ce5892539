package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, StoreGuard}

/** Persisted sign-bit LSH store for INCREMENTAL embedding near-dup —
  * the embedding twin of [[graft.dedup.SignatureStore]], and the only
  * affordable cadence once the embedded corpus outgrows per-batch
  * re-banding: the history is banded ONCE into bucketed tables, each
  * daily batch dedupes against it by shuffling INTO the store's
  * bucketing (the history side is read pre-partitioned and never moves
  * again), and survivors append O(batch)/day.
  *
  * Two bucketed managed tables per store (plus a one-row spec table so
  * probes can never drift from the build parameters):
  *  - `<name>_ebands` (vec_id, band, band_hash, band_key) bucketed by
  *    `band_key` — the LSH candidate join key;
  *  - `<name>_evecs`  (vec_id, emb array<double>, ns) bucketed by
  *    `vec_id` — the exact decimal-cosine re-verify side (vectors kept
  *    full-precision: LSH proposes, the exact cosine disposes, same
  *    recall/precision split as [[Similarity.lshCosinePairs]]).
  *
  * The md5 hyperplane weights are a pure function of (plane, pos)
  * ([[Similarity.signBitBands]]), so history bands and any later
  * batch's bands agree BY CONSTRUCTION — cross-corpus collisions are
  * exactly what full-corpus LSH would produce, with no stored
  * projection state beyond the spec row.
  *
  * Writer safety is [[StoreGuard]]'s single-writer discipline (lock
  * file, generation markers, pending-snapshot crash recovery) — the
  * same guarantees as the signature store.
  */
object EmbeddingStore {

  /** Unique suffix for ingest's observed-metric names — observations
    * are matched per query execution; a reused name across concurrent
    * queries could cross-wire.
    */
  private val obsId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Band geometry. The default (0, 0) means DERIVE from the history
    * size at build time via [[Similarity.lshSpecFor]] — the adaptive
    * key space that keeps the candidate join's collision term linear in
    * corpus size (a fixed 4×8-bit space measured 49× shuffle growth for
    * 10× data in SCALECHECK r12). The RESOLVED values are pinned in
    * `_emeta`, and every later ingest/probe reads them back from there,
    * so a store never changes geometry mid-life: history bands and any
    * later batch's bands agree by construction.
    */
  final case class Spec(planes: Int = 0, bandBits: Int = 0) {
    require((planes == 0) == (bandBits == 0),
      "pass both planes and bandBits, or neither (derive from history size)")
    def resolve(n: Long): Spec =
      if (planes > 0) this
      else { val (p, r) = Similarity.lshSpecFor(n); Spec(p, r) }
  }

  /** Per-ingest LSH bucket accounting — the production form of
    * [[Similarity.lshBucketAudit]]'s contract that cap drops are a
    * recall loss and MUST NOT be silent. Occupancies are over the
    * band_keys the batch touches, counting batch AND stored members
    * (the combined corpus a full-corpus LSH would hash into those
    * buckets); `cappedBuckets`/`cappedRows` are what the ingest's
    * candidate generation actually skipped. Delivered through ingest's
    * `onAudit` hook; since r20 the aggregates ride the occupancy
    * checkpoint's job as observed metrics WITH an explicit recompute
    * fallback ([[graft.dedup.Overlap.observedRow]]) — observe alone is
    * best-effort under AQE empty-relation propagation (SURVEY note 23),
    * so the fallback job keeps the counts lossless while the happy path
    * stops paying a separate agg().head() job. The orchestrated
    * cadences file them in the run report/notification.
    */
  final case class IngestAudit(nBatch: Long, planes: Int, bandBits: Int,
      occupiedBuckets: Long, cappedBuckets: Long, cappedRows: Long,
      maxBucket: Long, bucketCap: Long = 0L) {
    def json: String =
      s"""{"n_batch":$nBatch,"planes":$planes,"band_bits":$bandBits,""" +
        s""""occupied_buckets":$occupiedBuckets,"capped_buckets":$cappedBuckets,""" +
        s""""capped_rows":$cappedRows,"max_bucket":$maxBucket,""" +
        s""""bucket_cap":$bucketCap}"""
  }

  def bandsTable(name: String): String = s"${name}_ebands"
  def vecsTable(name: String): String = s"${name}_evecs"
  def metaTable(name: String): String = s"${name}_emeta"

  private def allTables(name: String): Seq[String] =
    Seq(bandsTable(name), vecsTable(name), metaTable(name))

  private def guard(name: String): StoreGuard =
    StoreGuard(metaTable(name), allTables(name))

  /** LSH kernel version the store's bands were hashed with. Stores
    * created before the column existed default to 1 (the exact-decimal
    * projection kernel) — their `_emeta` parquet lacks the field, so a
    * catalog-declared `kernel` column reads back null.
    */
  private def kernelOf(meta: org.apache.spark.sql.Row): Int = {
    val i = meta.schema.fieldNames.indexOf("kernel")
    if (i >= 0 && !meta.isNullAt(i)) meta.getInt(i) else 1
  }

  /** Bands hashed by an older kernel would miss a current batch's twins
    * SILENTLY (the join keys just stop colliding) — refuse loudly and
    * point at the rewrite that heals it.
    */
  private def requireCurrentKernel(name: String, meta: org.apache.spark.sql.Row): Unit = {
    val k = kernelOf(meta)
    require(k == Similarity.LshKernelVersion,
      s"embedding store '$name' was banded with LSH kernel v$k; this engine " +
        s"hashes with v${Similarity.LshKernelVersion}, so batch bands would " +
        "silently miss stored near-dups — run reband " +
        "(Runner --maintain-store-emb) to rewrite the bands first")
  }

  /** The one spec row every probe reads back — geometry, bucketing,
    * width, and the banding-kernel version all pinned together.
    *
    * An EXISTING meta table is rewritten with INSERT OVERWRITE
    * (`insertInto`), never `saveAsTable(Overwrite)`: the table identity
    * must survive the rewrite. In the JVM that built the store the
    * entry is MANAGED and either form works — but after a fresh JVM's
    * [[ensureRegistered]] the entry is EXTERNAL (`CREATE TABLE ...
    * LOCATION`), and saveAsTable's overwrite DROPS that entry (leaving
    * the external files in place) then refuses to create a managed
    * table over the surviving location — LOCATION_ALREADY_EXISTS,
    * killing every cross-JVM reband/compact (found by the r17 CLI
    * remediation proof: the cron-cadence sweep runs in a fresh JVM by
    * design, so the monthly reband ALWAYS hit this in production shape).
    */
  private def writeMeta(spark: SparkSession, name: String, spec: Spec,
      buckets: Int, dims: Int): Unit = {
    import spark.implicits._
    val df = Seq((spec.planes, spec.bandBits, buckets, dims, Similarity.LshKernelVersion))
      .toDF("planes", "band_bits", "buckets", "dims", "kernel")
    val t = metaTable(name)
    if (spark.catalog.tableExists(t) &&
        spark.table(t).schema.fieldNames.sameElements(df.schema.fieldNames))
      df.write.mode("overwrite").insertInto(t)
    else {
      // schema evolution (a pre-kernel 4-column meta being upgraded) or
      // no live entry: replace the table outright — resetTable clears
      // BOTH the catalog entry and the warehouse location, so the
      // create never refuses over a surviving dir (an orphaned meta dir
      // from another JVM would otherwise be LOCATION_ALREADY_EXISTS too)
      StoreGuard.resetTable(spark, t)
      df.write.mode("overwrite").format("parquet").saveAsTable(t)
    }
  }

  /** `<meta-dir>.rebanding` sibling marker: present exactly while a
    * reband's commit sequence may have the bands table and `_emeta`
    * DISAGREEING on geometry (bands rewritten, meta not yet
    * overwritten). Without it that crash window is silent: probe is
    * lock-free and ingest's band keys simply stop colliding with the
    * stored bands — zero matches, no error. A sibling of the meta dir
    * (like the lock and pending files) so no table rewrite can delete
    * it; re-running reband completes the sequence and clears it.
    */
  private def rebandMarkerPath(spark: SparkSession, name: String): org.apache.hadoop.fs.Path = {
    val m = StoreGuard.tableLocation(spark, metaTable(name))
    new org.apache.hadoop.fs.Path(m.getParent, m.getName + ".rebanding")
  }
  private def rebandInFlight(spark: SparkSession, name: String): Boolean = {
    val p = rebandMarkerPath(spark, name)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
  private def setRebandMarker(spark: SparkSession, name: String, on: Boolean): Unit = {
    val p = rebandMarkerPath(spark, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (on) { fs.mkdirs(p.getParent); fs.createNewFile(p); () }
    else { fs.delete(p, false); () }
  }

  /** Refuse to band a batch (or probe) while an unfinished reband may
    * have left bands and meta on different geometries — banding with
    * the stale spec would MISS stored near-dups silently.
    */
  private def requireNoRebandWindow(spark: SparkSession, name: String): Unit =
    require(!rebandInFlight(spark, name),
      s"embedding store '$name' has an unfinished reband " +
        s"(${rebandMarkerPath(spark, name)}): the bands table and _emeta may " +
        "disagree on band geometry, so batch bands could silently miss stored " +
        "near-dups — re-run reband (Runner --maintain-store-emb) to complete " +
        "it (recover/unlock first if the writer died holding the lock)")

  def snapshot(spark: SparkSession, name: String): Set[String] =
    guard(name).snapshot(spark)
  def rollback(spark: SparkSession, name: String, snap: Set[String]): Unit =
    guard(name).rollback(spark, snap)
  def recover(spark: SparkSession, name: String): Boolean =
    guard(name).recover(spark)
  /** Owner-arbitrated recovery for automated callers — see
    * [[graft.dedup.StoreGuard.recoverArbitrated]].
    */
  def recoverArbitrated(spark: SparkSession, name: String): Boolean =
    guard(name).recoverArbitrated(spark)
  def locked[A](spark: SparkSession, name: String)(f: => A): A =
    guard(name).locked(spark)(f)

  /** Re-register the store's durable bucketed tables into THIS
    * session's catalog (the catalog is per-process, the data is not) —
    * the cross-JVM daily-CLI cadence, same contract as
    * [[graft.dedup.SignatureStore.ensureRegistered]].
    */
  def ensureRegistered(spark: SparkSession, name: String): Unit = {
    if (allTables(name).forall(spark.catalog.tableExists)) return
    val conf = spark.sparkContext.hadoopConfiguration
    def loc(t: String): org.apache.hadoop.fs.Path =
      new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(t)))
    val metaP = loc(metaTable(name))
    require(metaP.getFileSystem(conf).exists(metaP),
      s"no embedding store '$name' on disk at $metaP — build/corpusInitEmbeddings it first")
    def register(t: String, bucketCol: Option[String], fallback: String,
        buckets: => Int): Unit =
      if (!spark.catalog.tableExists(t)) {
        val p = loc(t)
        val cols =
          // missing-dir fallback mirrors SignatureStore.ensureRegistered:
          // a compactor dead between reset and swap leaves the only copy
          // in the `__compacting` sibling — register the canonical
          // layout so compact()'s resume branch stays reachable
          try spark.read.parquet(p.toString).schema.fields
            .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
          catch { case e: Exception if e.getMessage != null &&
              (e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
               e.getMessage.contains("PATH_NOT_FOUND") ||
               e.getMessage.contains("Path does not exist")) => fallback }
        val cluster = bucketCol
          .map(c => s"CLUSTERED BY (`$c`) SORTED BY (`$c`) INTO $buckets BUCKETS")
          .getOrElse("")
        spark.sql(s"CREATE TABLE `$t` ($cols) USING parquet $cluster LOCATION '$p'")
      }
    register(metaTable(name), None,
      "`planes` INT, `band_bits` INT, `buckets` INT, `dims` INT, `kernel` INT", 0)
    lazy val buckets = spark.table(metaTable(name)).head().getAs[Int]("buckets")
    register(bandsTable(name), Some("band_key"),
      "`vec_id` BIGINT, `band` INT, `band_hash` INT, `band_key` STRING", buckets)
    register(vecsTable(name), Some("vec_id"),
      "`vec_id` BIGINT, `emb` ARRAY<DOUBLE>, `ns` DOUBLE", buckets)
  }

  /** Maintenance compaction (`Runner --maintain-store-emb`): rewrite the
    * bands and vectors tables down to ~`buckets` files each without
    * changing content — the same cadence and guarantees as
    * [[graft.dedup.SignatureStore.compact]] (single-writer lock, one
    * generation bump after both swaps, pre-compaction snapshots become
    * non-rollbackable by rollback's missing-file refusal).
    */
  def compact(spark: SparkSession, name: String): Unit = locked(spark, name) {
    val buckets = spark.table(metaTable(name)).head().getAs[Int]("buckets")
    Seq(bandsTable(name) -> "band_key", vecsTable(name) -> "vec_id")
      .foreach { case (t, c) => StoreGuard.compactTable(spark, t, c, buckets) }
    guard(name).bumpGen(spark)
  }

  /** Maintenance RE-BANDING: re-derive the band geometry from the
    * store's CURRENT size and rewrite the bands table from the stored
    * full-precision vectors. This is the one cost the build-time pin
    * cannot bound: the spec is frozen when the history is banded, so a
    * store that grows far past its build size sees its cross-store
    * candidate term grow ≈ history/2^r per batch — re-banding widens
    * the key space back to the adaptive envelope. No corpus rescan:
    * `_evecs` holds full-precision vectors, so this is one narrow
    * kernel pass + one bucketed write (which also lands the bands
    * table at the file floor). Returns true when a rewrite happened;
    * no-op (false) when the derived geometry equals the pinned one.
    *
    * Crash contract (a REBUILD-class mutation, like `build`): the slow
    * staging writes to a `__rebanding` scratch sibling first; the
    * commit sequence (reset → rename → re-declare → meta overwrite →
    * gen bump) is short, and a compactor never resumes it (different
    * staged suffix) — a re-run of reband itself heals: on entry, a
    * staged sibling holding the only copy of the bands is swapped in
    * before the (idempotent) meta re-derivation. Pre-reband snapshots
    * become non-rollbackable (band files are deleted, and the meta
    * overwrite restarts the generation history — both rollback gates
    * refuse loudly, same as after a `build`).
    */
  def reband(spark: SparkSession, name: String): Boolean = locked(spark, name) {
    val bandsT = bandsTable(name)
    val meta = spark.table(metaTable(name)).head()
    val spec = Spec(meta.getAs[Int]("planes"), meta.getAs[Int]("band_bits"))
    val buckets = meta.getAs[Int]("buckets")
    val dims = meta.getAs[Int]("dims")
    val n = spark.table(vecsTable(name)).count()
    val spec2 = Spec().resolve(n)
    // outgrown geometry OR a banding-arithmetic upgrade: both mean the
    // stored bands no longer match what this engine would hash, and
    // both are cured by the same vectors-to-bands rewrite
    val outdated = spec2 != spec || kernelOf(meta) != Similarity.LshKernelVersion
    // the `.rebanding` marker brackets the whole mutation: from before
    // the bands rewrite until AFTER the meta overwrite, bands and meta
    // may disagree on geometry — ingest/probe refuse while it exists
    // (requireNoRebandWindow) instead of silently missing matches. A
    // dead rebander's marker survives its crash; this re-run completes
    // the sequence and clears it below.
    if (n > 0 && outdated) setRebandMarker(spark, name, on = true)
    // an EMPTY store has no bands to rewrite (and a zero-file bucketed
    // write stages no readable parquet — compactTable's floor guards
    // the same edge): skip the swap, re-pin the meta below
    val swapped = n > 0 && StoreGuard.stagedSwap(spark, bandsT,
        s"${bandsT}__rebanding", "band_key", buckets, needed = outdated) { staged =>
      // a dead rebander's staged sibling holding the ONLY copy resumes
      // inside stagedSwap (the bands content is already the DERIVED
      // spec — the meta re-derivation below recommits it)
      bandsOf(spark.table(vecsTable(name)).select("vec_id", "emb"), spec2)
        .repartition(buckets, col("band_key"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "band_key").sortBy("band_key")
        .saveAsTable(staged)
    }
    val changed =
      if (!swapped && !outdated) false
      else {
        writeMeta(spark, name, spec2, buckets, dims)
        guard(name).bumpGen(spark)
        // a geometry change is the remediation the AUDIT ALERT names
        // for this store: old breach evidence describes bands that no
        // longer exist, so the persisted streak resets WITH the reband
        // — and only then; a no-op reband (geometry already current)
        // leaves the alert condition armed, because rebanding cannot
        // fix it and the remaining remedy (raise bucketCap) is the
        // caller's knob
        guard(name).clearStreak(spark)
        true
      }
    // bands and meta agree again (or never disagreed) — also heals a
    // predecessor dead between its meta overwrite and its own clear
    setRebandMarker(spark, name, on = false)
    changed
  }

  /** Drop the store's tables and their locations (idempotent). */
  def drop(spark: SparkSession, name: String): Unit = locked(spark, name) {
    allTables(name).foreach(StoreGuard.resetTable(spark, _))
    guard(name).clearPending(spark)
    guard(name).clearStreak(spark) // a dropped store has no audit history
    setRebandMarker(spark, name, on = false) // no store, no window
  }

  /** Durable audit-alert breach streak — the embedding twin of
    * [[graft.dedup.SignatureStore.readAuditStreak]].
    */
  def readAuditStreak(spark: SparkSession, name: String): Int =
    guard(name).readStreak(spark)
  def writeAuditStreak(spark: SparkSession, name: String, n: Int): Unit =
    guard(name).writeStreak(spark, n)
  def clearAuditStreak(spark: SparkSession, name: String): Unit =
    guard(name).clearStreak(spark)

  /** Canonical (vec_id, emb array<double>) projection of a corpus. */
  private def baseOf(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("emb"))

  /** Band + band_key signatures of a canonical base. The width is
    * implicit in each row's array (the kernel derives weights per
    * (planes, dims)); callers still probe dims for the store's own
    * width checks.
    */
  private def bandsOf(base: DataFrame, spec: Spec): DataFrame =
    Similarity.signBitBands(base, spec.planes, spec.bandBits)
      .withColumn("band_key", concat_ws(":", col("band"), col("band_hash")))

  /** Band-bucket candidates of `bBands` against the store, re-verified
    * with the exact decimal cosine against the stored full-precision
    * vectors: (new_id, other_id, cosine ≥ threshold). Both store joins
    * read their tables on the bucket key — only the batch side
    * shuffles.
    */
  private def crossVerified(spark: SparkSession, name: String,
      v: DataFrame, bBands: DataFrame, threshold: Double): DataFrame = {
    val cand = bBands.select(col("band_key"), col("vec_id").as("new_id"))
      .join(spark.table(bandsTable(name))
        .select(col("band_key"), col("vec_id").as("other_id")), "band_key")
      .select("new_id", "other_id").distinct()
    cand
      .join(v.select(col("vec_id").as("new_id"), col("emb").as("ea"),
        col("ns").as("na")), "new_id")
      .join(spark.table(vecsTable(name))
        .select(col("vec_id").as("other_id"), col("emb").as("eb"), col("ns").as("nb")),
        "other_id")
      .withColumn("cos_approx",
        Similarity.cosine(Similarity.dotApprox(col("ea"), col("eb")),
          col("na"), col("nb")))
      .filter(col("cos_approx") >= threshold - 1e-6)
      .withColumn("cosine",
        Similarity.cosine(Similarity.dot(col("ea"), col("eb")),
          col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
  }

  /** Read-only cross-store near-dup pairs of a batch against the store:
    * (hist_id, new_id, cosine) — the embedding analog of
    * [[graft.dedup.SignatureStore.incrementalPairs]]. Nothing is
    * appended; only the batch is banded and shuffled.
    */
  def incrementalPairs(spark: SparkSession, batch: DataFrame, name: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.9): DataFrame = {
    requireNoRebandWindow(spark, name)
    val meta = spark.table(metaTable(name)).head()
    requireCurrentKernel(name, meta)
    val spec = Spec(meta.getAs[Int]("planes"), meta.getAs[Int]("band_bits"))
    val base = baseOf(batch, idCol, vecCol)
    val v = base.withColumn("ns", Similarity.normSq(col("emb")))
    crossVerified(spark, name, v, bandsOf(base, spec), threshold)
      .select(col("other_id").as("hist_id"), col("new_id"), col("cosine"))
  }

  /** Band, hash, and store the historical corpus. One banding pass plus
    * one norm pass; every bucketed write repartitions onto its bucket
    * key first so a build emits `buckets` files per table, not
    * W×buckets (the small-files rule of SURVEY note 21).
    */
  def build(spark: SparkSession, history: DataFrame, name: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      spec: Spec = Spec(), buckets: Int = 16): Unit = locked(spark, name) {
    import spark.implicits._
    allTables(name).foreach(StoreGuard.resetTable(spark, _))
    val base = baseOf(history, idCol, vecCol).localCheckpoint(true)
    // one control-plane probe: history size (drives the adaptive band
    // geometry) and width
    val probeRow = base.agg(count(lit(1)), max(size(col("emb")))).head()
    val dims =
      if (probeRow.isNullAt(1)) -1 // empty history: first ingest sets dims
      else probeRow.getInt(1)
    val spec0 = spec.resolve(probeRow.getLong(0))
    if (dims > 0) {
      bandsOf(base, spec0)
        .repartition(buckets, col("band_key"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "band_key").sortBy("band_key")
        .saveAsTable(bandsTable(name))
      base.withColumn("ns", Similarity.normSq(col("emb")))
        .repartition(buckets, col("vec_id"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "vec_id").sortBy("vec_id")
        .saveAsTable(vecsTable(name))
    } else {
      // empty history still needs the table shells so ingest can append
      Seq.empty[(Long, Int, Int, String)]
        .toDF("vec_id", "band", "band_hash", "band_key")
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "band_key").sortBy("band_key")
        .saveAsTable(bandsTable(name))
      Seq.empty[(Long, Array[Double], Double)]
        .toDF("vec_id", "emb", "ns")
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "vec_id").sortBy("vec_id")
        .saveAsTable(vecsTable(name))
    }
    writeMeta(spark, name, spec0, buckets, dims)
    guard(name).bumpGen(spark)
    // a full rebuild re-pins bands and meta together — any marker left
    // by a rebander that died before this build is moot now
    setRebandMarker(spark, name, on = false)
  }

  /** Dedup `batch` against the store and within itself; append the
    * survivors' bands and vectors so the store grows O(batch). Returns
    * one flag row per batch vector: (vec_id, is_dup, dup_of) — `dup_of`
    * is the smallest matching stored id for cross-store dups, the
    * cluster representative for within-batch dups (the same two-step
    * policy, with the same non-transitivity rationale, as
    * [[graft.dedup.SignatureStore.ingest]]).
    *
    * Scale shape: the batch bands aggregate ONCE (checkpointed) and
    * every consumer — store join, within-batch LSH, survivor append —
    * filters that table; the store side of both joins is read on its
    * bucket key and never reshuffles; the exact re-verify touches only
    * banded candidates. Nothing rescans or rewrites the history.
    */
  /** `onFlags`/`onCommitted` are the streaming-ingest commit hooks —
    * same contract as [[graft.dedup.SignatureStore.ingest]]: flags
    * surface BEFORE any append, the committed mark lands after the
    * generation bump and before the pending clear.
    *
    * `bucketCap`/`onAudit`: a band bucket whose combined batch+store
    * occupancy exceeds `bucketCap` is SKIPPED by candidate generation —
    * the same degenerate-bucket protection as
    * [[Similarity.lshCosinePairs]] (one bucket of m near-identical
    * vectors is m²/2 candidate pairs; at corpus scale a single hot
    * bucket would dominate the whole ingest). Skipping is a recall
    * loss, so every drop is counted and delivered to `onAudit` as an
    * [[IngestAudit]] before any append — the accounting
    * `Similarity.lshBucketAudit` promises, guaranteed here by its own
    * action. Survivors still append their FULL band signatures: the cap
    * prunes this batch's candidate pairs, never the stored state.
    */
  def ingest(spark: SparkSession, batch: DataFrame, name: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.9,
      onFlags: DataFrame => Unit = _ => (),
      onCommitted: () => Unit = () => (),
      bucketCap: Int = 1000,
      onAudit: IngestAudit => Unit = _ => ()): DataFrame = locked(spark, name) {
    requireNoRebandWindow(spark, name)
    val meta = spark.table(metaTable(name)).head()
    requireCurrentKernel(name, meta)
    val spec = Spec(meta.getAs[Int]("planes"), meta.getAs[Int]("band_bits"))
    val buckets = meta.getAs[Int]("buckets")
    // the dims probe and the batch count ride base's checkpoint as
    // observed metrics (r20) instead of paying their own agg jobs —
    // Overlap.observedRow recomputes explicitly if the metric ever
    // fails to post
    val baseObs = org.apache.spark.sql.Observation(s"graft_es_base_${obsId.incrementAndGet()}")
    val base = baseOf(batch, idCol, vecCol)
      .observe(baseObs, max(size(col("emb"))).as("dims"), count(lit(1)).as("n"))
      .localCheckpoint(true)
    val ids = base.select("vec_id")
    val dimsRow = graft.dedup.Overlap.observedRow(baseObs,
      base.agg(max(size(col("emb"))), count(lit(1))).head())
    // emptiness check BEFORE the pending snapshot: an empty batch
    // mutates nothing, so writing (and then never clearing) a pending
    // file here would make a later recover() falsely report a crashed
    // ingest on a clean store
    if (dimsRow.isNullAt(0))
      return ids.select(col("vec_id"), lit(false).as("is_dup"),
        lit(null).cast("long").as("dup_of")).limit(0)
    guard(name).writePending(spark, snapshot(spark, name))
    locally {
      val dims = dimsRow.getInt(0)
      // an empty-history build pins dims = -1; the effective store dims
      // are then whatever the ACCUMULATED vectors have (one-row probe of
      // the bucketed table). Deliberately NOT persisted back into meta:
      // ingest must never REWRITE a pre-snapshot file — rollback/recover
      // only undo appends and re-create empty gen markers, so a meta
      // overwrite would be unrecoverable after a crash
      val storedDims = meta.getAs[Int]("dims") match {
        case d if d > 0 => d
        case _ =>
          spark.table(vecsTable(name)).select(size(col("emb"))).head(1) match {
            case Array(r) => r.getInt(0)
            case _ => -1 // store still empty: this batch defines the dims
          }
      }
      require(storedDims <= 0 || storedDims == dims,
        s"batch dims $dims != store dims $storedDims for '$name'")
      // normed vectors and band signatures are INDEPENDENT projections
      // of the pinned base — overlap their materializations (guide
      // §2.6, same pattern as SignatureStore.ingest).
      val (v, bBands) = graft.dedup.Overlap.overlapped2(
        base.withColumn("ns", Similarity.normSq(col("emb"))).localCheckpoint(true),
        bandsOf(base, spec).localCheckpoint(true))

      // bucket occupancy over the band_keys this batch touches, counting
      // batch AND stored members — buckets the batch does not touch can
      // produce neither candidates nor drops, so the store side is a
      // semi-join INTO its bucketing (only the small key set shuffles),
      // never a full-store aggregate. The audit aggregates ride the
      // occupancy checkpoint's own job as observed metrics — the
      // separate agg().head() job they used to pay is gone.
      val occObs = org.apache.spark.sql.Observation(s"graft_es_occ_${obsId.incrementAndGet()}")
      def occAudit = Seq(count(lit(1)).as("n_keys"),
        sum(when(col("occ") > bucketCap, 1L).otherwise(0L)).as("n_hot"),
        sum(when(col("occ") > bucketCap, col("occ")).otherwise(0L)).as("occ_hot"),
        max(col("occ")).as("max_occ"))
      val batchCnt = bBands.groupBy("band_key").agg(count(lit(1)).as("n_batch"))
      val occ = batchCnt
        .join(spark.table(bandsTable(name))
            .join(batchCnt.select("band_key"), "band_key")
            .groupBy("band_key").agg(count(lit(1)).as("n_store")),
          Seq("band_key"), "left")
        .select(col("band_key"),
          (col("n_batch") + coalesce(col("n_store"), lit(0L))).as("occ"))
        .observe(occObs, occAudit.head, occAudit.tail: _*)
        .localCheckpoint(true) // audit metrics + hot-key filter both ride it
      val auditRow = graft.dedup.Overlap.observedRow(occObs,
        occ.agg(occAudit.head, occAudit.tail: _*).head())
      onAudit(IngestAudit(dimsRow.getLong(1), spec.planes, spec.bandBits,
        auditRow.getLong(0),
        if (auditRow.isNullAt(1)) 0L else auditRow.getLong(1),
        if (auditRow.isNullAt(2)) 0L else auditRow.getLong(2),
        if (auditRow.isNullAt(3)) 0L else auditRow.getLong(3),
        bucketCap.toLong))
      // candidate generation skips hot buckets (accounted above); the
      // hot-key set is tiny (only over-cap keys) and broadcast. It
      // stays LAZY (r20): occ is already checkpointed, so each
      // consumer's anti-join re-derives the filter from block storage
      // — a trivial scan — instead of the set paying its own
      // checkpoint job.
      val hotKeys = occ.filter(col("occ") > bucketCap).select("band_key")
      val bBandsOk = bBands.join(hotKeys, Seq("band_key"), "left_anti")

      // exact decimal cosine between candidate (new, hist-or-new) pairs
      def verified(cand: DataFrame, hist: DataFrame): DataFrame =
        cand
          .join(v.select(col("vec_id").as("new_id"), col("emb").as("ea"),
            col("ns").as("na")), "new_id")
          .join(hist, "other_id")
          .withColumn("cos_approx",
            Similarity.cosine(Similarity.dotApprox(col("ea"), col("eb")),
              col("na"), col("nb")))
          .filter(col("cos_approx") >= threshold - 1e-6)
          .withColumn("cosine",
            Similarity.cosine(Similarity.dot(col("ea"), col("eb")),
              col("na"), col("nb")))
          .filter(col("cosine") >= threshold)

      // 1. against the store: candidates from a band_key equi-join INTO
      // the store's bucketing (only the batch side shuffles)
      val histDup = crossVerified(spark, name, v, bBandsOk, threshold)
        .groupBy(col("new_id").as("vec_id"))
        .agg(min(col("other_id")).as("hist_dup_of"))
        .localCheckpoint(true)

      // 2. within the batch, among history-survivors only
      val survIds = ids.join(histDup, Seq("vec_id"), "left_anti")
      val sBands = bBandsOk.join(survIds, "vec_id")
      val selfCand = sBands.select(col("band_key"), col("vec_id").as("new_id"))
        .join(sBands.select(col("band_key"), col("vec_id").as("other_id")), "band_key")
        .filter(col("new_id") < col("other_id"))
        .select("new_id", "other_id").distinct()
      val selfPairs = verified(selfCand,
          v.select(col("vec_id").as("other_id"), col("emb").as("eb"), col("ns").as("nb")))
        .select(col("new_id").as("doc_a"), col("other_id").as("doc_b"))
      val comp = Dedup.clusters(selfPairs, survIds.select(col("vec_id").as("doc_id")))

      val flags = ids
        .join(histDup, Seq("vec_id"), "left")
        .join(comp.select(col("doc_id").as("vec_id"), col("cluster"), col("is_rep")),
          Seq("vec_id"), "left")
        .select(col("vec_id"),
          (col("hist_dup_of").isNotNull || col("is_rep") === false).as("is_dup"),
          coalesce(col("hist_dup_of"),
            when(col("is_rep") === false, col("cluster"))).as("dup_of"))
        .localCheckpoint(true)

      onFlags(flags) // before any append — see SignatureStore.ingest
      val keepIds = flags.filter(!col("is_dup")).select("vec_id")
      // the two table appends are independent jobs over already-pinned
      // inputs — overlap them (r20; the exact pattern and rationale of
      // SignatureStore.appendFrom: awaited together before returning
      // OR rethrowing, so no straggler write can race a caller's
      // rollback; any partial state a crash leaves is what the
      // pending-snapshot rollback already restores)
      graft.dedup.Overlap.overlapped2(
        bBands.join(keepIds, "vec_id")
          .select("vec_id", "band", "band_hash", "band_key")
          .repartition(buckets, col("band_key"))
          .write.mode("append").format("parquet")
          .bucketBy(buckets, "band_key").sortBy("band_key")
          .saveAsTable(bandsTable(name)),
        v.join(keepIds, "vec_id")
          .select("vec_id", "emb", "ns")
          .repartition(buckets, col("vec_id"))
          .write.mode("append").format("parquet")
          .bucketBy(buckets, "vec_id").sortBy("vec_id")
          .saveAsTable(vecsTable(name)))
      guard(name).bumpGen(spark)
      onCommitted() // durable "fully happened" mark, still under the pending authorization
      // pending clears ONLY on success or on a completed rollback
      // (StoreGuard.doRollback) — see SignatureStore.ingest
      guard(name).clearPending(spark)
      flags
    }
  }

  /** Discharge a dead writer's recovery state WITHOUT rolling back —
    * same contract and owner arbitration as
    * [[graft.dedup.SignatureStore.dischargeCommitted]] (shared
    * implementation: [[graft.dedup.StoreGuard.dischargeCommitted]]).
    */
  def dischargeCommitted(spark: SparkSession, name: String,
      markerOwner: Option[graft.dedup.StoreGuard.LockOwner] = None): Unit =
    guard(name).dischargeCommitted(spark, markerOwner)

  /** Release a crashed writer's lock — see [[StoreGuard.unlock]]. */
  def unlock(spark: SparkSession, name: String): Unit =
    guard(name).unlock(spark)

  /** Discharge the store's lock only when its stamped owner is
    * verifiably dead — see [[graft.dedup.StoreGuard.dischargeDeadLock]].
    */
  def dischargeDeadLock(spark: SparkSession, name: String,
      strict: Boolean): Boolean =
    guard(name).dischargeDeadLock(spark, strict)
}
