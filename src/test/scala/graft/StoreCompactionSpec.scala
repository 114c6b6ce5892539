package graft

import org.apache.spark.sql.functions._
import graft.dedup.{SignatureStore, StoreGuard}
import graft.similarity.{EmbeddingStore, Similarity}
import org.apache.hadoop.fs.Path

/** Store-compaction lifecycle (the r11/r12 owed spec): N daily ingests
  * → `compact` → file count back to the bucket floor with byte-identical
  * probe results and ONE generation bump; pre-compaction snapshots are
  * non-rollbackable (missing-file refusal); a live writer's lock makes
  * compaction fail fast; and the two crash windows of
  * [[StoreGuard.compactTable]] recover: a compactor dead between the
  * entry reset and the rename resumes at the swap on the next
  * maintenance run (via ensureRegistered's missing-dir fallback), and
  * one dead after the rename but before the catalog re-declare recovers
  * by plain re-registration.
  */
class StoreCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def loc(t: String): Path = new Path(
    spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(t)))
  private lazy val fs =
    loc("any").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (generation number, count of marker files) of a store's meta dir. */
  private def gen(metaTable: String): (Int, Int) = {
    val marks = fs.listStatus(loc(metaTable)).map(_.getPath.getName)
      .filter(_.startsWith("_gen-"))
    (marks.map(_.split("-")(1).toInt).max, marks.length)
  }

  test("signature store: ingests -> compact -> file floor, identical probe, one gen bump, stale snapshot refused, live lock fails fast") {
    val docs = Tables.documents(spark, sfDir)
    val name = "graft_compact_spec"
    SignatureStore.drop(spark, name)
    SignatureStore.build(spark, docs.filter(col("doc_id") % 5 === 0), name)
    (1 to 4).foreach(d =>
      SignatureStore.ingest(spark, docs.filter(col("doc_id") % 5 === d), name))
    val tables = Seq(SignatureStore.bandsTable(name),
      SignatureStore.shinglesTable(name), SignatureStore.sizesTable(name))
    assert(StoreGuard.dataFileCount(spark, tables.head) > 16,
      "ingests should have appended past the bucket floor")
    val probeBatch = docs.filter(col("doc_id") % 5 === 0)
    def probe(): Seq[String] = SignatureStore
      .incrementalPairs(spark, probeBatch, name)
      .collect().map(_.toString).sorted.toSeq
    val p0 = probe()
    assert(p0.nonEmpty)
    val preSnap = SignatureStore.snapshot(spark, name)
    val (gen0, marks0) = gen(SignatureStore.metaTable(name))
    assert(marks0 == 1)

    SignatureStore.compact(spark, name)
    tables.foreach(t => assert(StoreGuard.dataFileCount(spark, t) <= 16,
      s"$t not compacted to the floor"))
    assert(probe() == p0, "compaction must be content-preserving")
    assert(gen(SignatureStore.metaTable(name)) == ((gen0 + 1, 1)),
      "exactly one generation bump for the whole compaction")

    // compaction DELETED files, so the pre-compaction snapshot must be
    // refused loudly instead of silently emptying the store
    val e = intercept[RuntimeException](
      SignatureStore.rollback(spark, name, preSnap))
    assert(e.getMessage.contains("cannot roll back"), e.getMessage)

    // a live ingest's lock: compaction fails FAST, never interleaves
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val writer = new Thread(() => SignatureStore.locked(spark, name) {
      entered.countDown(); release.await()
    })
    writer.start(); entered.await()
    try {
      val le = intercept[RuntimeException](SignatureStore.compact(spark, name))
      assert(le.getMessage.contains("locked by a concurrent writer"), le.getMessage)
    } finally { release.countDown(); writer.join() }
    assert(probe() == p0)
    SignatureStore.drop(spark, name)
  }

  test("compaction crash windows: dead between reset and rename resumes at the swap; dead before re-declare recovers by re-registration") {
    val docs = Tables.documents(spark, sfDir)
    val name = "graft_crash_spec"
    SignatureStore.drop(spark, name)
    SignatureStore.build(spark, docs.filter(col("doc_id") % 5 === 0), name)
    (1 to 2).foreach(d =>
      SignatureStore.ingest(spark, docs.filter(col("doc_id") % 5 === d), name))
    val probeBatch = docs.filter(col("doc_id") % 5 === 0)
    def probe(): Seq[String] = SignatureStore
      .incrementalPairs(spark, probeBatch, name)
      .collect().map(_.toString).sorted.toSeq
    val p0 = probe()
    val bandsT = SignatureStore.bandsTable(name)
    val staged = s"${bandsT}__compacting"
    def stageAndReset(): Unit = {
      // replay compactTable's staging verbatim, then die at its most
      // dangerous point: the staged dir is the ONLY copy of the bands
      spark.table(bandsT).repartition(16, col("band_key"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(16, "band_key").sortBy("band_key").saveAsTable(staged)
      StoreGuard.resetTable(spark, bandsT)
    }

    // window 1: dead between reset and rename. The next maintenance run
    // (ensureRegistered first, like Runner --maintain-store) must fall
    // back over the missing dir, then resume at the swap — NOT read the
    // husk as an empty store and strand the staged copy
    stageAndReset()
    SignatureStore.ensureRegistered(spark, name)
    SignatureStore.compact(spark, name)
    assert(!fs.exists(loc(staged)), "staged dir must be consumed by the swap")
    assert(probe() == p0, "resumed swap must restore the exact content")

    // window 2: dead after the rename, before the catalog re-declare —
    // the data is in place but the table entry is missing and the staged
    // entry is stale
    stageAndReset()
    assert(fs.rename(loc(staged), loc(bandsT)))
    SignatureStore.ensureRegistered(spark, name)
    SignatureStore.compact(spark, name) // at the floor: early-returns
    assert(probe() == p0)
    StoreGuard.resetTable(spark, staged) // clear the stale staged entry
    SignatureStore.drop(spark, name)
  }

  test("embedding store: ingests -> compact -> file floor, identical probe, gen bump; reset->rename crash resumes") {
    val emb = Tables.embeddings(spark, sfDir)
    val name = "graft_ecompact_spec"
    EmbeddingStore.drop(spark, name)
    EmbeddingStore.build(spark, emb.filter(col("vec_id") % 3 === 0), name)
    (1 to 2).foreach(d =>
      EmbeddingStore.ingest(spark, emb.filter(col("vec_id") % 3 === d), name))
    val tables = Seq(EmbeddingStore.bandsTable(name), EmbeddingStore.vecsTable(name))
    assert(StoreGuard.dataFileCount(spark, tables.head) > 16)
    val probeBatch = emb.filter(col("vec_id") % 3 === 0)
    def probe(): Seq[String] = EmbeddingStore
      .incrementalPairs(spark, probeBatch, name)
      .collect().map(_.toString).sorted.toSeq
    val p0 = probe()
    assert(p0.nonEmpty)
    val (gen0, _) = gen(EmbeddingStore.metaTable(name))

    EmbeddingStore.compact(spark, name)
    tables.foreach(t => assert(StoreGuard.dataFileCount(spark, t) <= 16,
      s"$t not compacted to the floor"))
    assert(probe() == p0)
    assert(gen(EmbeddingStore.metaTable(name)) == ((gen0 + 1, 1)))

    // reset->rename crash window on the vectors table
    val vecsT = EmbeddingStore.vecsTable(name)
    val staged = s"${vecsT}__compacting"
    spark.table(vecsT).repartition(16, col("vec_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(16, "vec_id").sortBy("vec_id").saveAsTable(staged)
    StoreGuard.resetTable(spark, vecsT)
    EmbeddingStore.ensureRegistered(spark, name)
    EmbeddingStore.compact(spark, name)
    assert(!fs.exists(loc(staged)))
    assert(probe() == p0)
    EmbeddingStore.drop(spark, name)
  }

  test("embedding store reband: outgrown geometry widens from stored vectors; no-op when current; crash heals") {
    import spark.implicits._
    val name = "graft_reband_spec"
    EmbeddingStore.drop(spark, name)
    // deterministic synthetic corpus: enough structure for the adaptive
    // derivation to CHANGE between 100 and 1200 vectors
    // md5-derived coordinates: genuinely unstructured, so distinct ids
    // are never near-dups (a lattice formula here makes constant-shift
    // twins and the whole ingest dedupes away — measured)
    def vecs(from: Long, until: Long) = (from until until).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      (i, Array.tabulate(32) { j =>
        val d = md.digest(s"$i:$j".getBytes("UTF-8"))
        ((((d(0) & 0xFF) << 16) | ((d(1) & 0xFF) << 8) | (d(2) & 0xFF)) % 20001 - 10000) / 10000.0f
      })
    }.toDF("vec_id", "embedding")
    EmbeddingStore.build(spark, vecs(0, 100), name) // n=100 -> r=8, 48 planes
    def metaSpec() = {
      val m = spark.table(EmbeddingStore.metaTable(name)).head()
      (m.getAs[Int]("planes"), m.getAs[Int]("band_bits"))
    }
    assert(metaSpec() == Similarity.lshSpecFor(100))
    // geometry still right-sized: reband is a no-op
    assert(!EmbeddingStore.reband(spark, name))
    assert(metaSpec() == Similarity.lshSpecFor(100))
    // the store grows 12x past its build-time size
    EmbeddingStore.ingest(spark, vecs(100, 1200), name)
    val n = spark.table(EmbeddingStore.vecsTable(name)).count()
    assert(Similarity.lshSpecFor(n) != metaSpec(), "growth must outdate the pin")
    assert(EmbeddingStore.reband(spark, name))
    assert(metaSpec() == Similarity.lshSpecFor(n))
    // the re-banded store answers probes exactly like a FRESH build of
    // the same corpus (geometry and bands agree by construction)
    val fresh = "graft_reband_fresh"
    EmbeddingStore.drop(spark, fresh)
    EmbeddingStore.build(spark,
      spark.table(EmbeddingStore.vecsTable(name))
        .select(col("vec_id"), col("emb").as("embedding")), fresh)
    val batch = vecs(5000, 5050)
      .unionByName(vecs(100, 110).select((col("vec_id") + 9000000L).as("vec_id"),
        col("embedding"))) // exact twins of stored vectors: guaranteed pairs
    def probeOf(store: String) = EmbeddingStore
      .incrementalPairs(spark, batch, store)
      .collect().map(_.toString).sorted.toSeq
    assert(probeOf(name) == probeOf(fresh))
    assert(probeOf(name).nonEmpty)
    // bands landed at the file floor; a follow-up compact is a no-op there
    assert(StoreGuard.dataFileCount(spark, EmbeddingStore.bandsTable(name)) <= 16)

    // crash window: die between the bands reset and the rename — the
    // staged __rebanding sibling holds the only copy; a re-run heals
    // both the swap AND the meta pin
    val bandsT = EmbeddingStore.bandsTable(name)
    val staged = s"${bandsT}__rebanding"
    spark.table(bandsT).repartition(16, col("band_key"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(16, "band_key").sortBy("band_key").saveAsTable(staged)
    StoreGuard.resetTable(spark, bandsT)
    EmbeddingStore.ensureRegistered(spark, name)
    assert(EmbeddingStore.reband(spark, name), "resume must report a rewrite")
    assert(!fs.exists(loc(staged)))
    assert(metaSpec() == Similarity.lshSpecFor(n))
    assert(probeOf(name) == probeOf(fresh))
    Seq(name, fresh).foreach(EmbeddingStore.drop(spark, _))
  }

  test("reband crash window is DETECTABLE: the .rebanding marker makes ingest and probes refuse; completing reband heals") {
    import spark.implicits._
    val name = "graft_reband_marker_spec"
    EmbeddingStore.drop(spark, name)
    EmbeddingStore.build(spark,
      (0L until 50L).map(i => (i, TestVectors.vec(i.toInt))).toDF("vec_id", "embedding"),
      name)
    val metaLoc = loc(EmbeddingStore.metaTable(name))
    val markerP = new Path(metaLoc.getParent, metaLoc.getName + ".rebanding")
    try {
      // a rebander dead anywhere between its bands rewrite and its meta
      // overwrite leaves the marker on disk (it brackets the whole
      // commit sequence) — bands and meta may then disagree on
      // geometry, and a batch banded with the stale spec would miss
      // stored near-dups with NO error. Both write and read paths must
      // refuse loudly instead.
      fs.createNewFile(markerP)
      val batch = Seq((1000L, TestVectors.vec(1))).toDF("vec_id", "embedding")
      val e1 = intercept[IllegalArgumentException](
        EmbeddingStore.ingest(spark, batch, name))
      assert(e1.getMessage.contains("unfinished reband"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException](
        EmbeddingStore.incrementalPairs(spark, batch, name))
      assert(e2.getMessage.contains("unfinished reband"), e2.getMessage)
      // re-running reband completes the sequence (here a no-op — bands
      // and meta in fact agree) and clears the marker
      EmbeddingStore.reband(spark, name)
      assert(!fs.exists(markerP), "reband must clear the marker on every exit")
      val flags = EmbeddingStore.ingest(spark, batch, name)
      assert(flags.count() == 1)
      // a real reband leaves no marker behind either: outdate the pin
      // (legacy fixed geometry), rewrite, and verify the window closed
      val m = spark.table(EmbeddingStore.metaTable(name)).head()
      Seq((32, 8, m.getAs[Int]("buckets"), m.getAs[Int]("dims"), Similarity.LshKernelVersion))
        .toDF("planes", "band_bits", "buckets", "dims", "kernel")
        .write.mode("overwrite").format("parquet")
        .saveAsTable(EmbeddingStore.metaTable(name))
      assert(EmbeddingStore.reband(spark, name))
      assert(!fs.exists(markerP))
      assert(EmbeddingStore.incrementalPairs(spark, batch, name).count() >= 0)
    } finally EmbeddingStore.drop(spark, name)
  }

  test("completed swaps clear stale staged siblings of BOTH suffix families (and the needed=false early return does too)") {
    import spark.implicits._
    val name = "graft_staged_gc_spec"
    EmbeddingStore.drop(spark, name)
    EmbeddingStore.build(spark,
      (0L until 40L).map(i => (i, TestVectors.vec(i.toInt))).toDF("vec_id", "embedding"),
      name)
    try {
      val bandsT = EmbeddingStore.bandsTable(name)
      // a compactor dead between stage-complete and its entry reset
      // leaves a staged sibling WHILE the live table still has data —
      // stale content, not a sole copy. If it lingers and a LATER
      // crashed swap empties the table dir, the sole-copy resume would
      // adopt these outdated bands over the store.
      def plantStale(suffix: String): String = {
        val staged = s"$bandsT$suffix"
        spark.table(bandsT).limit(5).repartition(16, col("band_key"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(16, "band_key").sortBy("band_key").saveAsTable(staged)
        staged
      }
      // path 1: a REAL swap (reband after outdating the pin) clears the
      // other family's leftover
      val stale1 = plantStale("__compacting")
      val m = spark.table(EmbeddingStore.metaTable(name)).head()
      Seq((32, 8, m.getAs[Int]("buckets"), m.getAs[Int]("dims"), Similarity.LshKernelVersion))
        .toDF("planes", "band_bits", "buckets", "dims", "kernel")
        .write.mode("overwrite").format("parquet")
        .saveAsTable(EmbeddingStore.metaTable(name))
      assert(EmbeddingStore.reband(spark, name))
      assert(!fs.exists(loc(stale1)),
        "a completed reband must delete the stale __compacting sibling")
      assert(!spark.catalog.tableExists(stale1))
      // path 2: a no-op maintenance pass (compact with the table at its
      // file floor -> needed=false early return) also clears leftovers
      val stale2 = plantStale("__rebanding")
      EmbeddingStore.compact(spark, name)
      assert(!fs.exists(loc(stale2)),
        "the needed=false early return must delete stale staged siblings")
      assert(!spark.catalog.tableExists(stale2))
      // the live table is untouched throughout
      assert(spark.table(bandsT).count() > 0)
    } finally EmbeddingStore.drop(spark, name)
  }

  test("reband on an EMPTY store: meta re-pin only, no staged rewrite, still ingestable") {
    val name = "graft_reband_empty_spec"
    EmbeddingStore.drop(spark, name)
    EmbeddingStore.build(spark,
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"), name)
    try {
      // geometry and kernel current: nothing to do
      assert(!EmbeddingStore.reband(spark, name))
      // a legacy fixed-geometry pin on an empty store: reband must
      // re-pin the meta WITHOUT staging a zero-row bucketed rewrite (a
      // zero-file bucketed write stages no readable parquet — that path
      // crashed mid-commit with the bands table dropped, and every
      // later maintenance fire repeated the crash)
      val m = spark.table(EmbeddingStore.metaTable(name)).head()
      Seq((32, 8, m.getAs[Int]("buckets"), m.getAs[Int]("dims")))
        .toDF("planes", "band_bits", "buckets", "dims")
        .write.mode("overwrite").format("parquet")
        .saveAsTable(EmbeddingStore.metaTable(name))
      assert(EmbeddingStore.reband(spark, name))
      val m2 = spark.table(EmbeddingStore.metaTable(name)).head()
      assert((m2.getAs[Int]("planes"), m2.getAs[Int]("band_bits")) ==
        Similarity.lshSpecFor(0))
      // the healed store still takes its first ingest
      val flags = EmbeddingStore.ingest(spark,
        Seq((1L, TestVectors.vec(1))).toDF("vec_id", "embedding"), name)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(flags == Map(1L -> false), flags)
    } finally EmbeddingStore.drop(spark, name)
  }
}
