package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/** Streaming specs: the incremental forms must agree with the
  * oracle-verified batch semantics (st01/st02).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly rollup equals the batch plan") {
    // Stage the events table as a stream-source directory.
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    val events = Tables.events(spark, sfDir)
    // multiple files + small trigger batches so the watermark advances
    // between micro-batches and append mode can emit closed windows
    events.orderBy("ts").coalesce(1)
      .withColumn("part", (col("event_id") % 8).cast("int"))
      .repartitionByRange(8, col("ts"))
      .drop("part")
      .write.mode("overwrite").parquet(dir.toString)

    val out = java.nio.file.Files.createTempDirectory("graft-stream-out")
    val q = EventStream.hourlyRollup(
      EventStream.read(spark, dir.toString, maxFilesPerTrigger = Some(1)))
      .writeStream
      .format("memory")
      .queryName("hourly_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", out.toString)
      .start()
    q.awaitTermination(120000)

    // Append mode only emits windows the final watermark passed; compare
    // on that subset (the batch side is total).
    val streamed = spark.table("hourly_test")
      .select("hour", "event_type", "n_events", "total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("total_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    // append withholds windows the final watermark hasn't passed; the
    // bulk of history must have been emitted and agree exactly. The
    // exact count depends on where file-batching lands the final
    // watermark (429/868 under a contended parallel suite vs 440+
    // alone), so the bar is 40% — the property is "bulk emitted",
    // not a precise split
    assert(streamed.size * 5 >= batch.size * 2,
      s"only ${streamed.size}/${batch.size} windows emitted")
  }

  test("streaming keyed upsert converges to the batch latest-per-key state") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-upsrc")
    val events = Tables.events(spark, sfDir)
    events.repartitionByRange(6, col("ts")).write.mode("overwrite").parquet(srcDir.toString)
    val target = java.nio.file.Files.createTempDirectory("graft-uptgt").resolve("t").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-upckpt").toString
    val q = EventStream.upsertStream(
      EventStream.read(spark, srcDir.toString, maxFilesPerTrigger = Some(2)),
      target, ckpt)
    q.awaitTermination(120000)
    q.stop()
    val got = spark.read.parquet(target)
    // every event upserted exactly once (event_id is the key)
    assert(got.count() == events.count())
    assert(got.select("event_id").distinct().count() == events.count())
  }

  test("streaming upsert leaves untouched date partitions' files unchanged") {
    val events = Tables.events(spark, sfDir)
    val dates = events.select(to_date(col("ts")).as("d")).distinct()
      .orderBy("d").as[java.sql.Date].collect()
    assert(dates.length >= 2, "need at least two event dates")
    val cut = dates(dates.length / 2)
    // seed the target with the older half via the same streaming sink
    val srcOld = java.nio.file.Files.createTempDirectory("graft-up-old")
    events.filter(to_date(col("ts")) < lit(cut))
      .write.mode("overwrite").parquet(srcOld.toString)
    val target = java.nio.file.Files.createTempDirectory("graft-uptgt2").resolve("t").toString
    val ck1 = java.nio.file.Files.createTempDirectory("graft-upck1").toString
    EventStream.upsertStream(EventStream.read(spark, srcOld.toString), target, ck1)
      .awaitTermination(120000)
    val oldFiles = spark.read.parquet(target).filter(col("p_date") < lit(cut))
      .select(input_file_name()).distinct().as[String].collect().toSet
    assert(oldFiles.nonEmpty)
    // now stream only the newer half — old partitions must not be rewritten
    val srcNew = java.nio.file.Files.createTempDirectory("graft-up-new")
    events.filter(to_date(col("ts")) >= lit(cut))
      .write.mode("overwrite").parquet(srcNew.toString)
    val ck2 = java.nio.file.Files.createTempDirectory("graft-upck2").toString
    EventStream.upsertStream(EventStream.read(spark, srcNew.toString), target, ck2)
      .awaitTermination(120000)
    val got = spark.read.parquet(target)
    assert(got.count() == events.count())
    val oldFilesAfter = got.filter(col("p_date") < lit(cut))
      .select(input_file_name()).distinct().as[String].collect().toSet
    assert(oldFiles == oldFilesAfter, "untouched partitions were rewritten")
  }

  test("stream-stream interval join equals the batch attribution pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj")
    val events = Tables.events(spark, sfDir)
    events.repartitionByRange(6, col("ts")).write.mode("overwrite").parquet(dir.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ssj-ck").toString
    val stream = EventStream.read(spark, dir.toString, maxFilesPerTrigger = Some(2))
    val q = EventStream.attributionJoin(
        stream.filter(col("event_type") === "purchase"),
        stream.filter(col("event_type") === "view"))
      .writeStream.format("memory").queryName("ssj_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination(180000)
    val streamed = spark.table("ssj_test")
      .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
    // batch truth: every (purchase, view) pair within the 10-minute
    // window — the stream must emit exactly this set (inner interval
    // join, AvailableNow drains everything and finalizes the watermark)
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val batch = p.join(v,
        col("user_id") === col("v_user_id") &&
          col("view_ts") <= col("p_ts") &&
          col("view_ts") >= col("p_ts") - expr("INTERVAL 10 minutes"))
      .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream ${streamed.size} pairs vs batch ${batch.size}")
  }

  test("streaming watermark-bounded dedup keeps exactly the batch key set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-src")
    val events = Tables.events(spark, sfDir)
    // ts-range-partitioned files + small triggers: duplicates of a
    // day-grain key land within the 2-day lateness of each other in
    // event time, which is the regime dropDuplicatesWithinWatermark
    // guarantees dedup for.
    events.repartitionByRange(6, col("ts")).write.mode("overwrite").parquet(dir.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dedup-ck").toString
    val q = EventStream.dedupKeys(
        EventStream.read(spark, dir.toString, maxFilesPerTrigger = Some(2)))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination(180000)
    val streamed = spark.table("dedup_test")
      .select(col("user_id"), col("event_type"), col("day"))
      .as[(Long, String, java.sql.Timestamp)].collect()
    val batch = events
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .distinct()
      .as[(Long, String, java.sql.Timestamp)].collect().toSet
    val total = events.count()
    // one survivor per key, no key missed, and real duplicates dropped
    assert(streamed.length == streamed.toSet.size, "stream emitted a key twice")
    assert(streamed.toSet == batch,
      s"stream ${streamed.length} keys vs batch ${batch.size}")
    assert(streamed.length < total, "fixture carried no duplicates — test is vacuous")
  }

  test("session state transition matches batch gap semantics") {
    val us = 1000000L
    val evs = Seq(
      EventStream.Ev(1, 0, 1.0),
      EventStream.Ev(1, 100 * us, 2.0),
      EventStream.Ev(1, (100 + 1801) * us, 4.0)) // >30min gap → new session
    val (state, closed) = EventStream.advance(1, None, evs)
    assert(closed == Seq(EventStream.Session(1, 0, 100 * us, 2, 3.0)))
    assert(state.contains(EventStream.SessionState((1901) * us, 1901 * us, 1, 4.0)))
    // feeding the next batch continues the open session
    val (state2, closed2) = EventStream.advance(1, state,
      Seq(EventStream.Ev(1, 1902 * us, 1.0)))
    assert(closed2.isEmpty)
    assert(state2.exists(_.n == 2))
  }

  test("incremental sessionize emits closed sessions") {
    val us = 1000000L
    val evs = Seq(
      EventStream.Ev(5, 0, 1.0),
      EventStream.Ev(5, 10 * us, 1.0),
      EventStream.Ev(5, 4000 * us, 7.0),
      EventStream.Ev(6, 0, 2.0)).toDS()
    // batch Dataset through the same flatMapGroupsWithState path
    val sessions = EventStream.sessionize(evs).collect()
    // only user 5's first session is closed (batch watermarks never
    // advance, so the timeout flush is streaming-only — see next test)
    assert(sessions.toSeq == Seq(EventStream.Session(5, 0, 10 * us, 2, 2.0)))
  }

  test("streaming sessionize flushes the final open session via event-time timeout") {
    val us = 1000000L
    val hour = 3600L * us
    val dir = java.nio.file.Files.createTempDirectory("graft-sess")
    // three files = three micro-batches; the watermark computed after each
    // batch drives timeouts in the next. user 5's session (ends t=10s)
    // times out once the watermark passes 10s+30min — i.e. in batch 3,
    // whose predecessor saw t=2h.
    def file(n: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "ts_us", "value")
        .withColumn("event_id", col("user_id"))
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withColumn("event_type", lit("x"))
        .withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$n")
    // base offset keeps the first event strictly above the initial
    // watermark (0) — a row at exactly t=0 is dropped as late data
    val base = hour
    file("f1", Seq((5L, base, 1.0), (5L, base + 10L * us, 1.0)))
    file("f2", Seq((6L, base + 2L * hour, 2.0)))
    file("f3", Seq((7L, base + 4L * hour, 3.0)))
    // stream the three files in ts order, one per micro-batch
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(s"$dir/*")
      .select(col("user_id"), (unix_micros(col("ts"))).as("ts_us"), col("value"))
      .as[EventStream.Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sessck").toString
    val q = EventStream.sessionize(src)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination(120000)
    val got = spark.table("sess_test").as[EventStream.Session].collect().toSet
    // user 5's open session was flushed by the timeout, not by a new event
    assert(got.contains(EventStream.Session(5, base, base + 10 * us, 2, 2.0)),
      s"open session not flushed; got $got")
  }

  test("streaming corpus ingest: flag log equals sequential batch ingests; replay is a no-op") {
    import graft.streaming.CorpusStream
    import graft.dedup.{SignatureStore, StoreGuard}
    val docs = Tables.documents(spark, sfDir)
    val hist = docs.filter(col("doc_id") % 10 === 0)
    val rest = docs.filter(col("doc_id") % 10 =!= 0)
    val sName = "graft_cstream_spec" // fed by the stream
    val bName = "graft_cbatch_spec"  // fed by the batch API, same splits
    Seq(sName, bName).foreach(SignatureStore.drop(spark, _))
    SignatureStore.build(spark, hist, sName)
    SignatureStore.build(spark, hist, bName)
    val inDir = java.nio.file.Files.createTempDirectory("graft-cstream-in")
    val flagsRoot = java.nio.file.Files.createTempDirectory("graft-cstream-flags").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cstream-ckpt").toString
    try {
      // ~3 files → ~3 micro-batches at maxFilesPerTrigger=1
      rest.repartitionByRange(3, col("doc_id")).write.mode("overwrite")
        .parquet(inDir.toString)
      val q = CorpusStream.ingestStream(
        CorpusStream.read(spark, inDir.toString, maxFilesPerTrigger = Some(1)),
        sName, flagsRoot, ckpt)
      q.awaitTermination(180000)

      // exactly-once coverage: every doc flagged once across the log
      val log = spark.read.parquet(flagsRoot)
      assert(log.count() == rest.count())
      assert(log.select("doc_id").distinct().count() == rest.count())
      val batchIds = log.select("batch_id").distinct().as[Long].collect().sorted
      assert(batchIds.length >= 2, s"want multiple micro-batches, got ${batchIds.toSeq}")

      // the stream's flags must equal applying the SAME splits, in the
      // same order, through the plain batch API on a twin store
      val streamFlags = log.select(col("doc_id"), col("is_dup"), col("dup_of"), col("batch_id"))
        .as[(Long, Boolean, Option[Long], Long)].collect().toSet
      val batchFlags = batchIds.flatMap { b =>
        val ids = log.filter(col("batch_id") === b).select("doc_id")
        SignatureStore.ingest(spark, rest.join(ids, "doc_id"), bName)
          .as[(Long, Boolean, Option[Long])].collect()
          .map { case (d, i, o) => (d, i, o, b) }
      }.toSet
      assert(streamFlags == batchFlags)
      assert(streamFlags.exists(_._2), "fixture must contain duplicates")

      // checkpoint-replay contract: a committed batch carries its
      // _COMMITTED marker (written before the pending clear), so a
      // replay SKIPS the ingest entirely — appends nothing, flags
      // byte-identical
      val tables = Seq(SignatureStore.bandsTable(sName),
        SignatureStore.shinglesTable(sName), SignatureStore.sizesTable(sName))
      val b0 = batchIds.head
      val fs = new org.apache.hadoop.fs.Path(flagsRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(batchIds.forall(b => fs.exists(
        new org.apache.hadoop.fs.Path(s"$flagsRoot/batch_id=$b/_COMMITTED"))),
        "every completed batch must carry its commit marker")
      val before = spark.read.parquet(s"$flagsRoot/batch_id=$b0")
        .collect().map(_.toString).sorted.toSeq
      val files0 = tables.map(StoreGuard.dataFileCount(spark, _)).sum
      val b0docs = rest.join(log.filter(col("batch_id") === b0).select("doc_id"), "doc_id")
      CorpusStream.ingestBatch(spark, b0docs, sName, flagsRoot, b0)
      assert(tables.map(StoreGuard.dataFileCount(spark, _)).sum == files0,
        "replayed batch must append nothing")
      val after = spark.read.parquet(s"$flagsRoot/batch_id=$b0")
        .collect().map(_.toString).sorted.toSeq
      assert(after == before, "replayed flag partition must be identical")
    } finally {
      Seq(sName, bName).foreach(SignatureStore.drop(spark, _))
    }
  }

  test("streaming embedding ingest: flag log equals sequential batch ingests; replay is a no-op") {
    import graft.streaming.CorpusStream
    import graft.similarity.EmbeddingStore
    import graft.dedup.StoreGuard
    val emb = Tables.embeddings(spark, sfDir)
    val hist = emb.filter(col("vec_id") % 3 === 0)
    // guaranteed cross-store dups: exact twins of history vectors under
    // shifted ids (the tiny sf0.001 slice has no organic 0.9-cosine
    // pairs across the %3 split)
    val rest = emb.filter(col("vec_id") % 3 =!= 0)
      .unionByName(hist.limit(5).select((col("vec_id") + 1000000L).as("vec_id"),
        col("embedding"), col("label")))
    val sName = "graft_estream_spec"
    val bName = "graft_ebatch_spec"
    Seq(sName, bName).foreach(EmbeddingStore.drop(spark, _))
    EmbeddingStore.build(spark, hist, sName)
    EmbeddingStore.build(spark, hist, bName)
    val inDir = java.nio.file.Files.createTempDirectory("graft-estream-in")
    val flagsRoot = java.nio.file.Files.createTempDirectory("graft-estream-flags").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-estream-ckpt").toString
    try {
      rest.repartitionByRange(3, col("vec_id")).write.mode("overwrite")
        .parquet(inDir.toString)
      val q = CorpusStream.ingestEmbeddingsStream(
        CorpusStream.readEmbeddings(spark, inDir.toString, maxFilesPerTrigger = Some(1)),
        sName, flagsRoot, ckpt)
      q.awaitTermination(180000)

      val log = spark.read.parquet(flagsRoot)
      assert(log.count() == rest.count())
      assert(log.select("vec_id").distinct().count() == rest.count())
      val batchIds = log.select("batch_id").distinct().as[Long].collect().sorted
      assert(batchIds.length >= 2, s"want multiple micro-batches, got ${batchIds.toSeq}")

      val streamFlags = log.select(col("vec_id"), col("is_dup"), col("dup_of"), col("batch_id"))
        .as[(Long, Boolean, Option[Long], Long)].collect().toSet
      val batchFlags = batchIds.flatMap { b =>
        val ids = log.filter(col("batch_id") === b).select("vec_id")
        EmbeddingStore.ingest(spark, rest.join(ids, "vec_id"), bName)
          .as[(Long, Boolean, Option[Long])].collect()
          .map { case (d, i, o) => (d, i, o, b) }
      }.toSet
      assert(streamFlags == batchFlags)
      assert(streamFlags.exists(_._2), "fixture must contain near-dups")

      // replay: store data files unchanged, flag partition identical
      val tables = Seq(EmbeddingStore.bandsTable(sName), EmbeddingStore.vecsTable(sName))
      val b0 = batchIds.head
      val before = spark.read.parquet(s"$flagsRoot/batch_id=$b0")
        .collect().map(_.toString).sorted.toSeq
      val files0 = tables.map(StoreGuard.dataFileCount(spark, _)).sum
      val b0vecs = rest.join(log.filter(col("batch_id") === b0).select("vec_id"), "vec_id")
      CorpusStream.ingestEmbeddingsBatch(spark, b0vecs, sName, flagsRoot, b0)
      assert(tables.map(StoreGuard.dataFileCount(spark, _)).sum == files0,
        "replayed batch must append nothing")
      val after = spark.read.parquet(s"$flagsRoot/batch_id=$b0")
        .collect().map(_.toString).sorted.toSeq
      assert(after == before, "replayed flag partition must be identical")
    } finally {
      Seq(sName, bName).foreach(EmbeddingStore.drop(spark, _))
    }
  }

  test("streaming embedding batches persist _lsh_audit.json in their flag partition; a forced cap records the drop") {
    import graft.streaming.CorpusStream
    import graft.similarity.EmbeddingStore
    import TestVectors.vec
    val sName = "graft_estream_audit_spec"
    EmbeddingStore.drop(spark, sName)
    EmbeddingStore.build(spark,
      Seq((1L, vec(1)), (2L, vec(2))).toDF("vec_id", "embedding"), sName)
    val flagsRoot = java.nio.file.Files.createTempDirectory("graft-eaudit-flags").toString
    val fs = new org.apache.hadoop.fs.Path(flagsRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def audit(b: Long): String = {
      val p = new org.apache.hadoop.fs.Path(s"$flagsRoot/batch_id=$b/_lsh_audit.json")
      assert(fs.exists(p), s"batch $b must carry its LSH accounting: $p")
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    try {
      // normal cap: audit present, zero drops, the twin IS flagged
      CorpusStream.ingestEmbeddingsBatch(spark,
        Seq((100L, vec(1))).toDF("vec_id", "embedding"), sName, flagsRoot, 0L)
      assert(audit(0L).contains("\"capped_buckets\":0"), audit(0L))
      val f0 = spark.read.parquet(s"$flagsRoot/batch_id=0")
        .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap
      assert(f0 == Map(100L -> true), f0)
      // forced cap=1: every shared bucket holds >=2 members -> dropped;
      // the audit in the flag log records the recall loss the flags
      // themselves can no longer show
      CorpusStream.ingestEmbeddingsBatch(spark,
        Seq((200L, vec(2))).toDF("vec_id", "embedding"), sName, flagsRoot, 1L,
        bucketCap = 1)
      val a1 = audit(1L)
      assert(!a1.contains("\"capped_buckets\":0"), a1)
      assert(a1.contains("\"capped_rows\""), a1)
      val f1 = spark.read.parquet(s"$flagsRoot/batch_id=1")
        .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap
      assert(f1 == Map(200L -> false), s"capped bucket must skip the candidate: $f1")
      // the audit survives a committed-batch replay (skip arm rewrites
      // nothing)
      CorpusStream.ingestEmbeddingsBatch(spark,
        Seq((200L, vec(2))).toDF("vec_id", "embedding"), sName, flagsRoot, 1L,
        bucketCap = 1)
      assert(audit(1L) == a1)
    } finally EmbeddingStore.drop(spark, sName)
  }

  test("corpus ingest crash windows: death after appends recovers and re-runs identically; death before pending-clear discharges and skips") {
    import graft.streaming.CorpusStream
    import graft.dedup.{SignatureStore, StoreGuard}
    val docs = Tables.documents(spark, sfDir)
    val hist = docs.filter(col("doc_id") % 10 === 0)
    val batch = docs.filter(col("doc_id") % 10 === 1)
    val sName = "graft_cstream_crash_spec"
    val bName = "graft_cbatch_crash_spec"
    Seq(sName, bName).foreach(SignatureStore.drop(spark, _))
    SignatureStore.build(spark, hist, sName)
    SignatureStore.build(spark, hist, bName)
    val flagsRoot = java.nio.file.Files.createTempDirectory("graft-crash-flags").toString
    val fs = new org.apache.hadoop.fs.Path(flagsRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = s"$flagsRoot/batch_id=7"
    val marker = new org.apache.hadoop.fs.Path(s"$part/_COMMITTED")
    try {
      // window A: the writer dies AFTER the appends and gen bump but
      // BEFORE the commit marker — flags are on disk, the store holds
      // the batch, pending still authorizes recovery
      val e = intercept[RuntimeException](SignatureStore.ingest(spark, batch, sName,
        onFlags = f => f.write.mode("overwrite").parquet(part),
        onCommitted = () => sys.error("died before the marker")))
      assert(e.getMessage.contains("died"), e.getMessage)
      assert(!fs.exists(marker))
      // the redelivered batch must recover (undo the half-committed
      // appends) and re-run to the IDENTICAL flags — never re-dedupe
      // the batch against its own survivors
      CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 7L)
      assert(fs.exists(marker), "re-run must commit")
      val got = spark.read.parquet(part).collect().map(_.toString).sorted.toSeq
      val want = SignatureStore.ingest(spark, batch, bName)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, "recovered re-run must reproduce the batch-API flags")

      // window B: the writer dies BETWEEN the marker and the pending
      // clear — manufacture its leftovers (pending + lock siblings of
      // the meta dir), then a replay must SKIP the ingest, discharge
      // the moot recovery state, and leave store + flags untouched
      val metaLoc = StoreGuard.tableLocation(spark, SignatureStore.metaTable(sName))
      val pendingP = new org.apache.hadoop.fs.Path(metaLoc.getParent, metaLoc.getName + ".pending")
      val lockP = new org.apache.hadoop.fs.Path(metaLoc.getParent, metaLoc.getName + ".lock")
      val out = fs.create(pendingP, true)
      try out.write("bogus-snapshot-line".getBytes("UTF-8")) finally out.close()
      // a REAL dead writer's lock carries its stamp — the owner gate
      // refuses an unverifiable one (that's the live-writer protection
      // tested separately below)
      locally {
        val lo = fs.create(lockP, true)
        try lo.write(StoreGuard.ownerStampFor(deadPid()).getBytes("UTF-8"))
        finally lo.close()
      }
      val tables = Seq(SignatureStore.bandsTable(sName),
        SignatureStore.shinglesTable(sName), SignatureStore.sizesTable(sName))
      val files0 = tables.map(StoreGuard.dataFileCount(spark, _)).sum
      CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 7L)
      assert(!fs.exists(pendingP), "moot pending must be discharged")
      assert(!fs.exists(lockP), "dead writer's lock must be released")
      assert(tables.map(StoreGuard.dataFileCount(spark, _)).sum == files0,
        "skip path must not touch the store")
      assert(spark.read.parquet(part).collect().map(_.toString).sorted.toSeq == got,
        "skip path must not touch the flags")
      // and the store still accepts the NEXT batch normally
      CorpusStream.ingestBatch(spark, docs.filter(col("doc_id") % 10 === 2),
        sName, flagsRoot, 8L)
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$flagsRoot/batch_id=8/_COMMITTED")))
      // every committed text batch carries its band-bucket accounting
      // (the embedding twin's _lsh_audit.json contract)
      val bAudit = new org.apache.hadoop.fs.Path(s"$flagsRoot/batch_id=8/_band_audit.json")
      assert(fs.exists(bAudit), s"missing $bAudit")
      locally {
        val in = fs.open(bAudit)
        val j = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        assert(j.contains("\"occupied_buckets\":") && j.contains("\"max_bucket\":"), j)
      }

      // window C: the writer dies BETWEEN lock acquisition and the
      // pending write — lock on disk, no pending, no marker. recover()
      // has nothing to key off, so without the plain-run arm's
      // discharge the redelivered ingest would fail fast on the dead
      // lock on every retry (crash-loop). The stream must verify the
      // stamped owner is DEAD, discharge the stale lock, and run the
      // batch to a normal commit. (A real predecessor stamps its lock
      // at acquisition; fabricate the same state with a genuinely dead
      // pid — a reaped child process.)
      fs.createNewFile(lockP)
      locally {
        val out = fs.create(lockP, true)
        try out.write(StoreGuard.ownerStampFor(deadPid()).getBytes("UTF-8"))
        finally out.close()
      }
      // proof the lock genuinely blocks a direct ingest
      val locked = intercept[RuntimeException](
        SignatureStore.ingest(spark, docs.filter(col("doc_id") % 10 === 3), sName))
      assert(locked.getMessage.contains("locked"), locked.getMessage)
      CorpusStream.ingestBatch(spark, docs.filter(col("doc_id") % 10 === 3),
        sName, flagsRoot, 9L)
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$flagsRoot/batch_id=9/_COMMITTED")),
        "stale pending-less lock must be discharged, not crash-looped on")
      assert(!fs.exists(lockP), "batch completion releases the discharged lock")

      // pending-proof gate: a replay of a CLEANLY committed batch must
      // not delete a lock some other (live) writer holds — there is no
      // pending file, so dischargeCommitted has no proof of a dead
      // writer and must leave the lock alone
      fs.createNewFile(lockP)
      CorpusStream.ingestBatch(spark, docs.filter(col("doc_id") % 10 === 3),
        sName, flagsRoot, 9L)
      assert(fs.exists(lockP),
        "committed-batch replay must not break a live writer's lock")
      fs.delete(lockP, false)

      // window D (marker + no pending + DEAD lock): the writer died
      // between its pending clear and its own unlock. The marker is
      // durable proof the mutation committed, so the replay must
      // release the dead predecessor's lock — an AvailableNow stream
      // whose LAST batch died there would otherwise stay locked until
      // a manual unlock
      locally {
        val out = fs.create(lockP, true)
        try out.write(StoreGuard.ownerStampFor(deadPid()).getBytes("UTF-8"))
        finally out.close()
      }
      CorpusStream.ingestBatch(spark, docs.filter(col("doc_id") % 10 === 3),
        sName, flagsRoot, 9L)
      assert(!fs.exists(lockP),
        "committed-batch replay must release a verifiably-dead predecessor's lock")
    } finally {
      Seq(sName, bName).foreach(SignatureStore.drop(spark, _))
    }
  }

  test("fresh-JVM replay: streaming ingest arbitrates crash state through ensureRegistered EXTERNAL entries; drill seams fire at the real windows") {
    // pins what the r19 CLI proof drove through 20 fresh JVMs (r18
    // verdict #2): the streaming wrapper's marker/pending arbitration
    // working against a fresh JVM's catalog — ensureRegistered EXTERNAL
    // entries, the state in-JVM specs' MANAGED entries structurally
    // never see and where the embedding store hid its
    // saveAsTable-vs-EXTERNAL bug for four rounds. Also pins the
    // `--inject-crash` drill seams at their REAL windows: onFlagsWritten
    // must fire before any append reaches the store (so halting there
    // leaves the mid-mutation state the proof crashed into), and
    // onMarkerWritten with the marker already durable.
    import graft.streaming.CorpusStream
    import graft.dedup.{SignatureStore, StoreGuard}
    val docs = Tables.documents(spark, sfDir)
    val sName = "graft_cstream_xjvm_spec"
    SignatureStore.drop(spark, sName)
    SignatureStore.build(spark, docs.filter(col("doc_id") % 10 === 0), sName)
    val flagsRoot = java.nio.file.Files.createTempDirectory("graft-xjvm-flags").toString
    val fs = new org.apache.hadoop.fs.Path(flagsRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables = Seq(SignatureStore.bandsTable(sName), SignatureStore.shinglesTable(sName),
      SignatureStore.sizesTable(sName), SignatureStore.metaTable(sName))
    def dataFiles = tables.init.map(StoreGuard.dataFileCount(spark, _)).sum
    try {
      // batch 0, clean commit — with the seam contract asserted live
      val marker0 = new org.apache.hadoop.fs.Path(s"$flagsRoot/batch_id=0/_COMMITTED")
      val files0 = dataFiles
      var filesAtFlagsSeam = -1L
      var markerAtFlagsSeam = true
      var markerAtMarkerSeam = false
      CorpusStream.ingestBatch(spark, docs.filter(col("doc_id") % 10 === 1),
        sName, flagsRoot, 0L,
        onFlagsWritten = () => {
          filesAtFlagsSeam = dataFiles
          markerAtFlagsSeam = fs.exists(marker0)
        },
        onMarkerWritten = () => markerAtMarkerSeam = fs.exists(marker0))
      assert(filesAtFlagsSeam == files0,
        "after-flags seam must fire before any append reaches the store")
      assert(!markerAtFlagsSeam, "after-flags seam must fire before the marker")
      assert(markerAtMarkerSeam, "after-marker seam must fire with the marker durable")

      // fresh-JVM catalog: stash each table dir aside across DROP (a
      // managed DROP deletes files), then re-register — EXTERNAL entries
      val conf = spark.sparkContext.hadoopConfiguration
      tables.foreach { t =>
        val loc = StoreGuard.tableLocation(spark, t)
        val tfs = loc.getFileSystem(conf)
        val save = new org.apache.hadoop.fs.Path(loc.getParent, loc.getName + ".xjvm")
        assert(tfs.rename(loc, save), s"stash $t")
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
        assert(tfs.rename(save, loc), s"restore $t")
      }
      SignatureStore.ensureRegistered(spark, sName)

      // the after-flags crash window for batch 1 (what --inject-crash
      // after-flags leaves): flags partition without marker, pending on
      // disk; the in-process throw releases the claimed lock (the r17
      // failure-path contract), so restore the hard-halt's stamped
      // dead-writer lock by hand
      val batch1 = docs.filter(col("doc_id") % 10 === 2)
      val part1 = s"$flagsRoot/batch_id=1"
      val e = intercept[RuntimeException](SignatureStore.ingest(spark, batch1, sName,
        onFlags = f => {
          f.write.mode("overwrite").parquet(part1)
          sys.error("halt after flags (drill window)")
        }))
      assert(e.getMessage.contains("halt after flags"), e.getMessage)
      val preCrashFlags = spark.read.parquet(part1).collect().map(_.toString).sorted.toSeq
      val metaLoc = StoreGuard.tableLocation(spark, SignatureStore.metaTable(sName))
      val lockP = new org.apache.hadoop.fs.Path(metaLoc.getParent, metaLoc.getName + ".lock")
      locally {
        val out = fs.create(lockP, true)
        try out.write(StoreGuard.ownerStampFor(deadPid()).getBytes("UTF-8"))
        finally out.close()
      }
      // the redelivered batch must arbitrate (dead owner ⇒ recover),
      // re-run through the EXTERNAL entries, and commit IDENTICAL flags
      CorpusStream.ingestBatch(spark, batch1, sName, flagsRoot, 1L)
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$part1/_COMMITTED")))
      assert(spark.read.parquet(part1).collect().map(_.toString).sorted.toSeq
        == preCrashFlags, "replayed flags must be idempotent")
      assert(!fs.exists(lockP), "the dead writer's lock must be released")

      // the marker→pending-clear residue window, still through the
      // EXTERNAL entries: fabricate the dead writer's pending + lock
      // beside batch 1's committed marker — the replay must discharge
      // and SKIP (no store mutation, flags untouched)
      val pendingP = new org.apache.hadoop.fs.Path(metaLoc.getParent, metaLoc.getName + ".pending")
      locally {
        val out = fs.create(pendingP, true)
        try out.write("bogus-snapshot-line".getBytes("UTF-8")) finally out.close()
        val lo = fs.create(lockP, true)
        try lo.write(StoreGuard.ownerStampFor(deadPid()).getBytes("UTF-8"))
        finally lo.close()
      }
      val filesBefore = dataFiles
      CorpusStream.ingestBatch(spark, batch1, sName, flagsRoot, 1L)
      assert(!fs.exists(pendingP) && !fs.exists(lockP),
        "moot recovery state must be discharged on the committed replay")
      assert(dataFiles == filesBefore, "skip path must not touch the store")

      // the store stays fully usable through the EXTERNAL entries: a
      // replayed doc in the next batch flags dup against the history
      val replayed = docs.filter(col("doc_id") % 10 === 1)
      CorpusStream.ingestBatch(spark, replayed, sName, flagsRoot, 2L)
      val flags2 = spark.read.parquet(s"$flagsRoot/batch_id=2")
      assert(flags2.filter(col("is_dup")).count() == replayed.count(),
        "every replayed doc must flag dup against the surviving history")
    } finally SignatureStore.drop(spark, sName)
  }

  test("owner-stamped locks: a LIVE foreign writer's lock fails the batch fast; maintenance and a stream interleave safely") {
    import graft.streaming.CorpusStream
    import graft.dedup.{SignatureStore, StoreGuard}
    val docs = Tables.documents(spark, sfDir)
    val sName = "graft_cstream_owner_spec"
    SignatureStore.drop(spark, sName)
    SignatureStore.build(spark, docs.filter(col("doc_id") % 10 === 0), sName)
    val flagsRoot = java.nio.file.Files.createTempDirectory("graft-owner-flags").toString
    val metaLoc = StoreGuard.tableLocation(spark, SignatureStore.metaTable(sName))
    val lockP = new org.apache.hadoop.fs.Path(metaLoc.getParent, metaLoc.getName + ".lock")
    val fs = lockP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batch = docs.filter(col("doc_id") % 10 === 1)
    try {
      // a lock stamped by a LIVE pid (this very JVM — what a concurrent
      // maintenance sweep in another session looks like): the batch
      // must FAIL with instructions, never silently delete the lock
      locally {
        val out = fs.create(lockP, true)
        try out.write(StoreGuard.ownerStampFor(
          ProcessHandle.current().pid()).getBytes("UTF-8"))
        finally out.close()
      }
      val live = intercept[RuntimeException](
        CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 0L))
      assert(live.getMessage.contains("STILL ALIVE"), live.getMessage)
      assert(fs.exists(lockP), "a live foreign writer's lock must survive the failed batch")

      // an UNSTAMPED lock (external tool, pre-stamp writer): deadness
      // is unverifiable, so the batch must also fail fast
      locally {
        val out = fs.create(lockP, true)
        try out.write(Array.emptyByteArray) finally out.close()
      }
      val unk = intercept[RuntimeException](
        CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 0L))
      assert(unk.getMessage.contains("no owner stamp"), unk.getMessage)
      // the refusal carries the operator's disambiguation guidance:
      // every engine claim path stamps, so an unstamped lock is a
      // pre-stamp legacy writer's or a crash inside the create→stamp
      // window — the message must say which and how to tell
      assert(unk.getMessage.contains("PRE-STAMP LEGACY"), unk.getMessage)
      assert(unk.getMessage.contains("create→stamp window"), unk.getMessage)
      fs.delete(lockP, false)

      // live interleave: maintenance (compact) holds the real lock in
      // another thread while a micro-batch arrives — the batch fails
      // fast; once maintenance releases, the SAME batch commits
      val hold = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => SignatureStore.locked(spark, sName) {
        hold.countDown(); release.await()
      })
      t.start(); hold.await()
      try {
        val busy = intercept[RuntimeException](
          CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 1L))
        assert(busy.getMessage.contains("STILL ALIVE"), busy.getMessage)
      } finally { release.countDown(); t.join() }
      CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 1L)
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$flagsRoot/batch_id=1/_COMMITTED")),
        "after maintenance releases the lock the stream proceeds normally")

      // a LIVE foreign ingest mid-flight (owner-stamped pending +
      // live-stamped lock): BOTH replay arms must leave its state
      // alone. The plain-run arm must not auto-recover (that would roll
      // back the live writer's in-flight appends) — it fails fast
      // instead; a committed-batch replay must not clear the live
      // writer's pending either (its stamp differs from the marker
      // writer's, and its owner is alive).
      val pendingP = new org.apache.hadoop.fs.Path(
        metaLoc.getParent, metaLoc.getName + ".pending")
      locally {
        val stamp = StoreGuard.ownerStampFor(ProcessHandle.current().pid())
        val po = fs.create(pendingP, true)
        try po.write(s"#owner $stamp\nlive-writer-snapshot".getBytes("UTF-8"))
        finally po.close()
        val lo = fs.create(lockP, true)
        try lo.write(stamp.getBytes("UTF-8"))
        finally lo.close()
      }
      val liveRec = intercept[RuntimeException](
        CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 5L))
      assert(liveRec.getMessage.contains("refusing automatic recovery"),
        liveRec.getMessage)
      assert(fs.exists(pendingP) && fs.exists(lockP),
        "a live writer's pending and lock must survive the refused recovery")
      // committed-batch replay (batch 1 committed above): the
      // pending-gated discharge must ALSO respect the live owner
      CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 1L)
      assert(fs.exists(pendingP) && fs.exists(lockP),
        "a committed replay must not discharge a live writer's pending/lock")
      fs.delete(pendingP, false); fs.delete(lockP, false)

      // a foreign writer DEAD mid-mutation (stamped pending from a dead
      // pid ≠ the marker writer, dead lock, partial append on disk):
      // the committed-batch replay must RECOVER — roll the foreign
      // writer's partial appends back to ITS snapshot — never treat the
      // pending as the marker writer's moot residue (which would keep
      // the partial appends and destroy the rollback authorization)
      val bandsLoc = StoreGuard.tableLocation(spark, SignatureStore.bandsTable(sName))
      val junk = new org.apache.hadoop.fs.Path(bandsLoc, "part-foreign-partial.parquet")
      locally {
        val snap = SignatureStore.snapshot(spark, sName) // pre-mutation state
        val stamp = StoreGuard.ownerStampFor(deadPid())
        val po = fs.create(pendingP, true)
        try po.write((s"#owner $stamp\n" + snap.mkString("\n")).getBytes("UTF-8"))
        finally po.close()
        val jo = fs.create(junk, true) // the foreign writer's partial append
        try jo.write("partial".getBytes("UTF-8")) finally jo.close()
        val lo = fs.create(lockP, true)
        try lo.write(stamp.getBytes("UTF-8")) finally lo.close()
      }
      CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 1L)
      assert(!fs.exists(junk),
        "a dead foreign writer's partial appends must be rolled back, not adopted")
      assert(!fs.exists(pendingP) && !fs.exists(lockP),
        "the recovered foreign state must be fully discharged")

      // same-writer residue (pending stamped by the marker writer
      // itself, lock already gone): the predecessor died between its
      // pending clear steps — moot residue, discharged without rollback
      locally {
        val po = fs.create(pendingP, true)
        try po.write((s"#owner ${StoreGuard.ownerStamp}\nmoot-residue")
          .getBytes("UTF-8"))
        finally po.close()
      }
      CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 1L)
      assert(!fs.exists(pendingP),
        "the marker writer's own post-commit pending is moot residue — discharged")

      // same-writer residue with the predecessor's DEAD lock still on
      // disk (died between marker and pending clear, lock file never
      // released): the discharge proceeds UNDER that lock — pending
      // cleared first, lock released after (the reorder that closed the
      // lock-delete-first TOCTOU window)
      locally {
        val po = fs.create(pendingP, true)
        try po.write((s"#owner ${StoreGuard.ownerStamp}\nmoot-residue")
          .getBytes("UTF-8"))
        finally po.close()
        val lo = fs.create(lockP, true)
        try lo.write(StoreGuard.ownerStampFor(deadPid()).getBytes("UTF-8"))
        finally lo.close()
      }
      CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 1L)
      assert(!fs.exists(pendingP) && !fs.exists(lockP),
        "same-writer residue under a dead lock must discharge both")

      // same-writer residue under a LIVE lock: the claim is lost to an
      // owner that cannot be proven dead, so the replay's best-effort
      // discharge leaves EVERYTHING — pending and lock both survive
      locally {
        val po = fs.create(pendingP, true)
        try po.write((s"#owner ${StoreGuard.ownerStamp}\nmoot-residue")
          .getBytes("UTF-8"))
        finally po.close()
        val lo = fs.create(lockP, true)
        try lo.write(StoreGuard.ownerStampFor(
          ProcessHandle.current().pid()).getBytes("UTF-8"))
        finally lo.close()
      }
      CorpusStream.ingestBatch(spark, batch, sName, flagsRoot, 1L)
      assert(fs.exists(pendingP) && fs.exists(lockP),
        "a live lock gates the discharge — nothing is touched")
      fs.delete(pendingP, false); fs.delete(lockP, false)
    } finally SignatureStore.drop(spark, sName)
  }
}
