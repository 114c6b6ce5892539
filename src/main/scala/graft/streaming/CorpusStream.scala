package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dedup.SignatureStore
import graft.similarity.EmbeddingStore

/** Structured-Streaming runtime for CONTINUOUS corpus ingestion — the
  * incremental form of the d08/s06 cadence (daily batch → dedupe
  * against the persistent [[SignatureStore]]/[[EmbeddingStore]] →
  * append survivors): arriving files become micro-batches, each
  * micro-batch runs the identical store ingest, and the per-document
  * flags land in a batch-partitioned parquet log. `foreachBatch` is the
  * right streaming primitive here because the STORE is the state —
  * bucketed on disk, shared with the batch CLI and the maintenance
  * jobs — and Spark's managed streaming state (per-query,
  * checkpoint-owned) cannot be that.
  *
  * Exactly-once under checkpoint redelivery, by construction (never by
  * re-running the dedup against a store the previous attempt already
  * mutated — re-ingesting a committed batch would re-dedupe it against
  * its own survivors, with subtle wrong flags on transitive duplicate
  * chains):
  *
  *  - the store ingest already persists its pre-batch snapshot (the
  *    pending file) for the whole mutation and restores it on
  *    [[SignatureStore.recover]];
  *  - the flag partition is written BEFORE any append (ingest's
  *    `onFlags` hook), so a crash mid-append rolls the store back and
  *    the re-run — starting from the identical pre-batch state —
  *    overwrites the partition with identical content;
  *  - a durable `_COMMITTED` marker lands inside the flag partition
  *    after the appends and the generation bump, BEFORE the pending
  *    file clears (ingest's `onCommitted` hook).
  *
  * Replay decision at batch start: marker present → the batch fully
  * committed (flags included — they precede the marker): SKIP, only
  * discharging the moot recovery state a writer dead in the
  * marker→pending-clear window still owes (pending-gated, so a clean
  * completion's replay touches nothing). Marker absent + pending
  * present → the attempt died mid-mutation: recover restores the
  * pre-batch store and the batch re-runs cleanly. Marker absent + no
  * pending → nothing durable happened: plain run, first discharging a
  * lock a predecessor dead BETWEEN lock acquisition and the pending
  * write left behind (that window leaves no pending file for recover()
  * to key off, and without the discharge the redelivered ingest would
  * fail fast on the dead lock forever). Every crash window falls into
  * exactly one arm, so a redelivered batch never appends and never
  * changes a flag.
  *
  * Single-writer contract: the stream owns the store for its lifetime
  * (micro-batches are sequential, so ANY recovery state — pending file
  * or bare lock — found at batch start can only belong to this query's
  * own crashed predecessor, which is exactly why the plain-run arm may
  * discharge a pending-less lock). The flip side: with `autoRecover =
  * true` a foreign writer must NOT share the store — its lock would be
  * discharged, not failed on. If a foreign writer may share the store,
  * pass `autoRecover = false` and arbitrate recovery manually.
  */
object CorpusStream {

  /** File-source stream over parquet document files (streaming reads
    * don't infer — the driver-table schema is fixed up front).
    */
  def read(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** The commit-marker protocol around one store ingest (see class
    * doc) — shared by both store flavors. `run(partition, onCommitted)`
    * executes the store ingest with the two hooks bound.
    */
  private def committed(spark: SparkSession, flagsRoot: String, batchId: Long,
      autoRecover: Boolean, recoverStore: () => Boolean, discharge: () => Unit,
      forceUnlock: () => Unit)
      (run: (String, () => Unit) => Unit): Unit = {
    val part = new Path(s"$flagsRoot/batch_id=$batchId")
    val marker = new Path(part, "_COMMITTED")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) {
      // fully committed: discharge only what a writer dead in the
      // marker→pending-clear window still owes. dischargeCommitted is
      // pending-gated, so a replay of a CLEANLY completed batch (no
      // recovery state at all) is a strict no-op — it can never delete
      // a lock some other writer holds
      if (autoRecover) discharge()
      return
    }
    if (autoRecover && !recoverStore()) {
      // recover() found no pending file and deliberately left the lock
      // alone (in general it could belong to a live build/drop) — but
      // under the stream's single-writer contract ANY lock found at
      // batch start belongs to a dead predecessor that died between
      // lock acquisition and the pending write, i.e. before anything
      // durable happened: discharge it here, or this batch's ingest
      // fails fast on the dead lock on every redelivery and the
      // streaming query crash-loops until a manual unlock
      forceUnlock()
    }
    run(part.toString, () => { fs.createNewFile(marker); () })
  }

  /** One micro-batch of the document ingest stream, factored out so the
    * exactly-once contract is testable without a streaming query:
    * re-invoking with the same (batch, batchId) after a completed run is
    * a pure no-op; after a crash it resumes per the protocol above.
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, storeName: String,
      flagsRoot: String, batchId: Long, threshold: Double = 0.5,
      autoRecover: Boolean = true): Unit = {
    SignatureStore.ensureRegistered(spark, storeName)
    committed(spark, flagsRoot, batchId, autoRecover,
      () => SignatureStore.recover(spark, storeName),
      () => SignatureStore.dischargeCommitted(spark, storeName),
      () => SignatureStore.unlock(spark, storeName)) { (part, mark) =>
      // band-bucket histogram persisted per batch as the embedding
      // twin persists `_lsh_audit.json` — after the flags parquet
      // (whose overwrite clears the partition), before the marker
      val audit = new java.util.concurrent.atomic.AtomicReference[
        Option[SignatureStore.IngestAudit]](None)
      SignatureStore.ingest(spark, batch, storeName, threshold,
        onFlags = f => {
          f.write.mode("overwrite").parquet(part)
          audit.get().foreach { a =>
            val p = new Path(part, "_band_audit.json")
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            val out = fs.create(p, true)
            try out.write(a.json.getBytes("UTF-8")) finally out.close()
          }
        },
        onCommitted = mark,
        onAudit = a => audit.set(Some(a)))
      ()
    }
  }

  /** The continuous ingest query: documents stream in, flags stream out
    * at `flagsRoot` (read the log with `spark.read.parquet(flagsRoot)` —
    * `batch_id` arrives as a partition column), the store grows by
    * survivors. AvailableNow by default: drain what exists, checkpoint,
    * stop — the cron-to-streaming migration path, same as
    * [[EventStream.upsertStream]].
    */
  def ingestStream(docs: DataFrame, storeName: String, flagsRoot: String,
      checkpoint: String, threshold: Double = 0.5, autoRecover: Boolean = true,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestBatch(batch.sparkSession, batch.toDF(), storeName, flagsRoot,
          batchId, threshold, autoRecover)
      }
      .start()

  // ---- embedding twin (the s06 cadence, same contract throughout) ----

  /** File-source stream over parquet embedding files. */
  def readEmbeddings(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** One micro-batch of the embedding ingest stream — the
    * [[EmbeddingStore]] twin of [[ingestBatch]], same protocol. The
    * ingest's LSH bucket audit is persisted as `_lsh_audit.json` inside
    * the batch's flag partition (underscore-prefixed, so parquet
    * readers of the flag log skip it): cap drops are recall loss, and a
    * continuously-running query has no daily notification mail — the
    * flag log IS its run report. Written after the flags parquet (whose
    * overwrite clears the partition dir) and before the `_COMMITTED`
    * marker, so a committed batch always carries its accounting and a
    * crashed one is rewritten on the re-run.
    */
  def ingestEmbeddingsBatch(spark: SparkSession, batch: DataFrame, storeName: String,
      flagsRoot: String, batchId: Long, threshold: Double = 0.9,
      autoRecover: Boolean = true, bucketCap: Int = 1000): Unit = {
    EmbeddingStore.ensureRegistered(spark, storeName)
    committed(spark, flagsRoot, batchId, autoRecover,
      () => EmbeddingStore.recover(spark, storeName),
      () => EmbeddingStore.dischargeCommitted(spark, storeName),
      () => EmbeddingStore.unlock(spark, storeName)) { (part, mark) =>
      val audit = new java.util.concurrent.atomic.AtomicReference[
        Option[EmbeddingStore.IngestAudit]](None)
      EmbeddingStore.ingest(spark, batch, storeName, threshold = threshold,
        onFlags = f => {
          f.write.mode("overwrite").parquet(part)
          audit.get().foreach { a =>
            val p = new Path(part, "_lsh_audit.json")
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            val out = fs.create(p, true)
            try out.write(a.json.getBytes("UTF-8")) finally out.close()
          }
        },
        onCommitted = mark,
        bucketCap = bucketCap,
        onAudit = a => audit.set(Some(a)))
      ()
    }
  }

  /** The continuous embedding-ingest query — [[ingestStream]]'s twin. */
  def ingestEmbeddingsStream(vecs: DataFrame, storeName: String, flagsRoot: String,
      checkpoint: String, threshold: Double = 0.9, autoRecover: Boolean = true,
      bucketCap: Int = 1000,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestEmbeddingsBatch(batch.sparkSession, batch.toDF(), storeName,
          flagsRoot, batchId, threshold, autoRecover, bucketCap)
      }
      .start()
}
