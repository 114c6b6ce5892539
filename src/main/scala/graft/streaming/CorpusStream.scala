package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.SignatureStore

/** Structured-Streaming runtime for CONTINUOUS corpus ingestion — the
  * incremental form of the d08 cadence (daily batch → dedupe against
  * the persistent [[SignatureStore]] → append survivors): arriving
  * document files become micro-batches, each micro-batch runs the
  * identical store ingest, and the per-document flags land in a
  * batch-partitioned parquet log. `foreachBatch` is the right streaming
  * primitive here because the STORE is the state — bucketed on disk,
  * shared with the batch CLI and the maintenance jobs — and Spark's
  * managed streaming state (which is per-query, checkpoint-owned)
  * cannot be that.
  *
  * Exactly-once story, in two halves:
  *  - The store: a batch's appends are all-or-nothing at the flag level
  *    (ingest's pending/rollback discipline), and a REPLAYED batch
  *    appends nothing — every previously-kept document now exact-matches
  *    its own stored copy, every previously-dropped one still matches
  *    whatever it matched before, so the store converges regardless of
  *    redelivery.
  *  - The flag log: a replayed keeper comes back `is_dup = true,
  *    dup_of = doc_id` — the SELF-match. It cannot mean anything else:
  *    had any other stored doc matched at the threshold, the original
  *    run would already have flagged it (the store only grew by this
  *    batch's survivors in between, and two surviving batch-mates above
  *    the threshold would have been clustered into one). Rewriting
  *    self-matches back to "kept" therefore reconstructs the original
  *    flags bit-for-bit, and the log write is `overwrite` into a
  *    `batch_id=N` partition — idempotent under checkpoint replay.
  *    (Corollary: doc_ids must be unique per corpus — re-crawling a
  *    CHANGED document under the same id would read as a replay.)
  *
  * Single-writer contract: the stream owns the store for its lifetime
  * (micro-batches are sequential, so a pending file found at batch
  * start can only be this query's own crashed predecessor — recovered
  * automatically when `autoRecover`). A concurrent manual ingest fails
  * fast on the store lock, by design; if a foreign writer may share the
  * store, pass `autoRecover = false` and arbitrate recovery manually.
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

  /** One micro-batch of the ingest stream, factored out so the
    * exactly-once contract is testable without a streaming query:
    * recover a crashed predecessor (optional), run the store ingest,
    * rewrite replay self-matches, overwrite the batch's flag partition.
    * Re-invoking with the same (batch, batchId) is a no-op on the store
    * and reproduces the identical flag partition.
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, storeName: String,
      flagsRoot: String, batchId: Long, threshold: Double = 0.5,
      autoRecover: Boolean = true): Unit = {
    SignatureStore.ensureRegistered(spark, storeName)
    if (autoRecover) SignatureStore.recover(spark, storeName)
    val flags = SignatureStore.ingest(spark, batch, storeName, threshold)
      // replay hygiene (see class doc): a self-match is a redelivered
      // keeper, not a duplicate — restore its original flag
      .withColumn("is_dup", col("is_dup") && col("dup_of") =!= col("doc_id"))
      .withColumn("dup_of", when(col("dup_of") =!= col("doc_id"), col("dup_of")))
    flags.write.mode("overwrite").parquet(s"$flagsRoot/batch_id=$batchId")
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
    * [[graft.similarity.EmbeddingStore]] twin of [[ingestBatch]]. The
    * replay argument carries over verbatim: a redelivered keeper
    * exact-matches its own stored vector (cosine 1.0 ≥ any threshold)
    * and nothing else (had another stored vector matched, the original
    * run would have flagged it; two surviving batch-mates above the
    * threshold would have been one cluster), so `dup_of == vec_id` is
    * the replay marker and the per-batch flag overwrite is idempotent.
    */
  def ingestEmbeddingsBatch(spark: SparkSession, batch: DataFrame, storeName: String,
      flagsRoot: String, batchId: Long, threshold: Double = 0.9,
      autoRecover: Boolean = true): Unit = {
    import graft.similarity.EmbeddingStore
    EmbeddingStore.ensureRegistered(spark, storeName)
    if (autoRecover) EmbeddingStore.recover(spark, storeName)
    val flags = EmbeddingStore.ingest(spark, batch, storeName, threshold = threshold)
      .withColumn("is_dup", col("is_dup") && col("dup_of") =!= col("vec_id"))
      .withColumn("dup_of", when(col("dup_of") =!= col("vec_id"), col("dup_of")))
    flags.write.mode("overwrite").parquet(s"$flagsRoot/batch_id=$batchId")
  }

  /** The continuous embedding-ingest query — [[ingestStream]]'s twin. */
  def ingestEmbeddingsStream(vecs: DataFrame, storeName: String, flagsRoot: String,
      checkpoint: String, threshold: Double = 0.9, autoRecover: Boolean = true,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestEmbeddingsBatch(batch.sparkSession, batch.toDF(), storeName,
          flagsRoot, batchId, threshold, autoRecover)
      }
      .start()
}
