package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.LongAccumulator

/** Distributed batched writer for external keyed-upsert sinks — the
  * Spark-native form of the reference's Dataverse `$batch` uploader
  * (`/root/reference/modules/dataverse.py:40-220`): 400-record batches,
  * continue-on-error with per-row created/updated/failed accounting,
  * exponential backoff honoring a server-supplied retry delay, bounded
  * retries. The reference fans out over a 6-thread pool on one box; here
  * each Spark task drains its partition, so parallelism = partitions and
  * the same code drives 6 local threads or 1000 executors.
  *
  * Idempotency contract: rows carry a deterministic business key
  * (graft.functions.Keys), so task retries re-PATCH the same keys —
  * exactly why the reference's alternate-key upsert is retry-safe
  * (SURVEY.md §7.5 risk 4).
  */
object BatchSink {

  /** One attempt against the external system. Implementations return
    * per-row outcomes; throw `RetryableFailure` for batch-level transient
    * errors (HTTP 429/5xx equivalents).
    */
  trait Uploader extends Serializable {
    def upload(batch: Seq[Row]): Seq[RowOutcome]
  }

  sealed trait RowOutcome
  case object Created extends RowOutcome
  case object Updated extends RowOutcome
  final case class Failed(reason: String) extends RowOutcome

  /** Transient batch failure; `retryAfterMs` mirrors Retry-After. */
  final case class RetryableFailure(msg: String, retryAfterMs: Option[Long] = None)
      extends RuntimeException(msg)

  final case class Stats(created: Long, updated: Long, failed: Long)

  /** Write `df` through `uploader` in `batchSize` chunks per partition.
    * Counts flow through accumulators (visible driver-side mid-job, like
    * the reference's rows/sec progress log `dataverse.py:213-219`).
    */
  def write(
      df: DataFrame,
      uploader: Uploader,
      batchSize: Int = 400,
      maxRetries: Int = 5,
      baseBackoffMs: Long = 1000,
      sinkParallelism: Option[Int] = None): Stats = {
    val sc = df.sparkSession.sparkContext
    val created = sc.longAccumulator("sink.created")
    val updated = sc.longAccumulator("sink.updated")
    val failed = sc.longAccumulator("sink.failed")

    // External systems throttle: cap concurrent writers independently of
    // the fact table's partitioning (the reference's "6-8 threads beats
    // 20 every time", load_csv.py:21).
    val sized = sinkParallelism.map(df.coalesce).getOrElse(df)

    sized.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(batchSize).foreach { batch =>
        val outcomes = uploadWithRetry(uploader, batch, maxRetries, baseBackoffMs)
        outcomes.foreach {
          case Created => created.add(1)
          case Updated => updated.add(1)
          case Failed(_) => failed.add(1)
        }
      }
    }
    Stats(created.value, updated.value, failed.value)
  }

  private def uploadWithRetry(
      uploader: Uploader,
      batch: Seq[Row],
      maxRetries: Int,
      baseBackoffMs: Long): Seq[RowOutcome] = {
    var attempt = 0
    while (true) {
      try return uploader.upload(batch)
      catch {
        case e: RetryableFailure if attempt < maxRetries =>
          val backoff = e.retryAfterMs.getOrElse(baseBackoffMs * (1L << attempt))
          Thread.sleep(backoff)
          attempt += 1
      }
    }
    Nil // unreachable
  }
}
