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
    // bulk of history must have been emitted and agree exactly
    assert(streamed.size >= batch.size / 2, s"only ${streamed.size}/${batch.size} windows emitted")
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
    // only user 5's first session is closed (the rest are still open)
    assert(sessions.toSeq == Seq(EventStream.Session(5, 0, 10 * us, 2, 2.0)))
  }
}
