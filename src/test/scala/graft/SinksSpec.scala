package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sinks.{BatchSink, MergeWriter}

/** Sink specs: keyed MERGE semantics (D1/D3), last-writer dedup, dynamic
  * partition overwrite (D5), and the batched retrying uploader (D1's
  * connector path) including continue-on-error accounting and backoff.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("merge: updates replace matched keys, unmatched target survives") {
    val target = Seq((1, "old"), (2, "old"), (3, "old")).toDF("k", "v")
    val updates = Seq((2, "new"), (4, "new")).toDF("k", "v")
    val out = MergeWriter.merge(target, updates, Seq("k"))
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "old", 2 -> "new", 3 -> "old", 4 -> "new"))
  }

  test("latestPerKey: deterministic last-writer-wins with tiebreak") {
    val updates = Seq((1, 10, "a"), (1, 20, "b"), (1, 20, "c"), (2, 5, "d"))
      .toDF("k", "ts", "v")
    val out = MergeWriter.latestPerKey(updates, Seq("k"),
      col("ts").desc, col("v").desc)
      .select("k", "v").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "c", 2 -> "d"))
  }

  test("overwritePartitions replaces only the partitions present") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpo").toString
    val v1 = Seq((2024, "a"), (2025, "b")).toDF("fy", "v")
    MergeWriter.overwritePartitions(v1, dir, Seq("fy"))
    val v2 = Seq((2025, "b2")).toDF("fy", "v")
    MergeWriter.overwritePartitions(v2, dir, Seq("fy"))
    val out = spark.read.parquet(dir).select("fy", "v").as[(Int, String)].collect().toMap
    assert(out == Map(2024 -> "a", 2025 -> "b2"))
  }

  test("BatchSink batches, retries transient failures, counts outcomes") {
    SinksSpec.attempts.set(0)
    val uploader = new BatchSink.Uploader {
      def upload(batch: Seq[Row]): Seq[BatchSink.RowOutcome] = {
        // static counter: task closures are deserialized copies, but
        // local-mode tasks share the JVM so a companion object is shared
        if (SinksSpec.attempts.incrementAndGet() == 1)
          throw BatchSink.RetryableFailure("429", retryAfterMs = Some(1))
        batch.map { r =>
          val k = r.getAs[Long]("k")
          if (k % 10 == 0) BatchSink.Failed("bad row")
          else if (k % 2 == 0) BatchSink.Created
          else BatchSink.Updated
        }
      }
    }
    val df = spark.range(0, 100).toDF("k")
    val stats = BatchSink.write(df, uploader, batchSize = 25, sinkParallelism = Some(2))
    assert(stats.failed == 10)
    assert(stats.created == 40)
    assert(stats.updated == 50)
    assert(SinksSpec.attempts.get() >= 5) // 2 partitions x 2 batches, +1 retried
  }

  test("Scd2.merge: change closes+opens, no-op is silent, insert opens, history frozen") {
    import graft.sinks.Scd2
    def row(k: Long, v: Double, from: String, to: Option[String], cur: Int) =
      (k, v, java.sql.Date.valueOf(from), to.map(java.sql.Date.valueOf).orNull, cur)
    val dim = Seq(
      row(1L, 10.0, "2024-01-01", None, 1),             // will change
      row(2L, 20.0, "2024-01-01", None, 1),             // no-op update
      row(3L, 30.0, "2024-01-01", None, 1),             // untouched
      row(1L, 5.0, "2023-01-01", Some("2024-01-01"), 0) // closed history
    ).toDF("k", "v", "valid_from", "valid_to", "is_current")
    val updates = Seq((1L, 11.0), (2L, 20.0), (9L, 90.0)).toDF("k", "v")
    val out = Scd2.merge(dim, updates, "k", Seq("v"), lit("2024-06-01"))
      .as[(Long, Double, java.sql.Date, Option[java.sql.Date], Int)]
      .collect().toSet
    assert(out == Set(
      row(1L, 10.0, "2024-01-01", Some("2024-06-01"), 0), // closed at asOf
      row(1L, 11.0, "2024-06-01", None, 1),               // new version
      row(2L, 20.0, "2024-01-01", None, 1),               // no spurious version
      row(3L, 30.0, "2024-01-01", None, 1),               // untouched
      row(9L, 90.0, "2024-06-01", None, 1),               // brand-new key
      row(1L, 5.0, "2023-01-01", Some("2024-01-01"), 0)   // history frozen
    ).map { case (k, v, f, t, c) => (k, v, f, Option(t), c) })
    // a second identical wave is fully idempotent: every update is now a no-op
    val again = Scd2.merge(
      Scd2.merge(dim, updates, "k", Seq("v"), lit("2024-06-01")),
      updates, "k", Seq("v"), lit("2024-07-01"))
      .as[(Long, Double, java.sql.Date, Option[java.sql.Date], Int)]
      .collect().toSet
    assert(again == out)
  }

  test("Scd2.merge: duplicate update keys collapse to one deterministic row, no join fan-out") {
    import graft.sinks.Scd2
    val dim = Seq(
      (1L, 10.0, java.sql.Date.valueOf("2024-01-01"), null.asInstanceOf[java.sql.Date], 1))
      .toDF("k", "v", "valid_from", "valid_to", "is_current")
    // same key three times — a sloppy batch; the merge must not emit
    // three closed copies of the open row / three new open versions
    val updates = Seq((1L, 11.0), (1L, 12.0), (1L, 11.5)).toDF("k", "v")
    val out = Scd2.merge(dim, updates, "k", Seq("v"), lit("2024-06-01"))
      .as[(Long, Double, java.sql.Date, Option[java.sql.Date], Int)]
      .collect().toSeq
    assert(out.size == 2, s"expected exactly closed+open, got $out")
    assert(out.count(_._5 == 0) == 1 && out.count(_._5 == 1) == 1)
    // deterministic pick = max tracked struct (12.0), under any partitioning
    assert(out.find(_._5 == 1).get._2 == 12.0)
  }
}

object SinksSpec {
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
}
