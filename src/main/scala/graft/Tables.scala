package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader over the driver-provided star schema
  * (`/root/testdata/sf*` — see TESTDATA.md). All engine queries read
  * through here so a scale-factor directory is the only location input.
  *
  * At cluster scale the same API fronts partitioned Parquet/Delta tables;
  * Catalyst predicate pushdown + partition pruning apply unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** The driver has regenerated events.parquet with different `ts`
    * physical types across rounds (TIMESTAMP(NANOS), then µs
    * TIMESTAMP_NTZ), so branch on the read schema rather than assuming
    * one encoding:
    *   - TIMESTAMP(NANOS): Spark rejects it outright
    *     ([PARQUET_TYPE_ILLEGAL]) — enable the legacy nanos-as-long read
    *     and truncate ns→µs, matching DuckDB's cast so differential
    *     results agree. NOTE: the conf stays set for the rest of the
    *     session (restoring it right after the re-read would break the
    *     lazy scan, which consults it at execution time); any later
    *     TIMESTAMP(NANOS) parquet in the same session therefore also
    *     surfaces as long — which this normalizer is the only reader of.
    *   - TIMESTAMP_NTZ (µs, no isAdjustedToUTC): cast to TimestampType —
    *     value-identical under the pinned UTC session TZ, matching the
    *     DuckDB oracle's direct µs read.
    *   - TimestampType (µs): pass through.
    *   - Anything else (e.g. a future native BIGINT ts whose unit we
    *     can't know) fails loudly rather than guessing a divisor.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // the conf being already on means an earlier events() in this
    // session took the nanos retry — this read's LongType ts is then the
    // same nanos encoding surfaced directly, not an unknown-unit BIGINT
    def nanosConfOn: Boolean =
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")
    val (raw, usedNanosRetry) =
      try (apply(spark, dir, "events"), nanosConfOn)
      catch {
        case e: Throwable if isParquetNanosIllegal(e) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          (apply(spark, dir, "events"), true)
      }
    normalizeEventsTs(raw, usedNanosRetry)
  }

  /** True iff the read failed because of parquet TIMESTAMP(NANOS)
    * columns. Matches the stable error class first (Spark 4 surfaces it
    * via SparkThrowable), with message-contains as a fallback for
    * wrapper exceptions.
    */
  private[graft] def isParquetNanosIllegal(e: Throwable): Boolean = {
    val byClass = e match {
      case st: org.apache.spark.SparkThrowable =>
        st.getCondition == "PARQUET_TYPE_ILLEGAL"
      case _ => false
    }
    byClass || Option(e.getMessage).exists(_.contains("PARQUET_TYPE_ILLEGAL"))
  }

  /** Normalize the `ts` column of an events frame to TimestampType (µs).
    * `usedNanosRetry` records whether the frame was read under
    * `nanosAsLong` (so a LongType ts is known to be nanoseconds); a long
    * ts from any other source has an unknown unit and is an error.
    */
  private[graft] def normalizeEventsTs(raw: DataFrame, usedNanosRetry: Boolean): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType if usedNanosRetry =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (nanosRetry=$usedNanosRetry): " +
            "testdata encoding drifted again — add an explicit branch in Tables.events")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
