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
    *     (only on this path) and truncate ns→µs, matching DuckDB's cast
    *     so differential results agree.
    *   - TIMESTAMP_NTZ (µs, no isAdjustedToUTC): cast to TimestampType —
    *     value-identical under the pinned UTC session TZ, matching the
    *     DuckDB oracle's direct µs read.
    *   - TimestampType (µs): pass through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw =
      try apply(spark, dir, "events")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          apply(spark, dir, "events")
      }
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
