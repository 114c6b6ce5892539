package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table/DDL management (SURVEY.md §2.D6) — the engine's form of the
  * reference's entity-creation scripts
  * (`/root/reference/dataverse_table_creation/create_oarsbidata_table.py:58-328`):
  * declared schemas, a business-key column as the MERGE identity, and
  * physical layout tuned for keyed upserts.
  *
  * The alternate-key concept maps to (a) the MERGE join condition and
  * (b) bucketing the table by the key so merge joins are co-located —
  * at 100 TB a bucketed MERGE shuffles only the (small) updates side.
  */
object TableManager {

  /** Create the table if absent: parquet-backed, bucketed by the
    * business key for co-located merges, optionally partitioned.
    */
  def ensureKeyedTable(
      spark: SparkSession,
      name: String,
      schema: StructType,
      businessKey: String,
      buckets: Int = 16,
      partitionCols: Seq[String] = Nil): Unit = {
    require(schema.fieldNames.contains(businessKey), s"schema lacks key column $businessKey")
    if (!spark.catalog.tableExists(name)) {
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      val writer = empty.write.format("parquet")
        .bucketBy(buckets, businessKey)
        .sortBy(businessKey)
      val partitioned =
        if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer
      partitioned.saveAsTable(name)
    }
  }

  /** MERGE updates into a managed keyed table. Parquet is not
    * transactional, so the merge stages to a scratch path first (Spark
    * refuses to overwrite a table its own plan reads); with a
    * transactional format (Delta/Iceberg) this collapses to a real
    * `MERGE INTO` and the staging write disappears.
    */
  def mergeInto(spark: SparkSession, name: String, updates: DataFrame,
      businessKey: String): Unit = {
    val target = spark.table(name)
    val merged = MergeWriter.merge(target, updates, Seq(businessKey))
    val staging = java.nio.file.Files.createTempDirectory(s"graft-merge-$name").toString
    merged.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").insertInto(name)
  }

  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")
}
