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

  /** MERGE updates into a managed keyed table — partition-scoped: on a
    * partitioned table only the partitions present in `updates` are read
    * back, merged, and rewritten (dynamic partition overwrite); every
    * other partition's files stay physically untouched. That is the
    * semantics of the reference's sink — PATCH by alternate key touches
    * only the addressed rows (`/root/reference/modules/dataverse.py:88`)
    * — and the only shape that survives 100 TB, where a daily merge
    * touches the trailing fiscal-period partitions of a years-deep
    * table.
    *
    * Parquet is not transactional, so the merged partitions stage to a
    * scratch path on the warehouse filesystem first (the plan reads the
    * partitions it replaces, and a driver-local temp dir would not even
    * exist on a real cluster's executors — hence Hadoop `FileSystem`,
    * never `java.io.File`). With a transactional format (Delta/Iceberg)
    * this collapses to a real `MERGE INTO` and the staging disappears.
    * On an unpartitioned table the merge necessarily rewrites the table
    * — declare `partitionCols` in `ensureKeyedTable` to get the scoped
    * path.
    *
    * '''Moved-key contract''': partition columns must be functionally
    * derived from the business key (as in e16, where the FY is embedded
    * in the key). If a key's partition value could change between merges,
    * its stale row in the old partition would otherwise never be read or
    * rewritten — pass `removeMovedKeys = true` to detect those keys with
    * a key-join against the untouched partitions (an extra column-pruned
    * scan of the rest of the table) and rewrite the affected partitions
    * too.
    *
    * Crash-atomicity caveat: `INSERT OVERWRITE` on a parquet catalog
    * table is not transactional — a crash mid-overwrite can leave the
    * touched partitions partial. [[VersionedTable]] is the sink with the
    * atomic manifest-swap commit; this path trades that for catalog
    * integration (stock `spark.table` readers).
    */
  def mergeInto(spark: SparkSession, name: String, updates: DataFrame,
      businessKey: String, removeMovedKeys: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val partCols = spark.catalog.listColumns(name).collect()
      .filter(_.isPartition).map(_.name).toSeq
    val target = spark.table(name)
    val merged =
      if (partCols.isEmpty) MergeWriter.merge(target, updates, Seq(businessKey))
      else {
        val parts0 = updates.select(partCols.map(col): _*).distinct()
        val parts =
          if (!removeMovedKeys) parts0
          else parts0.unionByName(
            // partitions holding a stale row of an updated key that moved
            target.join(updates.select(businessKey).distinct(), Seq(businessKey), "left_semi")
              .select(partCols.map(col): _*).distinct()).distinct()
        val touched = target.join(broadcast(parts), partCols, "left_semi")
        MergeWriter.merge(touched, updates, Seq(businessKey))
      }
    // NOT dot-prefixed: Spark's file index silently ignores hidden paths,
    // so a ".staging" dir reads back as an empty relation
    val warehouse = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val staging = new org.apache.hadoop.fs.Path(
      warehouse, s"graft_merge_staging_${name}_${System.nanoTime()}")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    merged.write.mode("overwrite").parquet(staging.toString)
    val priorMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // BY NAME: positional insertInto resolves partitioned tables in a
    // different column order than the relation exposes
    val view = s"graft_staging_${name}_${System.nanoTime()}"
    spark.read.parquet(staging.toString).createOrReplaceTempView(view)
    try spark.sql(s"INSERT OVERWRITE TABLE $name BY NAME SELECT * FROM $view")
    finally {
      // restore: dynamic mode must not leak into unrelated writes that
      // expect static (full-truncate) overwrite semantics
      priorMode match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      spark.catalog.dropTempView(view)
      fs.delete(staging, true)
    }
  }

  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")
}
