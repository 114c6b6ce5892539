package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Keyed MERGE semantics — the engine's sink identity model.
  *
  * The reference's sink is an idempotent upsert into Dataverse keyed by a
  * composite business key (`/root/reference/modules/dataverse.py:40-220`:
  * PATCH-by-alternate-key = insert-or-update, last writer wins; the
  * fetch-then-branch variant at `load_store_hours.py:141-193` is the
  * join-shaped plan spelled out by hand). Here that becomes declarative
  * relational MERGE: dedupe updates by key, anti-join the target, union —
  * the same plan Delta's `MERGE INTO` generates. All joins shuffle on the
  * key only; at 100 TB bucketing both sides by the key makes the merge
  * co-located (no fact shuffle at all).
  */
object MergeWriter {

  /** Collapse duplicate keys inside one updates batch: last writer wins
    * under the caller's ordering (typically `ts.desc, id.desc` — make the
    * last column a unique tiebreak or the survivor is nondeterministic).
    * The reference achieves the same by issuing PATCHes sequentially per
    * batch — final state is the last applied.
    */
  def latestPerKey(updates: DataFrame, keys: Seq[String], orderBy: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MERGE: rows from `updates` replace same-key rows in `target`;
    * unmatched target rows pass through (WHEN MATCHED UPDATE ALL +
    * WHEN NOT MATCHED INSERT ALL). Schemas must be union-compatible.
    */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val untouched = target.join(updates.select(keys.map(col): _*), keys, "left_anti")
    untouched.unionByName(updates.select(target.columns.toIndexedSeq.map(col): _*))
  }

  /** D4 — bulk keyed delete: remove target rows whose key appears in
    * `deleteKeys` (the reference's threaded DELETE-changeset loop,
    * `full_refresh_fy2023_2025.py:59-167`, collapsed to one anti-join).
    */
  def deleteByKeys(target: DataFrame, deleteKeys: DataFrame, keys: Seq[String]): DataFrame =
    target.join(deleteKeys.select(keys.map(col): _*), keys, "left_anti")

  /** D5 — full-refresh as dynamic partition overwrite: replaces only the
    * partitions present in `df`, the Spark-native form of the reference's
    * delete-then-reload per fiscal year
    * (`full_refresh_fy2023_2025.py:201-419`).
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
