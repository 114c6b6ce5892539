package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge — the history-preserving
  * upsert the reference's Dataverse "update in place" loses (it
  * overwrites attribute values; see `/root/reference/modules/
  * dataverse/client.py` update paths): instead of mutating a dimension
  * row, a change CLOSES the open row (`valid_to` = effective date) and
  * opens a new one, so every fact can still join to the attribute
  * values that were true at its own point in time.
  *
  * Semantics per update row, against the current OPEN row of its key:
  *   - tracked attributes unchanged → no-op (no spurious versions);
  *   - changed → close + open;
  *   - key absent → brand-new open row.
  * Closed history rows are never touched.
  *
  * Scale shape: one equi-join of updates against open rows on the key
  * (shuffle keyed the same as any keyed merge — broadcast when the
  * update batch is small), everything else is a narrow union. History
  * rows pass through untouched, so cost tracks |updates| + |open|, not
  * total history.
  */
object Scd2 {

  /** Merge `updates` (key + tracked columns) into the SCD2 `dim` table
    * (key + tracked + valid_from/valid_to/is_current), effective at
    * `asOf`. Returns the new full table.
    */
  def merge(dim: DataFrame, updates: DataFrame, key: String,
      tracked: Seq[String], asOf: Column): DataFrame = {
    val cols = Seq(key) ++ tracked ++ Seq("valid_from", "valid_to", "is_current")
    val closed = dim.filter(col("is_current") === 0)
    val open = dim.filter(col("is_current") === 1)
    // PRECONDITION: at most one update row per key. Duplicate keys would
    // fan out the full-outer join — duplicate closed copies of the open
    // row plus multiple identical new open versions. Enforced here with a
    // deterministic pick (max of the tracked-struct under Spark's struct
    // ordering) so a sloppy upstream batch degrades to a defined answer,
    // never a corrupted dimension; callers with a real recency column
    // should pre-select latest-per-key themselves.
    val u = updates.select(col(key).as("__k"),
        struct(tracked.map(col): _*).as("__new"))
      .groupBy("__k").agg(max(col("__new")).as("__new"))
    val j = open.join(u, col(key) === col("__k"), "full_outer")
    val changed = col("__k").isNotNull && col(key).isNotNull &&
      struct(tracked.map(col): _*) =!= col("__new")
    // open rows: untouched (no update or identical), or closed at asOf
    val kept = j.filter(col(key).isNotNull)
      .withColumn("valid_to", when(changed, asOf.cast("date")).otherwise(col("valid_to")))
      .withColumn("is_current", when(changed, lit(0)).otherwise(col("is_current")))
      .select(cols.map(col): _*)
    // new versions: changed keys + brand-new keys
    val opened = j.filter(changed || col(key).isNull)
      .select((Seq(col("__k").as(key)) ++
        tracked.map(t => col(s"__new.$t").as(t)) ++
        Seq(asOf.cast("date").as("valid_from"),
          lit(null).cast("date").as("valid_to"),
          lit(1).as("is_current"))): _*)
    closed.select(cols.map(col): _*)
      .unionByName(kept)
      .unionByName(opened)
  }
}
