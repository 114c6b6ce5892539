package graft

import org.apache.spark.sql.functions._
import graft.sinks.{MergeWriter, TableManager}
import graft.ops.Ops

/** D4 delete, D6 table management, E3/E5/E6 ops utilities. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("deleteByKeys removes exactly the keyed rows (D4)") {
    val target = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val del = Seq(2, 9).toDF("k")
    val out = MergeWriter.deleteByKeys(target, del, Seq("k"))
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a", 3 -> "c"))
  }

  test("keyed table: create-if-absent, merge, reread (D6)") {
    val name = "graft_test_keyed"
    TableManager.drop(spark, name)
    // a previously-aborted run can leave the managed location behind
    val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), name)
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    val schema = Seq.empty[(String, String, Double)]
      .toDF("business_key", "store", "net_sales").schema
    TableManager.ensureKeyedTable(spark, name, schema, "business_key", buckets = 2)
    assert(spark.catalog.tableExists(name))
    TableManager.ensureKeyedTable(spark, name, schema, "business_key", buckets = 2) // idempotent
    TableManager.mergeInto(spark, name,
      Seq(("S1_20250101", "S1", 10.0)).toDF("business_key", "store", "net_sales"),
      "business_key")
    TableManager.mergeInto(spark, name,
      Seq(("S1_20250101", "S1", 99.0), ("S2_20250101", "S2", 5.0))
        .toDF("business_key", "store", "net_sales"),
      "business_key")
    val out = spark.table(name).select("business_key", "net_sales")
      .as[(String, Double)].collect().toMap
    assert(out == Map("S1_20250101" -> 99.0, "S2_20250101" -> 5.0))
    TableManager.drop(spark, name)
  }

  test("partitioned merge rewrites only the touched partitions (D6)") {
    val name = "graft_test_part_keyed"
    TableManager.drop(spark, name)
    val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), name)
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    val schema = Seq.empty[(String, Double, Int)]
      .toDF("business_key", "net_sales", "fy").schema
    TableManager.ensureKeyedTable(spark, name, schema, "business_key",
      buckets = 2, partitionCols = Seq("fy"))
    TableManager.mergeInto(spark, name,
      Seq(("S1_2024", 1.0, 2024), ("S1_2025", 2.0, 2025))
        .toDF("business_key", "net_sales", "fy"),
      "business_key")
    val files2024 = spark.table(name).filter(col("fy") === 2024)
      .select(input_file_name()).distinct().as[String].collect().toSet
    // second merge touches only fy=2025
    TableManager.mergeInto(spark, name,
      Seq(("S1_2025", 99.0, 2025), ("S2_2025", 5.0, 2025))
        .toDF("business_key", "net_sales", "fy"),
      "business_key")
    val files2024After = spark.table(name).filter(col("fy") === 2024)
      .select(input_file_name()).distinct().as[String].collect().toSet
    assert(files2024 == files2024After, "untouched partition was rewritten")
    val out = spark.table(name).select("business_key", "net_sales")
      .as[(String, Double)].collect().toMap
    assert(out == Map("S1_2024" -> 1.0, "S1_2025" -> 99.0, "S2_2025" -> 5.0))
    TableManager.drop(spark, name)
  }

  test("credential resolution: overrides beat env beat default (E3)") {
    assert(Ops.credential("X", Map("X" -> "o"), Some("d")) == "o")
    assert(Ops.credential("X", Map.empty, Some("d")) == "d")
    assert(Ops.credential("PATH").nonEmpty) // env fallback
    intercept[IllegalArgumentException](Ops.credential("NO_SUCH_CRED_EVER"))
  }

  test("config name selection with production fallback (E5)") {
    val avail = Set("config.production.json", "config.dev.json")
    assert(Ops.configName(Some("dev"), avail) == "config.dev.json")
    assert(Ops.configName(Some("staging"), avail) == "config.production.json")
    assert(Ops.configName(None, avail) == "config.production.json")
  }

  test("metrics listener observes query completion (E6)") {
    val events = new java.util.concurrent.ConcurrentLinkedQueue[Ops.RunEvent]()
    val l = Ops.registerMetrics(spark)(events.add(_))
    try {
      Seq(1, 2, 3).toDF("x").collect()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (events.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(!events.isEmpty)
      assert(events.peek().error.isEmpty)
    } finally spark.listenerManager.unregister(l)
  }
}
