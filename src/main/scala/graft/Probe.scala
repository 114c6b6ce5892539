package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler / scratch debugger (not part of the driver
  * contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val name = "graft_probe_part"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), name)
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    val schema = Seq.empty[(String, Double, Int)]
      .toDF("business_key", "net_sales", "fy").schema
    graft.sinks.TableManager.ensureKeyedTable(spark, name, schema, "business_key",
      buckets = 2, partitionCols = Seq("fy"))
    println("[probe] table cols: " + spark.table(name).columns.mkString(","))
    println("[probe] catalog cols: " + spark.catalog.listColumns(name).collect()
      .map(c => s"${c.name}(part=${c.isPartition})").mkString(","))
    val updates = Seq(("S1_2024", 1.0, 2024)).toDF("business_key", "net_sales", "fy")
    val target = spark.table(name)
    val merged = graft.sinks.MergeWriter.merge(target, updates, Seq("business_key"))
    println("[probe] merged cols: " + merged.columns.mkString(","))
    val staging = "/tmp/probe_staging"
    merged.write.mode("overwrite").parquet(staging)
    println("[probe] staging cols: " + spark.read.parquet(staging).columns.mkString(","))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.stop()
  }
}
