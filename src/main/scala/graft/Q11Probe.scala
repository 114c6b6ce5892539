package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cube.FiscalCalendar

/** Dev-only decomposition probe for the q11 wide aggregate (judge item:
  * is the 47-partial agg spilling at 32 partitions, and would a
  * two-level shape help?). Times each component with the Bench noop
  * discipline and prints executed-plan spill/shuffle rollups.
  */
object Q11Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val all = CubeQueries.dailySalesMeasures
    def li = Tables.lineitem(spark, sfDir)
    def grouped(df: DataFrame) = df.groupBy(
      col("l_suppkey"),
      FiscalCalendar.fiscalYear(col("l_shipdate")).as("fiscal_year"),
      FiscalCalendar.fiscalPeriod(col("l_shipdate")).as("fiscal_period"))
    val additive = all.filter(_._1 != "n_orders")

    def wide = grouped(li)
      .agg(additive.head._2.as(additive.head._1),
        additive.tail.map(m => m._2.as(m._1)): _*)
    def distincts = grouped(li.select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey")))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))

    def time(name: String, df: => DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val (_, reports) = graft.ops.Ops.capture(spark, 1, 300000) {
          val t0 = System.nanoTime()
          df.write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          print(f"[q11probe] $name%-22s run$i ${dt}%6.2f s")
        }
        val r = reports.head
        println(f"  spill=${r.spillBytes / 1048576}%4d MiB shuffleB=${r.shuffleBytes / 1048576}%4d MiB " +
          f"shuffleRec=${r.shuffleRecords}%9d scanB=${r.scanBytes / 1048576}%4d MiB")
      }
    }

    time("wide-only", wide)
    time("distinct-only", distincts)
    time("full-q11", Queries.byName("q11_daily_sales_wide").query(spark, sfDir))
    spark.stop()
  }
}
