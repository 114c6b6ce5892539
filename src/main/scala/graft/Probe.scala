package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query profiler (not part of the driver contract):
  * `runMain graft.Probe <sfDir> <query> [query ...]` — times each named
  * query twice with the Bench's noop-sink + cold-cache discipline and
  * prints per-run seconds, so one slow query can be iterated without a
  * full Bench pass.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val q = Queries.byName.getOrElse(n, sys.error(s"unknown query $n"))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q.query(spark, sfDir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n%-28s ${times.map(t => f"$t%6.2f").mkString("  ")} s")
    }
    spark.stop()
  }
}
