package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for named queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_pricing_summary")
    names.foreach { n =>
      println(s"========== $n ==========")
      Queries.byName(n).query(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
