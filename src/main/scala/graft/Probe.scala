package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler / scratch debugger (not part of the driver
  * contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val copies = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") *
            (lit(1.0) +
              ((i.cast("long") * 7919L + col("vec_id") * 104729L) % 11L - 5L)
                .cast("double") / lit(128.0)))
            .cast("float").cast("double")).as("embedding"))
    copies.filter(col("vec_id") === 1000000L)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .orderBy("pos").limit(8)
      .collect().foreach(r => println(s"[probe] pos=${r.getInt(0)} v=${r.getDouble(1)}"))
    spark.stop()
  }
}
