package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    val bands = dedup.Dedup.minhashBands(docs)
    time("minhashBands.count")(bands.count())
    val x = bands.as("x"); val y = bands.as("y")
    val cand = x.join(y,
      col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    time("candidates.count")(println("cand=" + cand.count()))
    val index = dedup.Dedup.shingleIndex(docs)
    time("shingleIndex.count")(println("index=" + index.count()))
    time("full d03.count")(println("d03=" + dedup.Dedup.minhashLshPairs(docs).count()))
    spark.stop()
  }
}
