package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate the tokenize+shingle explode cost (the scan-side
  * step every dedup operator shares) from the operators built on it.
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[sprobe] $label%-28s ${ts.map(t => f"$t%5.2f").mkString("  ")} s")
    }
    val docs = Tables.documents(spark, sfDir)
    time("tokens only") {
      docs.select(graft.text.TextFunctions.tokens(col("text")).as("t"))
        .selectExpr("sum(size(t))").collect()
    }
    time("shingles k=3 (HOF)") {
      graft.dedup.Dedup.shingles(docs, 3).selectExpr("count(shingle)").collect()
    }
    time("shingles k=5 (HOF)") {
      graft.dedup.Dedup.shingles(docs, 5).selectExpr("count(shingle)").collect()
    }
    time("gram hash60 k=5 (HOF+md5)") {
      graft.dedup.Dedup.shingles(docs, 5)
        .select(conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h"))
        // xor-fold, not sum: summing millions of ~2^60 hashes overflows
        // long under ANSI mode
        .selectExpr("bit_xor(h)").collect()
    }
    spark.stop()
  }
}
