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
    // candidate-generation variants for d03
    val bands2 = dedup.Dedup.minhashBands(docs)
    time("cand via self-join") {
      val x2 = bands2.as("x"); val y2 = bands2.as("y")
      println("cand=" + x2.join(y2,
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct().count())
    }
    time("cand via collect+expand") {
      val grouped = bands2.groupBy("band", "band_hash")
        .agg(sort_array(collect_set(col("doc_id"))).as("l"))
        .filter(size(col("l")) > 1)
      val pairs = grouped.select(explode(flatten(transform(col("l"),
        (x, i) => transform(slice(col("l"), i + 2, size(col("l"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b")).distinct()
      println("cand2=" + pairs.count())
    }
    // d05 variants
    val emb = Tables.embeddings(spark, dir)
    time("d05 HOF prefilter")(println("d05=" +
      similarity.Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4).count()))
    time("d05 explode-join") {
      val ex = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v0")))
        .withColumn("v", col("v0").cast("double")).drop("v0")
      val vn = ex.groupBy("vec_id").agg(sum(col("v") * col("v")).as("ns"))
      val a = ex.select(col("vec_id").as("va"), col("pos"), col("v").as("x"))
      val b = ex.select(col("vec_id").as("vb"), col("pos"), col("v").as("y"))
      val dots = a.join(b, Seq("pos")).filter(col("va") < col("vb"))
        .groupBy("va", "vb").agg(sum(col("x") * col("y")).as("dot"))
      val out = dots
        .join(vn.select(col("vec_id").as("va"), col("ns").as("na")), "va")
        .join(vn.select(col("vec_id").as("vb"), col("ns").as("nb")), "vb")
        .filter(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))) >= 0.4 - 1e-6)
      println("d05b=" + out.count())
    }
    spark.stop()
  }
}
