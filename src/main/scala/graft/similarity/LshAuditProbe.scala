package graft.similarity

import org.apache.spark.sql.functions._

/** Decision-record probe (the `ShingleProbe` pattern): the LSH bucket
  * histogram of the d05 corpus at a scale factor — run against a
  * ScaleCheck scratch dir to record whether the adaptive geometry's
  * buckets stay cap-free as the corpus grows.
  *
  * {{{ runMain graft.similarity.LshAuditProbe /tmp/graft_scale/x30 }}}
  */
object LshAuditProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val copies = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") *
            (lit(1.0) +
              ((i.cast("long") * 7919L + col("vec_id") * 104729L) % 11L - 5L)
                .cast("double") / lit(128.0)))
            .cast("float").cast("double")).as("embedding"))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(copies)
    val audit = Similarity.lshBucketAudit(corpus, "vec_id", "embedding").head()
    System.err.println(s"[lsh-audit] $dir -> $audit")
    spark.stop()
  }
}
