package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SignatureStore}

/** Dev-only stage profiler for the d08 ingest cycle (not part of the
  * driver contract): `runMain graft.IngestProbe [sfDir]` builds a
  * scratch store, then times each stage of one
  * [[graft.dedup.SignatureStore.ingest]]-equivalent cycle separately —
  * store-join, survivor LSH, components, appends — so bench-weight work
  * on d08 targets the stage that actually costs, not a guess.
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    val name = "graft_ingestprobe_sigstore"
    t("build (untimed in bench)") {
      SignatureStore.build(spark, docs.filter(col("doc_id") % 10 =!= 0), name)
    }
    (1 to 2).foreach { round =>
      println(s"--- cycle $round")
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val snap = t("snapshot")(SignatureStore.snapshot(spark, name))
      val meta = spark.table(SignatureStore.metaTable(name)).head()
      val spec = SignatureStore.Spec(meta.getAs[Int]("k"),
        meta.getAs[Int]("bands"), meta.getAs[Int]("max_df"))
      val buckets = meta.getAs[Int]("buckets")
      val ids = batch.select(col("doc_id").cast("long").as("doc_id"))
      val bsh = t("shingle pass + ckpt")(Dedup.shingles(batch, spec.k).localCheckpoint(true))
      val bIdx = t("batch index + ckpt")(Dedup.indexFromShingles(bsh, spec.maxDf).localCheckpoint(true))
      val bBands = t("batch bands + ckpt")(Dedup.bandsFromShingles(bsh, spec.bands).localCheckpoint(true))
      val histDup = t("store join (histDup)") {
        SignatureStore.incrementalPairs(spark, batch, name)
          .groupBy(col("new_id").as("doc_id"))
          .agg(min(col("hist_id")).as("hist_dup_of"))
          .localCheckpoint(true)
      }
      val survIds = ids.join(histDup, Seq("doc_id"), "left_anti")
      val ssh = bsh.join(survIds, "doc_id")
      val pairs = t("survivor LSH pairs") {
        Dedup.lshPairsFrom(bBands.join(survIds, "doc_id"),
          Dedup.indexFromShingles(ssh, spec.maxDf), 0.5).localCheckpoint(true)
      }
      val comp = t("components")(Dedup.clusters(pairs, survIds))
      val flags = t("flags + ckpt") {
        ids.join(histDup, Seq("doc_id"), "left")
          .join(comp.select(col("doc_id"), col("cluster"), col("is_rep")), Seq("doc_id"), "left")
          .select(col("doc_id"),
            (col("hist_dup_of").isNotNull || col("is_rep") === false).as("is_dup"),
            coalesce(col("hist_dup_of"),
              when(col("is_rep") === false, col("cluster"))).as("dup_of"))
          .localCheckpoint(true)
      }
      val keepIds = flags.filter(!col("is_dup")).select("doc_id")
      val ksh = bsh.join(keepIds, "doc_id")
      val kIdx = t("keep index + ckpt")(Dedup.indexFromShingles(ksh, spec.maxDf).localCheckpoint(true))
      t("append bands") {
        bBands.join(keepIds, "doc_id")
          .withColumn("band_key", concat_ws(":", col("band"), col("band_hash")))
          .repartition(buckets, col("band_key"))
          .write.mode("append").format("parquet")
          .bucketBy(buckets, "band_key").sortBy("band_key")
          .saveAsTable(SignatureStore.bandsTable(name))
      }
      t("append shingles") {
        kIdx.repartition(buckets, col("doc_id"))
          .write.mode("append").format("parquet")
          .bucketBy(buckets, "doc_id").sortBy("doc_id")
          .saveAsTable(SignatureStore.shinglesTable(name))
      }
      t("append sizes") {
        kIdx.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
          .repartition(buckets, col("doc_id"))
          .write.mode("append").format("parquet")
          .bucketBy(buckets, "doc_id").sortBy("doc_id")
          .saveAsTable(SignatureStore.sizesTable(name))
      }
      t("noop(flags)")(flags.write.mode("overwrite").format("noop").save())
      t("rollback")(SignatureStore.rollback(spark, name, snap))
    }
    SignatureStore.drop(spark, name)
    spark.stop()
  }
}
