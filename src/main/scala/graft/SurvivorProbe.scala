package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SignatureStore}

/** Dev-only decomposition probe for d08's dominant stage (not part of
  * the driver contract): splits "survivor LSH + components" into the
  * pair-verify materialization and the label-propagation machinery so
  * optimization work targets whichever actually costs.
  */
object SurvivorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    val name = "graft_survprobe_sigstore"
    t("build (untimed)")(SignatureStore.build(
      spark, docs.filter(col("doc_id") % 10 =!= 0), name))
    val meta = spark.table(SignatureStore.metaTable(name)).head()
    val k = meta.getAs[Int]("k")
    val bands = meta.getAs[Int]("bands")
    val rows = if (meta.schema.fieldNames.contains("rows")) meta.getAs[Int]("rows") else 2
    val maxDf = meta.getAs[Int]("max_df")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    (1 to 3).foreach { i =>
      println(s"--- iter $i")
      val bsh = t("shingles ckpt")(Dedup.shingles(batch, k).localCheckpoint(true))
      val bIdx = t("idx ckpt")(Dedup.indexFromShingles(bsh, maxDf).localCheckpoint(true))
      val bBands = t("bands ckpt")(Dedup.bandsFromShingles(bsh, bands, rows).localCheckpoint(true))
      val ids = batch.select(col("doc_id").cast("long").as("doc_id"))
      val pairs = Dedup.lshPairsFrom(bBands, bIdx, 0.5)
      val pairsCk = t("pairs MATERIALIZE")(pairs.localCheckpoint(true))
      println("[t] n_pairs=" + pairsCk.count())
      val comp = t("clusters labels (ckpt pairs)")(
        Dedup.clusters(pairsCk, ids, onRounds = r => println(s"[t] rounds=$r")))
      t("comp noop")(comp.write.mode("overwrite").format("noop").save())
      val comp2 = t("clusters labels (lazy pairs)")(
        Dedup.clusters(pairs, ids, onRounds = r => println(s"[t] rounds=$r")))
      t("comp2 noop")(comp2.write.mode("overwrite").format("noop").save())
    }
    SignatureStore.drop(spark, name)
    spark.stop()
  }
}
