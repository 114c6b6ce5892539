package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.SignatureStore

/** Dev-only stage profiler for the d08 ingest cycle (not part of the
  * driver contract): `runMain graft.IngestProbe [sfDir]` builds a
  * scratch store, then drives the REAL [[graft.dedup.SignatureStore
  * .ingest]] through its `onStage` timing hook — the numbers are the
  * production code path's own materialization points, so bench-weight
  * work on d08 targets the stage that actually costs and cannot drift
  * from a probe-local reimplementation.
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
    val snap = t("snapshot")(SignatureStore.snapshot(spark, name))
    (1 to 2).foreach { round =>
      println(s"--- cycle $round")
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val flags = SignatureStore.ingest(spark, batch, name,
        onStage = (label, sec) => println(f"[stage] $label%-26s $sec%6.2f s"))
      t("noop(flags)")(flags.write.mode("overwrite").format("noop").save())
      t("rollback")(SignatureStore.rollback(spark, name, snap))
    }
    SignatureStore.drop(spark, name)
    spark.stop()
  }
}
