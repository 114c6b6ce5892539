package graft

import org.apache.spark.sql.SparkSession

/** CLI entry point (SURVEY.md §2.E1 — the engine's `olap_sync.main`):
  * run one named query or all of them against a scale-factor directory,
  * optionally writing results as parquet.
  *
  *   runMain graft.Runner --query q01_pricing_summary --sf /root/testdata/sf0.01
  *   runMain graft.Runner --query all --sf ... --out /tmp/results
  */
object Runner {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val sfDir = opts.getOrElse("sf", "/root/testdata/sf0.001")
    val which = opts.getOrElse("query", "all")
    val out = opts.get("out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName(s"graft-$which")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val targets =
      if (which == "all") Queries.all
      else Seq(Queries.byName.getOrElse(which,
        sys.error(s"unknown query: $which — known: ${Queries.all.map(_.name).mkString(", ")}")))

    targets.foreach { q =>
      val t0 = System.nanoTime()
      val df = q.query(spark, sfDir)
      val n = out match {
        case Some(o) =>
          df.write.mode("overwrite").parquet(s"$o/${q.name}")
          spark.read.parquet(s"$o/${q.name}").count()
        case None => df.count()
      }
      println(f"[runner] ${q.name}%-28s $n%9d rows  ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
