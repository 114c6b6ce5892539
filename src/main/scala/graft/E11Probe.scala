package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{CommandResultExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Dev-only decision record for the e11 10× shuffle-record curve
  * (r17 verdict: SCALECHECK's e11 scaled run showed ×15.0 shuffle
  * records for ×10 data — superlinear-looking, measured under
  * load_seen 8.3, needing a numbers-backed attribution or a plan fix).
  *
  * `runMain graft.E11Probe <dir> [<dir> ...]` runs the sales_channel
  * aggregate + TY/LY self-join (e11's engine) once per dir with the
  * bench discipline and prints EVERY exchange and join in the EXECUTED
  * adaptive plan (captured from the write action's QueryExecution via a
  * listener — the DataFrame's own plan never executes) with its
  * records/bytes, so the per-exchange composition of the total — the
  * number the scale artifact can only report as one sum — is
  * attributable: which exchanges exist at each scale, and which appear
  * or disappear when AQE's join strategy flips.
  *
  * MEASURED ATTRIBUTION (r18, this probe at sf0.1 base / x10):
  *  - base 1.199M records = the countDistinct aggregate's two exchanges
  *    alone (599,464 on (dims) + 600,000 on (dims, l_orderkey) — the
  *    grain is near-unique at TPC-H keys, so map-side combine removes
  *    almost nothing); the TY/LY join is a BroadcastHashJoin (the
  *    595,867-row LY side broadcasts) — ZERO join shuffle;
  *  - x10 17.95M records = the same two exchanges grown exactly ×10
  *    (5,995,003 + 6,000,000) PLUS one new exchange: AQE flips the join
  *    to SortMergeJoin (a ~180 MiB side must not broadcast) and
  *    shuffles ONLY the LY side (5,958,670 records) — the TY side never
  *    moves because the cached aggregate's hash(5-dims) output
  *    partitioning already satisfies the join.
  * So ×15.0 = linear per-exchange growth + a one-time broadcast→SMJ
  * plan transition adding a third (linear) exchange — the plan a 100 TB
  * deployment WANTS, not a defect. Confirmed at a second point:
  * SCALECHECK_x30's e11 row lands 53.87M records = the predicted
  * 36M (two agg exchanges ×30) + 17.9M (LY side) — ×3.0 of the x10
  * records for ×3 the data, linear above the transition.
  */
object E11Probe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scale/x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the ScaleCheck harness's AQE byte-sizing — the probe must
      // execute the same plans the artifact measured
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val lastQe = new java.util.concurrent.atomic.AtomicReference[QueryExecution]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = lastQe.set(qe)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = lastQe.set(qe)
    })

    // the planMetrics recursion (ops.Ops): AQE plans, materialized query
    // stages, cached relations, and commands keep their real subtree as
    // a FIELD, not a child; identity-dedupe so stage reuse can't
    // double-print an exchange
    def walk(root: SparkPlan): Seq[SparkPlan] = {
      val seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
      def go(p: SparkPlan): Seq[SparkPlan] =
        if (!seen.add(p)) Nil
        else p +: (p.children.flatMap(go) ++ (p match {
          case a: AdaptiveSparkPlanExec => go(a.executedPlan)
          case q: QueryStageExec => go(q.plan)
          case i: InMemoryTableScanExec => go(i.relation.cachedPlan)
          case c: CommandResultExec => go(c.commandPhysicalPlan)
          case _ => Nil
        }))
      go(root)
    }

    dirs.foreach { dir =>
      // null-then-poll instead of a fixed sleep (ADVICE r18): the
      // listener bus delivers asynchronously, so a fixed 300 ms could
      // NPE on a slow bus or — worse — silently read the PREVIOUS
      // dir's executed plan, mis-attributing the exchange numbers this
      // probe exists to record
      lastQe.set(null)
      PipelineQueries.salesChannelAgg(spark, dir)
        .write.mode("overwrite").format("noop").save()
      // the query persists intermediates, so several actions deliver;
      // wait for non-null AND for the identity to settle (3 quiet
      // polls) so the plan read is the final noop save's
      var polls = 0
      var settle = 0
      var qe: QueryExecution = null
      while (settle < 3 && polls < 100) {
        Thread.sleep(100); polls += 1
        val cur = lastQe.get()
        if (cur != null && (cur eq qe)) settle += 1 else { qe = cur; settle = 0 }
      }
      require(qe != null, s"listener never delivered the executed plan for $dir")
      println(s"== $dir")
      walk(qe.executedPlan).foreach {
        case e: ShuffleExchangeLike =>
          def m(k: String): Long = e.metrics.get(k).map(_.value).getOrElse(-1L)
          println(f"  shuffle   records=${m("shuffleRecordsWritten")}%12d " +
            f"bytes=${m("shuffleBytesWritten") / 1048576}%6d MiB  on " +
            e.outputPartitioning.toString.replaceAll("#\\d+", "").take(110))
        case b: BroadcastExchangeLike =>
          println(f"  broadcast rows=${b.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)}%14d  " +
            b.nodeName)
        case j if j.nodeName.contains("Join") =>
          println(s"  join      ${j.nodeName}")
        case _ => ()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
