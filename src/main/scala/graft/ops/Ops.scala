package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Operational utilities (SURVEY.md §2.E): credential resolution with
  * environment fallback (E3, mirroring the reference's Key-Vault→env
  * chain `modules/utils/keyvault.py:110-125`), environment-keyed config
  * selection (E5, `modules/utils/config.py:4-18`), and run metrics via
  * a QueryExecutionListener (E4/E6 — the hook where the reference sends
  * notification mail and logs rows/sec).
  */
object Ops {

  /** E3 — resolve a secret: explicit overrides → environment variable →
    * default. A vault-backed resolver plugs in as the `overrides` map
    * provider; everything downstream only sees this function.
    */
  def credential(name: String, overrides: Map[String, String] = Map.empty,
      default: Option[String] = None): String =
    overrides.get(name)
      .orElse(sys.env.get(name))
      .orElse(default)
      .getOrElse(throw new IllegalArgumentException(s"unresolvable credential: $name"))

  /** E5 — environment-keyed config name with production fallback. */
  def configName(env: Option[String], available: Set[String]): String = {
    val want = env.map(e => s"config.$e.json").getOrElse("config.production.json")
    if (available.contains(want)) want else "config.production.json"
  }

  /** E4/E6 — register a listener recording per-query wall time and
    * outcome; `onEvent` is the notification hook (the reference emails
    * on success/failure, `modules/notifications.py:40-139`).
    */
  final case class RunEvent(name: String, durationNs: Long, error: Option[String])

  def registerMetrics(spark: SparkSession)(onEvent: RunEvent => Unit): QueryExecutionListener = {
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        onEvent(RunEvent(funcName, durationNs, None))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        onEvent(RunEvent(funcName, 0L, Some(exception.getMessage)))
    }
    spark.listenerManager.register(l)
    l
  }

  /** E6 depth — executed-plan SQLMetrics rolled up by metric name across
    * every physical node, including the adaptively re-planned subtree
    * (AQE) and cached-relation plans. This is the per-query answer to
    * "what did this sync actually DO": files/bytes scanned (did pruning
    * work?), shuffle records/bytes (did a plan change introduce a wider
    * shuffle?), spill (are partitions sized to memory?) — the numbers an
    * operator watches at 100 TB, where a silent 'scanned 100× more than
    * yesterday' is an incident, not a curiosity.
    */
  final case class QueryReport(name: String, durationNs: Long,
      metrics: Map[String, Long], error: Option[String]) {
    def apply(metric: String): Long = metrics.getOrElse(metric, 0L)
    def scanFiles: Long = apply("numFiles")
    def scanBytes: Long = apply("filesSize")
    def shuffleRecords: Long = apply("shuffleRecordsWritten")
    def shuffleBytes: Long = apply("shuffleBytesWritten")
    def spillBytes: Long = apply("spillSize")
  }

  private[graft] def planMetrics(qe: QueryExecution): Map[String, Long] = {
    import org.apache.spark.sql.execution.{CommandResultExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.metric.SQLMetric
    // several executed-plan nodes keep their real subtree as a FIELD, not
    // a child (AQE's plan + its materialized query stages, commands,
    // cached relations) — without these cases a write action reports an
    // empty metric map. Both plan nodes and metric objects are deduped by
    // reference identity: AQE stage reuse makes the same physical subtree
    // (and its SQLMetric instances) reachable through a reused wrapper AND
    // the original plan, which would double-count every reused exchange.
    val seenNodes = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Seq[SparkPlan] =
      if (!seenNodes.add(p)) Nil
      else p +: (p.children.flatMap(walk) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case i: InMemoryTableScanExec => walk(i.relation.cachedPlan)
        case c: CommandResultExec => walk(c.commandPhysicalPlan)
        case _ => Nil
      }))
    val seenMetrics = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SQLMetric, java.lang.Boolean]())
    walk(qe.executedPlan)
      .flatMap(_.metrics.toSeq.collect { case (k, m) if seenMetrics.add(m) => k -> m.value })
      .groupMapReduce(_._1)(_._2)(_ + _)
  }

  /** Run `body` with a metrics listener attached and return one
    * [[QueryReport]] per action it executed, in completion order.
    * Listener events are delivered asynchronously on the listener bus,
    * so this polls until `expect` reports arrive (or `timeoutMs`) —
    * callers state how many actions they ran.
    *
    * CONTRACT: `capture` assumes no concurrent actions run on the same
    * SparkSession while `body` executes — the listener is session-global,
    * so an unrelated concurrent action would be counted toward `expect`
    * and misattributed into the returned reports. Callers that share a
    * session across threads (Bench uses its own accumulating listener
    * for exactly this reason) must serialize around `capture`.
    */
  def capture[A](spark: SparkSession, expect: Int, timeoutMs: Long = 30000)
      (body: => A): (A, Seq[QueryReport]) = {
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[QueryReport]()
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        reports.add(QueryReport(funcName, durationNs, planMetrics(qe), None))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        reports.add(QueryReport(funcName, 0L, planMetrics(qe),
          Some(s"${exception.getClass.getSimpleName}: ${exception.getMessage}")))
    }
    spark.listenerManager.register(l)
    try {
      val a = body
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (reports.size < expect && System.nanoTime() < deadline) Thread.sleep(20)
      require(reports.size >= expect,
        s"metrics capture timed out: ${reports.size}/$expect reports after ${timeoutMs} ms")
      (a, reports.toArray(Array.empty[QueryReport]).toSeq)
    } finally spark.listenerManager.unregister(l)
  }
}
