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
}
