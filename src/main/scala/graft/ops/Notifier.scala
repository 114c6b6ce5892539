package graft.ops

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** E4 — the notification sink behind the Ops.registerMetrics hook: the
  * engine's form of the reference's Graph sendMail notifier
  * (`/root/reference/modules/notifications.py:36-139`): a sendMail-shaped
  * JSON POST (subject + Text/HTML body + toRecipients, bearer auth,
  * 202 = accepted) plus the success/failure run-summary formatting the
  * reference assembles at `modules/olap_sync.py:401-437`.
  *
  * Driver-side control-plane I/O — one POST per pipeline run, never on
  * an executor path. Disabled (no-op) when `enabled=false` or no
  * recipients, exactly like the reference's config gate.
  */
object Notifier {

  final case class Config(
      enabled: Boolean,
      endpoint: String, // e.g. https://graph.microsoft.com/v1.0/users/<sender>/sendMail
      recipients: Seq[String],
      tokens: graft.sinks.TokenProvider,
      timeoutMs: Int = 60000)

  /** One pipeline run's outcome, for the summary body. */
  final case class RunSummary(
      pipeline: String,
      created: Long,
      updated: Long,
      failed: Long,
      elapsedSec: Double,
      error: Option[String])

  /** The reference's success/failure mail shape: subject carries the
    * pipeline + outcome, body the per-counter breakdown and rows/sec.
    */
  def format(run: RunSummary): (String, String) = {
    val ok = run.error.isEmpty && run.failed == 0
    val subject =
      if (ok) s"[OK] ${run.pipeline} sync complete"
      else s"[FAILED] ${run.pipeline} sync"
    val rate =
      if (run.elapsedSec > 0) (run.created + run.updated) / run.elapsedSec else 0.0
    val body = Seq(
      s"Pipeline: ${run.pipeline}",
      s"Created: ${run.created}",
      s"Updated: ${run.updated}",
      s"Errors: ${run.failed}",
      f"Elapsed: ${run.elapsedSec}%.1f s (${rate}%.0f rows/sec)") ++
      run.error.map(e => s"Failure: $e")
    (subject, body.mkString("\n"))
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** sendMail-shaped message JSON (`notifications.py:96-107`). */
  def messageJson(subject: String, body: String, recipients: Seq[String],
      isHtml: Boolean = false): String = {
    val to = recipients
      .map(r => s"""{"emailAddress":{"address":"${jsonEscape(r)}"}}""")
      .mkString("[", ",", "]")
    val contentType = if (isHtml) "HTML" else "Text"
    s"""{"message":{"subject":"${jsonEscape(subject)}","body":{"contentType":"$contentType","content":"${jsonEscape(body)}"},"toRecipients":$to},"saveToSentItems":"true"}"""
  }

  /** POST the notification; returns true on 202 (accepted), false on
    * any failure — notification must never fail the pipeline
    * (`notifications.py:127-139` logs and returns False).
    */
  def send(cfg: Config, subject: String, body: String, isHtml: Boolean = false): Boolean = {
    if (!cfg.enabled || cfg.recipients.isEmpty) return false
    try {
      val conn = new URI(cfg.endpoint).toURL.openConnection().asInstanceOf[HttpURLConnection]
      try {
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setConnectTimeout(cfg.timeoutMs)
        conn.setReadTimeout(cfg.timeoutMs)
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setRequestProperty("Authorization", s"Bearer ${cfg.tokens.token()}")
        val payload = messageJson(subject, body, cfg.recipients, isHtml)
          .getBytes(StandardCharsets.UTF_8)
        val out = conn.getOutputStream
        try out.write(payload) finally out.close()
        conn.getResponseCode == 202
      } finally conn.disconnect()
    } catch {
      case scala.util.control.NonFatal(_) => false
    }
  }

  /** Convenience: format + send one run summary. */
  def notifyRun(cfg: Config, run: RunSummary): Boolean = {
    val (subject, body) = format(run)
    send(cfg, subject, body)
  }
}
