package graft.sinks

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Row

/** Bearer-token source for the uploader. `refresh()` is the 401/403
  * hook the reference invokes on auth expiry
  * (`/root/reference/full_refresh_fy2023_2025.py:85-88,140-144`);
  * implementations re-acquire and return the new token.
  */
trait TokenProvider extends Serializable {
  def token(): String
  def refresh(): String
}

object TokenProvider {
  /** Fixed token (tests / pre-acquired credentials). */
  def static(value: String): TokenProvider = new TokenProvider {
    def token(): String = value
    def refresh(): String = value
  }
}

/** D1/D2 — the Dataverse-style `$batch` wire transport behind
  * `BatchSink`: one multipart batch per call containing one changeset of
  * PATCH-by-alternate-key operations (insert-or-update), per-subresponse
  * status accounting, `odata.continue-on-error`, Retry-After on 429, and
  * token refresh on 401/403 — the protocol of
  * `/root/reference/modules/dataverse.py:69-195`.
  *
  * Plugs into `BatchSink.write` as the `Uploader`: each Spark task
  * drains its partition in 400-row batches, transient failures raise
  * `RetryableFailure` so BatchSink's bounded backoff retries them, and
  * the deterministic business key keeps redelivery idempotent.
  */
final class DataverseBatchUploader(
    apiUrl: String, // e.g. https://org.crm.dynamics.com/api/data/v9.2
    table: String,
    alternateKey: String,
    tokens: TokenProvider,
    timeoutMs: Int = 600000) extends BatchSink.Uploader {

  import BatchSink._

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Null fields are OMITTED (B12 — a PATCH with an explicit null would
    * clear the column; the reference strips them, `dataverse.py:76`).
    */
  private[sinks] def jsonOf(row: Row): String =
    row.schema.fields.indices.flatMap { i =>
      if (row.isNullAt(i)) None
      else {
        val v: Option[String] = row.get(i) match {
          // non-finite doubles have no JSON representation — a bare NaN/
          // Infinity token would corrupt the wire body; treat them like
          // nulls (omitted), matching the null-stripping rule
          case d: java.lang.Double if d.isNaN || d.isInfinite => None
          case f: java.lang.Float if f.isNaN || f.isInfinite => None
          // BigDecimal.toString may render scientific notation ('1E+2');
          // the reference's json.dumps always writes plain decimals
          case d: java.math.BigDecimal => Some(d.toPlainString)
          case d: scala.math.BigDecimal => Some(d.bigDecimal.toPlainString)
          case n: java.lang.Number => Some(n.toString)
          case b: java.lang.Boolean => Some(b.toString)
          case other => Some("\"" + jsonEscape(other.toString) + "\"")
        }
        v.map(s => "\"" + jsonEscape(row.schema.fields(i).name) + "\":" + s)
      }
    }.mkString("{", ",", "}")

  /** Multipart batch body (`dataverse.py:69-108`): batch boundary wraps
    * one changeset; each record is an application/http PATCH addressed
    * by the alternate key (single quotes doubled), Content-ID = 1-based
    * index.
    */
  private[sinks] def buildBatch(batch: Seq[Row], batchId: String, changesetId: String): String = {
    val sb = new StringBuilder
    sb.append(s"--$batchId\r\nContent-Type: multipart/mixed;boundary=$changesetId\r\n\r\n")
    batch.zipWithIndex.foreach { case (row, i) =>
      val keyIdx = row.schema.fieldIndex(alternateKey)
      val keyValue = String.valueOf(row.get(keyIdx)).replace("'", "''")
      sb.append(s"--$changesetId\r\n")
        .append("Content-Type: application/http\r\n")
        .append("Content-Transfer-Encoding: binary\r\n")
        .append(s"Content-ID: ${i + 1}\r\n\r\n")
        .append(s"PATCH $table($alternateKey='$keyValue') HTTP/1.1\r\n")
        .append("Content-Type: application/json\r\n")
        .append("Prefer: return=representation,odata.include-annotations=*\r\n\r\n")
        .append(jsonOf(row)).append("\r\n")
    }
    sb.append(s"--$changesetId--\r\n--$batchId--\r\n")
    sb.toString
  }

  private val SubStatus = raw"Content-ID:\s*(\d+)[\s\S]*?HTTP/1\.1 (\d{3})".r

  /** Per-subresponse outcomes aligned by Content-ID
    * (`dataverse.py:110-146`): 201 created, 200/204 updated, 4xx/5xx
    * failed; rows with no subresponse at all count failed
    * (conservative, like the reference's fallback).
    */
  private[sinks] def parseOutcomes(batchText: String, expected: Int): Seq[RowOutcome] = {
    val byId = SubStatus.findAllMatchIn(batchText)
      .map(m => m.group(1).toInt -> m.group(2).toInt).toMap
    (1 to expected).map { id =>
      byId.get(id) match {
        case Some(201) => Created
        case Some(s) if s == 200 || s == 204 => Updated
        case Some(s) => Failed(s"HTTP $s")
        case None => Failed("no subresponse")
      }
    }
  }

  override def upload(batch: Seq[Row]): Seq[RowOutcome] = {
    val batchId = "batch_" + java.util.UUID.randomUUID().toString
    val changesetId = "changeset_" + java.util.UUID.randomUUID().toString
    val body = buildBatch(batch, batchId, changesetId).getBytes(StandardCharsets.UTF_8)
    val conn = new URI(s"$apiUrl/$$batch").toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestProperty("Content-Type", s"multipart/mixed; boundary=$batchId")
      conn.setRequestProperty("Prefer", "odata.continue-on-error")
      conn.setRequestProperty("Authorization", s"Bearer ${tokens.token()}")
      val out = conn.getOutputStream
      try out.write(body) finally out.close()
      val status = conn.getResponseCode
      val in = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val text =
        if (in == null) ""
        else try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      status match {
        case 200 | 204 =>
          parseOutcomes(text, batch.size)
        case 429 =>
          val retryAfter = Option(conn.getHeaderField("Retry-After"))
            .flatMap(v => scala.util.Try(v.trim.toLong * 1000L).toOption)
          throw RetryableFailure(s"throttled: HTTP 429", retryAfter)
        case 401 | 403 =>
          // token expired mid-run: refresh, then let BatchSink retry the
          // whole batch with the new bearer (idempotent by business key)
          tokens.refresh()
          throw RetryableFailure(s"auth expired: HTTP $status", Some(0L))
        case s if s >= 500 =>
          throw RetryableFailure(s"server error: HTTP $s")
        case s =>
          batch.map(_ => Failed(s"HTTP $s: ${text.take(200)}"))
      }
    } finally conn.disconnect()
  }
}
