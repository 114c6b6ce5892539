package graft.sources

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** A1 — the XMLA HTTP transport behind the mddataset decode: SOAP
  * `Execute` POST with the MDX CDATA-wrapped (MDX is full of `&` member
  * syntax that must not be XML-escaped), basic auth, `Catalog` +
  * `Format=Multidimensional` properties, 300 s default timeout — the
  * wire protocol of `/root/reference/modules/olap.py:7-46`.
  *
  * Driver-side control-plane I/O: one call fetches one slicer chunk's
  * response, which `XmlaSource.read` decodes; chunks parallelize as
  * connector input partitions (SURVEY.md §2.C2), so the transport never
  * sits on a fact-scale path.
  */
object XmlaHttpClient {

  /** Non-200 Execute response, with the throttling metadata a retrying
    * caller needs (`Retry-After` in seconds, as Dataverse/SSAS send it).
    */
  final case class HttpError(status: Int, retryAfterMs: Option[Long], body: String)
      extends RuntimeException(
        s"XMLA query failed with HTTP $status: ${body.take(500)}")

  /** An MDX statement containing the literal `]]>` would terminate the
    * CDATA section early and corrupt the envelope (statement injection);
    * the standard fix is to split it across two CDATA sections.
    */
  private[sources] def cdataSafe(s: String): String =
    s.replace("]]>", "]]]]><![CDATA[>")

  /** Catalog is a plain XML text node (NOT CDATA-wrapped) — escape it. */
  private[sources] def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }

  /** The reference's Execute envelope, byte-for-byte semantics
    * (`olap.py:12-27`): CDATA-wrapped statement, catalog + format
    * properties.
    */
  def soapEnvelope(catalog: String, mdx: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<soap:Envelope xmlns:soap="http://schemas.xmlsoap.org/soap/envelope/">
       |  <soap:Body>
       |    <Execute xmlns="urn:schemas-microsoft-com:xml-analysis">
       |      <Command>
       |        <Statement><![CDATA[${cdataSafe(mdx)}]]></Statement>
       |      </Command>
       |      <Properties>
       |        <PropertyList>
       |          <Catalog>${xmlEscape(catalog)}</Catalog>
       |          <Format>Multidimensional</Format>
       |        </PropertyList>
       |      </Properties>
       |    </Execute>
       |  </soap:Body>
       |</soap:Envelope>""".stripMargin

  /** POST the Execute call; returns the raw mddataset XML, throws with a
    * body preview on any non-200 (`olap.py:44-46`).
    */
  def execute(server: String, catalog: String, username: String, password: String,
      mdx: String, timeoutMs: Int = 300000): String = {
    val url =
      if (server.endsWith("/xmla/default")) server
      else s"${server.stripSuffix("/")}/xmla/default"
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestProperty("Content-Type", "text/xml; charset=utf-8")
      conn.setRequestProperty("SOAPAction", "urn:schemas-microsoft-com:xml-analysis:Execute")
      val cred = java.util.Base64.getEncoder.encodeToString(
        s"$username:$password".getBytes(StandardCharsets.UTF_8))
      conn.setRequestProperty("Authorization", s"Basic $cred")
      val body = soapEnvelope(catalog, mdx).getBytes(StandardCharsets.UTF_8)
      val out = conn.getOutputStream
      try out.write(body) finally out.close()
      val status = conn.getResponseCode
      val in = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val text =
        if (in == null) ""
        else try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      if (status != 200) {
        val retryAfterMs = Option(conn.getHeaderField("Retry-After"))
          .flatMap(v => scala.util.Try(v.trim.toLong * 1000L).toOption)
        throw HttpError(status, retryAfterMs, text)
      }
      text
    } finally conn.disconnect()
  }
}
