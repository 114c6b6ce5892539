package graft.sources

import scala.xml.{Elem, XML}

/** Hardened scala-xml loader for the two hostile-input surfaces (a
  * remote XMLA server's response, a user-supplied xlsx's zip parts).
  * scala-xml's default loader accepts DOCTYPE declarations, which opens
  * entity-expansion bombs ("billion laughs") and external-entity
  * resolution (XXE: local-file read / SSRF via the entity URL). Neither
  * surface has any legitimate use for a DTD — mddataset responses and
  * OOXML parts are plain namespaced XML — so the parser rejects any
  * DOCTYPE outright (the OWASP XXE-prevention posture), with the
  * entity/external-DTD features additionally pinned off as defense in
  * depth for JAXP implementations where the disallow feature behaves
  * differently.
  *
  * A fresh SAXParser per call: parsers are not thread-safe, and each
  * source parses one bounded document per call (driver-side, or one per
  * task in the DSv2 chunk path) — construction cost is noise next to
  * the parse itself.
  */
object SecureXml {

  private def secureParser(): javax.xml.parsers.SAXParser = {
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    // scala-xml's FactoryAdapter tracks prefixes/scopes itself — this
    // matches XML.load's default factory so documents parse identically
    f.setNamespaceAware(false)
    f.setXIncludeAware(false)
    // the load-bearing gate — if the JAXP impl can't disallow DOCTYPE,
    // fail construction loudly rather than parse unprotected
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    def bestEffort(name: String, v: Boolean): Unit =
      try f.setFeature(name, v) catch { case _: Exception => () }
    bestEffort("http://xml.org/sax/features/external-general-entities", false)
    bestEffort("http://xml.org/sax/features/external-parameter-entities", false)
    bestEffort("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    f.newSAXParser()
  }

  private def reject(context: String, e: org.xml.sax.SAXParseException): Nothing =
    throw new IllegalArgumentException(
      s"$context: rejected hostile or malformed XML " +
        s"(line ${e.getLineNumber}): ${e.getMessage}", e)

  /** Parse an in-memory XML string (XMLA responses). DOCTYPE-bearing or
    * malformed input throws IllegalArgumentException, never resolves.
    */
  def loadString(xml: String, context: String = "xml"): Elem =
    try XML.withSAXParser(secureParser()).loadString(xml)
    catch { case e: org.xml.sax.SAXParseException => reject(context, e) }

  /** Parse a stream (xlsx zip parts). Caller owns closing `in`. */
  def load(in: java.io.InputStream, context: String = "xml"): Elem =
    try XML.withSAXParser(secureParser()).load(in)
    catch { case e: org.xml.sax.SAXParseException => reject(context, e) }

  /** Decompression-bomb guard for zip parts: counts bytes actually read
    * and refuses past `cap` — the zip header's advertised size is
    * attacker-controlled and cannot be trusted.
    */
  final class BoundedInputStream(in: java.io.InputStream, cap: Long, name: String)
      extends java.io.InputStream {
    private var seen = 0L
    private def bump(k: Int): Unit = if (k > 0) {
      seen += k
      if (seen > cap) throw new IllegalArgumentException(
        s"$name: decompressed part exceeds $cap bytes — refusing (zip-bomb guard)")
    }
    override def read(): Int = { val b = in.read(); bump(if (b >= 0) 1 else 0); b }
    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      val k = in.read(buf, off, len); bump(math.max(k, 0)); k
    }
    override def close(): Unit = in.close()
  }
}
