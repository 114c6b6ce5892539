package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process XMLA endpoint for the correctness gate (e23): lets the
  * Verify/Bench runs drive the REAL `spark.read.format("xmla")` path —
  * SOAP POST per input partition, executor-side decode, slicer-filter
  * chunk pruning — against deterministic responses derived from the
  * driver tables, so DuckDB can replay the decoded rows.
  *
  * One lazy JVM-wide server (the DataFrame a query returns is evaluated
  * after the query function has returned — the endpoint must outlive the
  * call); `serve` swaps the response map per invocation, which is safe
  * because the harness runs queries sequentially. The response is chosen
  * by which slicer key appears in the POSTed MDX statement, like the
  * reference cube resolves its `WHERE` slicer.
  */
object MockXmlaServer {

  @volatile private var responses: Map[String, String] = Map.empty

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/xmla/default", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      responses.keys.find(body.contains).map(responses) match {
        case Some(xml) =>
          val bytes = xml.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        case None =>
          val bytes = "no response configured for request".getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(400, bytes.length)
          ex.getResponseBody.write(bytes)
      }
      ex.getResponseBody.close(); ex.close()
    })
    // daemon threads throughout: the server must never keep the Verify/
    // Bench JVM alive after main returns (HttpServer's dispatcher thread
    // inherits daemon status from the thread that calls start())
    s.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "mock-xmla-handler"); t.setDaemon(true); t
    })
    val starter = new Thread(() => s.start(), "mock-xmla-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    s
  }

  /** Install `slicer -> mddataset XML` responses; returns the base URL. */
  def serve(bySlicer: Map[String, String]): String = {
    responses = bySlicer
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  private def esc(s: String): String = XmlaHttpClient.xmlEscape(s)

  /** Render a wire-shape mddataset response: Axis0 = measure captions,
    * Axis1 = one tuple per row (single dimension member), dense
    * ordinal-addressed CellData (`CellOrdinal = row * nMeasures + col`,
    * `/root/reference/modules/olap.py:134-142`).
    */
  def mddataset(dimHierarchy: String, rows: Seq[(String, Seq[String])],
      measures: Seq[String]): String = {
    val axis0 = measures.map(m =>
      s"      <Tuple><Member Hierarchy=\"[Measures]\"><Caption>${esc(m)}</Caption></Member></Tuple>")
      .mkString("\n")
    val axis1 = rows.map { case (caption, _) =>
      s"      <Tuple><Member Hierarchy=\"${esc(dimHierarchy)}\"><Caption>${esc(caption)}</Caption></Member></Tuple>"
    }.mkString("\n")
    val cells = rows.zipWithIndex.flatMap { case ((_, vals), r) =>
      vals.zipWithIndex.map { case (v, c) =>
        s"    <Cell CellOrdinal=\"${r * measures.size + c}\"><Value>${esc(v)}</Value></Cell>"
      }
    }.mkString("\n")
    s"""<?xml version="1.0"?>
<root xmlns="urn:schemas-microsoft-com:xml-analysis:mddataset">
  <Axes>
    <Axis name="Axis0"><Tuples>
$axis0
    </Tuples></Axis>
    <Axis name="Axis1"><Tuples>
$axis1
    </Tuples></Axis>
  </Axes>
  <CellData>
$cells
  </CellData>
</root>"""
  }
}
