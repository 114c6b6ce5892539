package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.sinks.{BatchSink, DataverseBatchUploader, TokenProvider}
import graft.sources.{XmlaHttpClient, XmlaSource}

/** Transport-layer integration against an in-process HTTP mock: the
  * XMLA SOAP Execute client (A1) and the Dataverse-style $batch
  * uploader (D1) — auth, retry/backoff, Retry-After, token refresh,
  * continue-on-error accounting.
  */
object HttpSpec {
  /** Serializable 401-rotation provider (no outer spec reference — the
    * uploader ships to executors).
    */
  class RotatingTokens extends TokenProvider {
    @volatile private var current = "expired"
    def token(): String = current
    def refresh(): String = { current = "fresh"; current }
  }
}

class HttpSpec extends SparkSpec {
  import spark.implicits._

  private def respond(ex: HttpExchange, status: Int, body: String,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) { ex.getResponseBody.write(bytes); ex.getResponseBody.close() }
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def withServer[T](register: HttpServer => Unit)(f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    register(server)
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private val mddataset = """<?xml version="1.0"?>
<root xmlns="urn:schemas-microsoft-com:xml-analysis:mddataset">
  <Axes>
    <Axis name="Axis0"><Tuples>
      <Tuple><Member Hierarchy="[Measures]"><Caption>TY Net Sales USD</Caption></Member></Tuple>
    </Tuples></Axis>
    <Axis name="Axis1"><Tuples>
      <Tuple><Member Hierarchy="[Franchise].[Store Number Label]"><Caption>S1</Caption></Member></Tuple>
      <Tuple><Member Hierarchy="[Franchise].[Store Number Label]"><Caption>S2</Caption></Member></Tuple>
    </Tuples></Axis>
  </Axes>
  <CellData>
    <Cell CellOrdinal="0"><Value>10.5</Value></Cell>
    <Cell CellOrdinal="1"><Value>20.5</Value></Cell>
  </CellData>
</root>"""

  test("XMLA client: SOAP POST with basic auth + CDATA MDX, decode end-to-end") {
    val seen = new AtomicReference[(String, String, String)]()
    withServer(s => s.createContext("/xmla/default", (ex: HttpExchange) => {
      val body = readBody(ex)
      seen.set((
        ex.getRequestHeaders.getFirst("Authorization"),
        ex.getRequestHeaders.getFirst("SOAPAction"),
        body))
      if (!body.contains("<Catalog>OARS</Catalog>")) respond(ex, 400, "wrong catalog")
      else respond(ex, 200, mddataset)
    })) { base =>
      val mdx = "SELECT {[Measures].[TY Net Sales USD]} ON COLUMNS FROM [Cube] WHERE ([X].&[1] & [Y])"
      val xml = XmlaHttpClient.execute(base, "OARS", "svc-user", "s3cret", mdx)
      val (auth, soapAction, body) = seen.get()
      val expectedAuth = "Basic " + java.util.Base64.getEncoder
        .encodeToString("svc-user:s3cret".getBytes(StandardCharsets.UTF_8))
      assert(auth == expectedAuth)
      assert(soapAction == "urn:schemas-microsoft-com:xml-analysis:Execute")
      // CDATA keeps raw MDX ampersands unescaped on the wire
      assert(body.contains(s"<![CDATA[$mdx]]>"))
      val df = XmlaSource.read(spark, xml,
        Seq(XmlaSource.DimMapping("Store Number", "store")))
      val rows = df.orderBy("store").collect()
      assert(rows.map(_.getAs[String]("store")).toSeq == Seq("S1", "S2"))
      assert(rows.map(_.getAs[String]("TY Net Sales USD")).toSeq == Seq("10.5", "20.5"))
    }
  }

  test("XMLA client: non-200 raises with body preview") {
    withServer(s => s.createContext("/xmla/default",
      (ex: HttpExchange) => respond(ex, 500, "cube exploded"))) { base =>
      val e = intercept[RuntimeException](
        XmlaHttpClient.execute(base, "OARS", "u", "p", "SELECT"))
      assert(e.getMessage.contains("HTTP 500"))
      assert(e.getMessage.contains("cube exploded"))
    }
  }

  /** Multipart response with one subresponse per Content-ID/status. */
  private def batchResponse(statuses: Seq[(Int, Int)]): String =
    statuses.map { case (id, code) =>
      val reason = code match {
        case 201 => "Created"; case 204 => "No Content"; case 200 => "OK"
        case 400 => "Bad Request"; case _ => "Error"
      }
      s"--changesetresponse\r\nContent-Type: application/http\r\nContent-ID: $id\r\n\r\nHTTP/1.1 $code $reason\r\n\r\n"
    }.mkString + "--changesetresponse--\r\n"

  test("$batch uploader: PATCH-by-key wire format, continue-on-error accounting") {
    val bodies = new AtomicReference[String]()
    withServer(s => s.createContext("/api/data/v9.2/$batch", (ex: HttpExchange) => {
      val body = readBody(ex)
      bodies.set(body)
      // 3 records: created, updated, failed — continue-on-error semantics
      respond(ex, 200, batchResponse(Seq(1 -> 201, 2 -> 204, 3 -> 400)))
    })) { base =>
      val df = Seq(
        ("S1_20250101", 10.0, "it's"), // single quote must double on the wire
        ("S2_20250101", 20.0, null),   // null field must be omitted (B12)
        ("S3_20250101", 30.0, "c"))
        .toDF("crf63_businesskey", "net_sales", "note")
      val up = new DataverseBatchUploader(s"$base/api/data/v9.2",
        "crf63_oarsbidatas", "crf63_businesskey", TokenProvider.static("tok"))
      val stats = BatchSink.write(df.coalesce(1), up)
      assert(stats == BatchSink.Stats(created = 1, updated = 1, failed = 1))
      val body = bodies.get()
      assert(body.contains("PATCH crf63_oarsbidatas(crf63_businesskey='S1_20250101') HTTP/1.1"))
      assert(body.contains("Prefer: return=representation,odata.include-annotations=*"))
      assert(body.contains("\"note\":\"it''s\"") || body.contains("\"note\":\"it's\""))
      // B12: the null field never appears in the JSON payload
      assert(!body.contains("\"note\":null"))
      assert(body.contains("Content-ID: 3"))
    }
  }

  test("$batch uploader: 429 honors Retry-After, then succeeds") {
    val calls = new AtomicInteger(0)
    withServer(s => s.createContext("/api/data/v9.2/$batch", (ex: HttpExchange) => {
      readBody(ex)
      if (calls.incrementAndGet() == 1)
        respond(ex, 429, "", Map("Retry-After" -> "0"))
      else respond(ex, 200, batchResponse(Seq(1 -> 204)))
    })) { base =>
      val df = Seq(("K1", 1.0)).toDF("crf63_businesskey", "v")
      val up = new DataverseBatchUploader(s"$base/api/data/v9.2",
        "t", "crf63_businesskey", TokenProvider.static("tok"))
      val stats = BatchSink.write(df.coalesce(1), up, baseBackoffMs = 1)
      assert(stats == BatchSink.Stats(0, 1, 0))
      assert(calls.get() == 2)
    }
  }

  test("$batch uploader: 401 triggers token refresh, retry carries the new bearer") {
    val tokensSeen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer(s => s.createContext("/api/data/v9.2/$batch", (ex: HttpExchange) => {
      readBody(ex)
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      tokensSeen.add(auth)
      if (auth == "Bearer expired") respond(ex, 401, "token expired")
      else respond(ex, 200, batchResponse(Seq(1 -> 201)))
    })) { base =>
      val df = Seq(("K1", 1.0)).toDF("crf63_businesskey", "v")
      // the uploader closure serializes to the task, so the refresh must
      // be observed on the wire (the server sees the rotated bearer),
      // not via driver-side counters
      val up = new DataverseBatchUploader(s"$base/api/data/v9.2",
        "t", "crf63_businesskey", new HttpSpec.RotatingTokens)
      val stats = BatchSink.write(df.coalesce(1), up, baseBackoffMs = 1)
      assert(stats == BatchSink.Stats(1, 0, 0))
      assert(tokensSeen.toArray.toSeq == Seq("Bearer expired", "Bearer fresh"))
    }
  }

  test("notifier: sendMail-shaped POST, 202 = sent, disabled/no-op gates") {
    import graft.ops.Notifier
    val seen = new AtomicReference[(String, String)]()
    withServer(s => s.createContext("/v1.0/users/ops@x.com/sendMail", (ex: HttpExchange) => {
      seen.set((ex.getRequestHeaders.getFirst("Authorization"), readBody(ex)))
      respond(ex, 202, "")
    })) { base =>
      val cfg = Notifier.Config(
        enabled = true,
        endpoint = s"$base/v1.0/users/ops@x.com/sendMail",
        recipients = Seq("a@x.com", "b@x.com"),
        tokens = TokenProvider.static("graph-tok"))
      val run = Notifier.RunSummary("daily_sales", created = 100, updated = 50,
        failed = 0, elapsedSec = 2.0, error = None)
      assert(Notifier.notifyRun(cfg, run))
      val (auth, body) = seen.get()
      assert(auth == "Bearer graph-tok")
      assert(body.contains("\"subject\":\"[OK] daily_sales sync complete\""))
      assert(body.contains("\"contentType\":\"Text\""))
      assert(body.contains("{\"emailAddress\":{\"address\":\"a@x.com\"}}"))
      assert(body.contains("Created: 100"))
      assert(body.contains("75 rows/sec"))
      // failure summary flips the subject
      val (subj, _) = Notifier.format(run.copy(failed = 3, error = Some("boom")))
      assert(subj == "[FAILED] daily_sales sync")
      // config gates: disabled or no recipients → no-op, never throws
      assert(!Notifier.notifyRun(cfg.copy(enabled = false), run))
      assert(!Notifier.notifyRun(cfg.copy(recipients = Nil), run))
      // unreachable endpoint → false, not an exception (never fails a run)
      assert(!Notifier.send(cfg.copy(endpoint = "http://127.0.0.1:9/sendMail"), "s", "b"))
    }
  }

  test("$batch uploader: 5xx retries then exhausts to per-row failures") {
    val calls = new AtomicInteger(0)
    withServer(s => s.createContext("/api/data/v9.2/$batch", (ex: HttpExchange) => {
      readBody(ex); calls.incrementAndGet(); respond(ex, 503, "down")
    })) { base =>
      val df = Seq(("K1", 1.0), ("K2", 2.0)).toDF("crf63_businesskey", "v")
      val up = new DataverseBatchUploader(s"$base/api/data/v9.2",
        "t", "crf63_businesskey", TokenProvider.static("tok"))
      val e = intercept[org.apache.spark.SparkException](
        BatchSink.write(df.coalesce(1), up, maxRetries = 2, baseBackoffMs = 1))
      // retries exhausted: the task surfaces the transport failure rather
      // than silently losing rows
      assert(e.getMessage.contains("503") ||
        Option(e.getCause).exists(_.getMessage.contains("503")))
      assert(calls.get() >= 3) // initial + 2 retries
    }
  }
}
