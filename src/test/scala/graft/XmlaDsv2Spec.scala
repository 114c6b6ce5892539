package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

/** DataSource V2 XMLA connector: one input partition per slicer chunk
  * (each task issues its own SOAP POST against the mock), slicer-filter
  * pushdown pruning chunks before any HTTP call, and column pruning.
  */
object XmlaDsv2Spec {
  // companion-object state: task closures are deserialized copies, but
  // local-mode tasks share the JVM, so the mock's observations land here
  val posts = new ConcurrentLinkedQueue[(String, String)]() // (slicer, thread)
}

class XmlaDsv2Spec extends SparkSpec {
  import spark.implicits._

  private def mddatasetFor(slicer: String): String = {
    // two stores, one measure; values derived from the slicer so each
    // chunk's rows are distinguishable
    val base = slicer.takeRight(1)
    s"""<?xml version="1.0"?>
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
    <Cell CellOrdinal="0"><Value>$base.10</Value></Cell>
    <Cell CellOrdinal="1"><Value>$base.20</Value></Cell>
  </CellData>
</root>"""
  }

  private val SlicerRe = raw"FY\d{4}".r

  private def withServer[T](f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/xmla/default", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val slicer = SlicerRe.findFirstIn(body).getOrElse("?")
      XmlaDsv2Spec.posts.add((slicer, Thread.currentThread().getName))
      val bytes = mddatasetFor(slicer).getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes); ex.getResponseBody.close(); ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def reader(base: String) =
    spark.read.format("xmla")
      .option("server", base).option("catalog", "OARS")
      .option("username", "u").option("password", "p")
      .option("mdx",
        "SELECT {[Measures].[TY Net Sales USD]} ON COLUMNS FROM [Cube] " +
          "WHERE ([Calendar].[Fiscal_Year].&[{slicer}])")
      .option("chunks", "FY2023,FY2024,FY2025")
      .option("measures", "TY Net Sales USD")
      .option("dims", "\\[Franchise\\]\tStoreNumber")

  test("N chunks fetch as N tasks; rows union across chunks") {
    XmlaDsv2Spec.posts.clear()
    withServer { base =>
      val out = reader(base).load()
        .select("slicer", "StoreNumber", "TY Net Sales USD")
        .as[(String, String, String)].collect().toSet
      assert(out == Set(
        ("FY2023", "S1", "3.10"), ("FY2023", "S2", "3.20"),
        ("FY2024", "S1", "4.10"), ("FY2024", "S2", "4.20"),
        ("FY2025", "S1", "5.10"), ("FY2025", "S2", "5.20")))
      val seen = XmlaDsv2Spec.posts.toArray(Array.empty[(String, String)]).toSeq
      assert(seen.map(_._1).sorted == Seq("FY2023", "FY2024", "FY2025"),
        s"expected one POST per chunk, saw $seen")
      // the fetches ran in Spark tasks (executor threads), not the driver
      assert(XmlaDsv2Spec.posts.size == 3)
    }
  }

  test("slicer equality pushes down: only the matching chunk is fetched") {
    XmlaDsv2Spec.posts.clear()
    withServer { base =>
      val df = reader(base).load().filter(col("slicer") === "FY2024")
      // pushdown visible on the scan: chunk list pruned to one
      val scans = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.asInstanceOf[graft.sources.XmlaScan]
      }
      assert(scans.nonEmpty)
      assert(scans.head.chunks == Seq("FY2024"), scans.head.description())
      assert(scans.head.description().contains("PushedFilters: ["), scans.head.description())
      val out = df.select("StoreNumber", "TY Net Sales USD")
        .as[(String, String)].collect().toSet
      assert(out == Set(("S1", "4.10"), ("S2", "4.20")))
      // exactly ONE HTTP call — pruned chunks never hit the wire
      val seen = XmlaDsv2Spec.posts.toArray(Array.empty[(String, String)]).toSeq
      assert(seen.map(_._1) == Seq("FY2024"), s"pruning failed: $seen")
    }
  }

  test("transient 429/503 per chunk retries in-task: complete data, N+k POSTs") {
    XmlaDsv2Spec.posts.clear()
    val failedOnce = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/xmla/default", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val slicer = SlicerRe.findFirstIn(body).getOrElse("?")
      XmlaDsv2Spec.posts.add((slicer, Thread.currentThread().getName))
      if (failedOnce.add(slicer)) {
        // first POST per chunk is throttled; FY2024 carries Retry-After
        val status = if (slicer == "FY2024") 429 else 503
        if (slicer == "FY2024") ex.getResponseHeaders.add("Retry-After", "0")
        ex.sendResponseHeaders(status, -1)
      } else {
        val bytes = mddatasetFor(slicer).getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.getResponseBody.close()
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val out = reader(base).option("retryBackoffMs", "10").load()
        .select("slicer", "StoreNumber", "TY Net Sales USD")
        .as[(String, String, String)].collect().toSet
      // every chunk's data arrived despite each failing once
      assert(out == Set(
        ("FY2023", "S1", "3.10"), ("FY2023", "S2", "3.20"),
        ("FY2024", "S1", "4.10"), ("FY2024", "S2", "4.20"),
        ("FY2025", "S1", "5.10"), ("FY2025", "S2", "5.20")))
      // exactly 2 POSTs per chunk: the failure + the in-task retry (a
      // task-level retry would re-run the whole reader and over-POST)
      val seen = XmlaDsv2Spec.posts.toArray(Array.empty[(String, String)]).toSeq
      assert(seen.map(_._1).sorted ==
        Seq("FY2023", "FY2023", "FY2024", "FY2024", "FY2025", "FY2025"), seen)
    } finally server.stop(0)
  }

  test("non-retryable 4xx fails the task immediately (no retry storm)") {
    XmlaDsv2Spec.posts.clear()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/xmla/default", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      XmlaDsv2Spec.posts.add((SlicerRe.findFirstIn(body).getOrElse("?"),
        Thread.currentThread().getName))
      ex.sendResponseHeaders(401, -1); ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val e = intercept[org.apache.spark.SparkException] {
        reader(base).option("retryBackoffMs", "10")
          .option("chunks", "FY2023").load().collect()
      }
      assert(e.getMessage.contains("HTTP 401") ||
        String.valueOf(e.getCause).contains("HTTP 401"), e.getMessage)
      // one POST per task attempt — the client never retried a 401
      val perAttempt = XmlaDsv2Spec.posts.size
      assert(perAttempt >= 1 && perAttempt <= 4, s"saw $perAttempt POSTs")
    } finally server.stop(0)
  }

  test("IN-list pushdown prunes to the named chunks; column pruning holds") {
    XmlaDsv2Spec.posts.clear()
    withServer { base =>
      val df = reader(base).load()
        .filter(col("slicer").isin("FY2023", "FY2025"))
        .select("StoreNumber") // slicer + measure pruned from the read schema
      val scans = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.asInstanceOf[graft.sources.XmlaScan]
      }
      assert(scans.head.chunks.toSet == Set("FY2023", "FY2025"))
      assert(scans.head.readSchema().fieldNames.toSeq == Seq("StoreNumber"),
        scans.head.readSchema().treeString)
      assert(df.as[String].collect().toSeq.sorted == Seq("S1", "S1", "S2", "S2"))
      assert(XmlaDsv2Spec.posts.size == 2)
    }
  }
}
