package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.etl.SpecLoader
import graft.sinks.DataverseDdl

/** Spec-driven Dataverse DDL: attribute metadata per the 5-type
  * vocabulary, entity + alternate-key wire shapes, idempotent
  * provisioning — mock-observed, mirroring
  * `dataverse_table_creation/create_*_table.py`.
  */
class DdlSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val spec = SpecLoader.fromResource("sales_channel")

  test("attribute JSON follows the reference's type metadata exactly") {
    val byDst = (spec.fields ++ spec.measures).map(f => f.dst -> f).toMap
    val str = DataverseDdl.attributeJson("crf63", byDst("store_number"))
    assert(str.contains(""""@odata.type":"Microsoft.Dynamics.CRM.StringAttributeMetadata""""))
    assert(str.contains(""""SchemaName":"crf63_store_number"""") && str.contains(""""MaxLength":100"""))
    val date = DataverseDdl.attributeJson("crf63", byDst("calendar_date"))
    assert(date.contains("DateTimeAttributeMetadata") && date.contains(""""Format":"DateOnly""""))
    val dec = DataverseDdl.attributeJson("crf63", byDst("ty_net_sales_usd"))
    assert(dec.contains("DecimalAttributeMetadata") && dec.contains(""""Precision":2"""))
    assert(dec.contains(""""MinValue":-100000000000.0""") && dec.contains(""""MaxValue":100000000000.0"""))
    val int = DataverseDdl.attributeJson("crf63", byDst("ty_orders"))
    assert(int.contains("IntegerAttributeMetadata"))
    assert(int.contains(""""MinValue":-2147483648""") && int.contains(""""MaxValue":2147483647"""))
    // display names carry the source caption
    assert(dec.contains(""""Label":"TY Net Sales USD""""))
  }

  test("entity + key shapes: primary name attr, UserOwned, key on business key") {
    val e = DataverseDdl.entityJson(spec, "crf63")
    assert(e.contains(""""@odata.type":"Microsoft.Dynamics.CRM.EntityMetadata""""))
    assert(e.contains(""""IsPrimaryName":true""") && e.contains(""""SchemaName":"crf63_name""""))
    assert(e.contains(""""SchemaName":"crf63_saleschannel"""") && e.contains(""""OwnershipType":"UserOwned""""))
    val k = DataverseDdl.alternateKeyJson("crf63")
    assert(k.contains(""""KeyAttributes":["crf63_businesskey"]"""))
    val bk = DataverseDdl.businessKeyColumnJson("crf63")
    assert(bk.contains(""""MaxLength":50""") && bk.contains(""""SchemaName":"crf63_businesskey""""))
  }

  test("provision POSTs entity, all columns, key; already-exists is idempotent") {
    val posts = new ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/data/v9.2/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      posts.add((ex.getRequestURI.getPath, body))
      // second run's entity create collides → reference-style 400
      val resp =
        if (body.contains("EntityMetadata") &&
          posts.toArray(Array.empty[(String, String)]).count(_._2.contains("EntityMetadata")) > 1)
          (400, """{"error":{"message":"An entity with the specified name already exists"}}""")
        else (201, "{}")
      val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(resp._1, bytes.length)
      ex.getResponseBody.write(bytes); ex.getResponseBody.close(); ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val r = DataverseDdl.provision(base, "tok", spec)
      // 10 mapped columns + business key
      assert(r.entityCreated && r.columnsCreated == 11 && r.keyCreated)
      val paths = posts.toArray(Array.empty[(String, String)]).map(_._1).toSeq
      assert(paths.count(_.endsWith("/EntityDefinitions")) == 1)
      assert(paths.count(_.endsWith("/Attributes")) == 11)
      assert(paths.count(_.endsWith("/Keys")) == 1)
      // re-provision: entity collides but the run completes (idempotent)
      val r2 = DataverseDdl.provision(base, "tok", spec)
      assert(!r2.entityCreated && r2.columnsCreated == 11)
    } finally server.stop(0)
  }
}
