package graft

import org.apache.spark.sql.functions._
import graft.etl.{Pipeline, SpecLoader}

/** Spec-compiler specs: YAML load (A11) + compile semantics (B1–B9)
  * including the 'All'-row drop and default fill.
  */
class PipelineSpecSpec extends SparkSpec {
  import spark.implicits._

  private val yaml = """
name: daily_sales_test
fields:
  - {src: StoreNumber, dst: store, type: string}
  - {src: CalendarDate, dst: cal_date, type: date}
measures:
  - {src: NetSales, dst: net_sales, type: decimal, default: "0"}
  - {src: Orders, dst: orders, type: int}
required_dims: [store, cal_date]
drop_all_on: [StoreNumber]
key_components: [store, cal_date]
display_components: [store, cal_date]
datasource: test_src
"""

  test("yaml spec loads with all sections") {
    val spec = SpecLoader.parse(yaml)
    assert(spec.name == "daily_sales_test")
    assert(spec.fields.map(_.dst) == Seq("store", "cal_date"))
    assert(spec.measures.find(_.dst == "net_sales").flatMap(_.default).contains("0"))
    assert(spec.dropAllOn == Seq("StoreNumber"))
    assert(spec.datasource.contains("test_src"))
  }

  test("compile: coerces, drops All rows, fills defaults, keys rows") {
    val raw = Seq(
      ("S 1", "11/5/25", "1,234.5", "7"),
      ("All", "11/5/25", "9", "9"),        // cube grand-total artifact → dropped
      ("S2", null, "5", "1"),              // missing required dim → dropped
      ("S3", "11/6/25", null, "2"))        // null measure → default 0
      .toDF("StoreNumber", "CalendarDate", "NetSales", "Orders")
    val out = Pipeline.compile(SpecLoader.parse(yaml), raw,
      refreshedAt = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
      .orderBy("store")
      .collect()
    assert(out.length == 2)
    val r0 = out(0)
    assert(r0.getAs[String]("store") == "S 1")
    assert(r0.getAs[java.math.BigDecimal]("net_sales").toString == "1234.50")
    assert(r0.getAs[String]("business_key") == "S_1_20251105")
    assert(r0.getAs[String]("display_name") == "S 1 - 2025-11-05")
    assert(r0.getAs[String]("datasource") == "test_src")
    val r1 = out(1)
    assert(r1.getAs[String]("store") == "S3")
    assert(r1.getAs[java.math.BigDecimal]("net_sales").toString == "0.00")
    assert(r1.getAs[Long]("orders") == 2L)
  }
}
