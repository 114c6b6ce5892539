package graft

import org.apache.spark.sql.functions._
import graft.etl.{Pipeline, PipelineSpec, SpecLoader}
import scala.io.Source

/** The reference's five production pipelines as shipped YAML specs
  * (src/main/resources/pipelines/), compiled and run over fixture rows
  * carrying every FIXTURES.md §2 edge case — the "switch over" proof:
  * a reference user's mapping files work here verbatim in shape.
  */
class ReferencePipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def load(name: String): PipelineSpec = {
    val in = getClass.getResourceAsStream(s"/pipelines/$name.yaml")
    assert(in != null, s"missing resource $name")
    SpecLoader.parse(Source.fromInputStream(in, "UTF-8").mkString)
  }

  test("all five reference pipelines load with the expected shapes") {
    val specs = Seq("daily_sales", "sales_channel", "offers", "inventory", "clock_in_out")
      .map(load)
    val byName = specs.map(s => s.name -> s).toMap
    assert(byName("daily_sales").measures.size == 47)
    assert(byName("sales_channel").fields.map(_.dst) ==
      Seq("store_number", "calendar_date", "source_actor", "source_channel", "day_part"))
    assert(byName("offers").measures.size == 8)
    assert(byName("inventory").measures.map(_.dst) == Seq("qty_on_hand"))
    assert(byName("clock_in_out").measures.count(_.typ == "datetime") == 2)
    assert(specs.forall(_.datasource.contains("OARS Franchise")))
  }

  test("sales_channel compiles and handles every FIXTURES edge case") {
    val spec = load("sales_channel")
    val raw = Seq(
      // comma numeric, space+hyphen in dims, multi-format date
      ("Store 7-A", "11/5/25", "Android", "App", "Lunch", "1,234.56", "12", "5.5", "1,000", "9"),
      // blank actor/daypart → Unknown in key; sentinel numerics → null
      ("S2", "2025-11-05", "", "Web", null, "-", "NULL", "", "7", "3"),
      // 'All' cube artifact row → dropped
      ("All", "11/5/25", "Android", "App", "Lunch", "1", "1", "1", "1", "1"),
      // missing required dim → dropped
      (null, "11/5/25", "iOS", "App", "Dinner", "2", "2", "2", "2", "2"))
      .toDF("StoreNumber", "CalendarDate", "SourceActor", "SourceChannel", "DayPart",
        "TY Net Sales USD", "TY Orders", "Discounts USD", "LY Net Sales USD", "LY Orders")
    val out = Pipeline.compile(spec, raw,
      refreshedAt = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
      .orderBy("store_number").collect()
    assert(out.length == 2)
    val r0 = out(0)
    assert(r0.getAs[String]("business_key") == "S2_20251105_Unknown_Web_Unknown")
    assert(r0.isNullAt(r0.fieldIndex("ty_net_sales_usd"))) // '-' sentinel
    assert(r0.isNullAt(r0.fieldIndex("ty_orders"))) // 'NULL' sentinel
    assert(r0.getAs[java.math.BigDecimal]("ly_net_sales_usd").intValue == 7)
    val r1 = out(1)
    assert(r1.getAs[String]("business_key") == "Store_7_A_20251105_Android_App_Lunch")
    assert(r1.getAs[java.math.BigDecimal]("ty_net_sales_usd").toString == "1234.56")
    assert(r1.getAs[java.math.BigDecimal]("ly_net_sales_usd").intValue == 1000)
  }

  test("store_hours master data: HH:MM normalization through the pipeline") {
    val spec = load("store_hours")
    val raw = Seq(
      ("101", "1", "100", "1100"),
      ("101", "2", "9:30", "23:00"),
      ("All", "1", "100", "200"))
      .toDF("store_number", "day_of_week", "open_raw", "close_raw")
    val compiled = Pipeline.compile(spec, raw,
      refreshedAt = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
      // HH:MM columns ride alongside the spec-compiled dims (B11)
      .join(raw.select(col("store_number"), col("day_of_week").cast("long").as("day_of_week"),
        graft.functions.Coercions.asHhmm(col("open_raw")).as("open_time"),
        graft.functions.Coercions.asHhmm(col("close_raw")).as("close_time")),
        Seq("store_number", "day_of_week"))
      .orderBy("store_number", "day_of_week")
    val rows = compiled.collect()
    assert(rows.length == 3) // no drop_all_on in this spec: 'All' is a legal store label here
    assert(rows(0).getAs[String]("business_key") == "101_1")
    assert(rows(0).getAs[String]("open_time") == "01:00")
    assert(rows(0).getAs[String]("close_time") == "11:00")
    assert(rows(1).getAs[String]("open_time") == "09:30")
    assert(rows(1).getAs[String]("close_time") == "23:00")
    assert(rows(2).getAs[String]("business_key") == "All_1")
  }

  test("salted sales_channel aggregate: bit-identical to unsalted, salt visible in plan") {
    import graft.PipelineQueries
    val unsalted = PipelineQueries.salesChannelAgg(spark, sfDir)
    val salted = PipelineQueries.salesChannelAgg(spark, sfDir, salts = 8)
    try {
      // the salt must appear only in the partial aggregate level: two
      // grouping levels, the first keyed by dims + __salt (the physical
      // plan string elides the cached relation's deep subtree, so pin on
      // the analyzed plan)
      val p = salted.queryExecution.analyzed.toString
      assert(p.contains("__salt"), "salted plan lost its salt column")
      assert(!salted.columns.contains("__salt"), "salt leaked into the output schema")
      // exactness pin: countDistinct salted BY l_orderkey and decimal
      // partials re-summed must reproduce the unsalted result bit-for-bit
      def key(r: org.apache.spark.sql.Row) =
        (0 until 5).map(r.get(_).toString).mkString("|")
      val a = unsalted.collect().map(r => key(r) -> r.toSeq.drop(5)).toMap
      val b = salted.collect().map(r => key(r) -> r.toSeq.drop(5)).toMap
      assert(a.size == b.size && a.keys.forall(k => a(k) == b(k)),
        s"salted diverged: ${a.keys.find(k => a(k) != b(k)).map(k => (k, a(k), b(k)))}")
    } finally spark.catalog.clearCache()
  }

  test("daily_sales 47-measure spec compiles to a single narrow projection") {
    val spec = load("daily_sales")
    // raw frame with all 49 source columns, one row
    val srcCols = (spec.fields ++ spec.measures).map(_.src)
    val row = srcCols.map {
      case "StoreNumber" => "S1"
      case "CalendarDate" => "11/5/25"
      case "TY Net Sales USD" => "9,999.99"
      case "TY Orders" => "42"
      case _ => null
    }
    val raw = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row.fromSeq(row)),
      org.apache.spark.sql.types.StructType(srcCols.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType))))
    val out = Pipeline.compile(spec, raw)
    assert(out.columns.length == 49 + 4) // dims+measures + key/display/datasource/lastrefreshed
    val r = out.collect()(0)
    assert(r.getAs[String]("business_key") == "S1_20251105")
    assert(r.getAs[java.math.BigDecimal]("ty_net_sales_usd").toString == "9999.99")
    assert(r.getAs[Long]("ty_orders") == 42L)
    // no shuffle in the compiled plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
