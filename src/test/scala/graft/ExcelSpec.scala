package graft

import graft.sources.ExcelSource

/** A8 — xlsx reader semantics against the reference's loader
  * (`load_store_hours.py:64-108`): header row, skip-empty-first-cell,
  * numeric + shared/inline string cells, sparse cells.
  */
class ExcelSpec extends SparkSpec {

  private def tmpXlsx(rows: Seq[Seq[String]], sheet: String = "Store hours"): String = {
    val p = java.nio.file.Files.createTempFile("graft-xl", ".xlsx").toString
    ExcelSource.writeXlsx(p, sheet, rows)
    p
  }

  test("colIndex decodes A1-style column letters") {
    assert(ExcelSource.colIndex("A1") == 0)
    assert(ExcelSource.colIndex("B12") == 1)
    assert(ExcelSource.colIndex("Z9") == 25)
    assert(ExcelSource.colIndex("AA1") == 26)
    assert(ExcelSource.colIndex("AB3") == 27)
  }

  test("read: header row, numbers and strings, empty-first-cell rows skipped") {
    val p = tmpXlsx(Seq(
      Seq("store_number", "day_of_week", "open_raw", "close_raw"),
      Seq("101", "1", "100", "1100"),
      Seq("", "9", "930", "2300"), // empty first cell → skipped
      Seq("102", "2", "9:30", "23:00")))
    val df = ExcelSource.read(spark, p, "Store hours")
    assert(df.columns.toSeq == Seq("store_number", "day_of_week", "open_raw", "close_raw"))
    val rows = df.collect().map(_.toSeq.map(Option(_).map(_.toString).orNull))
    assert(rows.length == 2)
    assert(rows(0) == Seq("101", "1", "100", "1100"))
    assert(rows(1) == Seq("102", "2", "9:30", "23:00"))
  }

  test("read: missing sheet names are reported, wrong name fails") {
    val p = tmpXlsx(Seq(Seq("a"), Seq("1")))
    val e = intercept[IllegalArgumentException](ExcelSource.read(spark, p, "Nope"))
    assert(e.getMessage.contains("Store hours"))
  }

  test("store_hours e2e: xlsx → mapping → HH:MM → business key") {
    import org.apache.spark.sql.functions._
    val p = tmpXlsx(Seq(
      Seq("store_number", "day_of_week", "open_raw", "close_raw"),
      Seq("101", "1", "100", "1100"),
      Seq("101", "2", "930", "2330")))
    val raw = ExcelSource.read(spark, p, "Store hours")
    val out = graft.etl.Pipeline.compile(
      graft.etl.SpecLoader.fromResource("store_hours"), raw,
      refreshedAt = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
      .join(raw.select(col("store_number"),
        graft.functions.Coercions.asInt(col("day_of_week")).as("day_of_week"),
        graft.functions.Coercions.asHhmm(col("open_raw")).as("open_time"),
        graft.functions.Coercions.asHhmm(col("close_raw")).as("close_time")),
        Seq("store_number", "day_of_week"))
      .orderBy("day_of_week")
      .collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("business_key") == "101_1")
    assert(out(0).getAs[String]("open_time") == "01:00")
    assert(out(0).getAs[String]("close_time") == "11:00")
    assert(out(1).getAs[String]("open_time") == "09:30")
    assert(out(1).getAs[String]("close_time") == "23:30")
  }
}
