package graft

import org.apache.spark.sql.functions._
import graft.functions.{Coercions, Keys}
import graft.cube.FiscalCalendar

/** Kernel specs: coercion vocabulary (B2/B5/B11), business keys (B6/B7),
  * fiscal calendar (G5/G7). These are the reference-fidelity rules of
  * SURVEY.md §7.5 (risks 2/3/5) — exact behavior pinned by example.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Any = {
    val r = Seq(Option(input)).toDF("x").select(c.as("y")).collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("asInt strips commas and truncates via float like the reference") {
    assert(one(Coercions.asInt(col("x")), "1,234") == 1234L)
    assert(one(Coercions.asInt(col("x")), "12.7") == 12L) // int(float(x))
    assert(one(Coercions.asInt(col("x")), "-") == null)
    assert(one(Coercions.asInt(col("x")), "NULL") == null)
    assert(one(Coercions.asInt(col("x")), "") == null)
    assert(one(Coercions.asInt(col("x")), "garbage") == null)
  }

  test("asDecimal rounds at scale 2 (sink boundary policy)") {
    assert(one(Coercions.asDecimal(col("x")), "1,234.567").toString == "1234.57")
    assert(one(Coercions.asDecimal(col("x")), "-") == null)
  }

  test("asDate accepts the reference's observed formats, strips time") {
    for (in <- Seq("11/5/25", "11/05/2025", "2025-11-05", "20251105", "2025-11-05 13:14:15"))
      assert(one(Coercions.asDate(col("x")), in).toString == "2025-11-05", s"input: $in")
    assert(one(Coercions.asDate(col("x")), "not a date") == null)
  }

  test("asHhmm normalizes ints and partial times like load_store_hours") {
    assert(one(Coercions.asHhmm(col("x")), "100") == "01:00")
    assert(one(Coercions.asHhmm(col("x")), "1100") == "11:00")
    assert(one(Coercions.asHhmm(col("x")), "9:30") == "09:30")
    assert(one(Coercions.asHhmm(col("x")), "11:00") == "11:00")
    assert(one(Coercions.asHhmm(col("x")), "0") == "00:00")
    assert(one(Coercions.asHhmm(col("x")), "bogus") == null)
  }

  test("business key cleaning: spaces/hyphens to _, blank to Unknown") {
    val df = Seq(("Store 7-A", "2025-11-05", null: String)).toDF("s", "d", "c")
    val key = df.select(Keys.businessKey(
      col("s"), Keys.dateComponent(col("d").cast("date")), col("c")).as("k"))
      .collect()(0).getString(0)
    assert(key == "Store_7_A_20251105_Unknown")
  }

  test("fiscal calendar: 13 periods of 28 days, day 365+ folds into P13") {
    val df = Seq("2025-01-01", "2025-01-28", "2025-01-29", "2025-12-31", "2024-12-31")
      .toDF("d").select(col("d").cast("date").as("d"))
    val rows = df.select(FiscalCalendar.fiscalPeriod(col("d"))).as[Int].collect()
    assert(rows.toSeq == Seq(1, 1, 2, 13, 13)) // 2024 is a leap year: day 366 → P13
  }

  test("weekIndex aligns same fiscal week across years via -52") {
    val df = Seq(("2025-03-10", "2024-03-11")).toDF("ty", "ly")
      .select(col("ty").cast("date").as("ty"), col("ly").cast("date").as("ly"))
    val r = df.select(
      FiscalCalendar.weekIndex(col("ty")).as("wty"),
      FiscalCalendar.weekIndex(col("ly")).as("wly")).collect()(0)
    assert(r.getLong(0) - r.getLong(1) == 52)
  }
}
