package graft.cube

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 13-4 retail calendar semantics (SURVEY.md §2 G5/G7).
  *
  * The reference slices MDX on `[13-4 Calendar].[d_Year]/[d_Period]`
  * (`/root/reference/modules/olap_sync.py:264-280`; 13 periods/yr per
  * `backfill_sales_channel_by_period.sh:19-21`). We compute the calendar
  * natively: 13 periods × 28 days, anchored at Jan 1 of the civil year;
  * days past day 364 fold into period 13 / week 53 (the 53-week-year
  * case that makes "same period last year" a calendar join rather than
  * `date_sub(364)` — SURVEY.md §7.5 risk 3).
  *
  * All columns are plain Catalyst date arithmetic — they push into scans
  * and survive partition pruning when facts are stored partitioned by
  * `fiscal_year`/`fiscal_period`.
  */
object FiscalCalendar {

  def fiscalYear(d: Column): Column = year(d)

  // `floor(x / k)` (not `cast int`) everywhere: Spark's double→int cast
  // truncates while other engines round, so floor is the only portable
  // integer-division spelling for differential testing.

  /** 1..13, 28-day periods; day 365/366 folds into period 13. */
  def fiscalPeriod(d: Column): Column =
    least(lit(13), floor((dayofyear(d) - 1) / lit(28.0)).cast("int") + 1)

  /** 1..53 week-of-fiscal-year. */
  def fiscalWeek(d: Column): Column =
    least(lit(53), floor((dayofyear(d) - 1) / lit(7.0)).cast("int") + 1)

  /** Global week index since epoch — the join key for TY/LY alignment:
    * the same fiscal week one year earlier is `weekIndex - 52`.
    */
  def weekIndex(d: Column): Column =
    floor(datediff(d, lit("1970-01-01")) / lit(7.0)).cast("long")

  // ---- anchored 52/53-week retail calendar (SURVEY.md §7.5 risk 3) ----
  //
  // The simple columns above fold day 365/366 into period 13 / week 53 —
  // fine for slicing, wrong for true 13-4 TY/LY alignment. A real retail
  // calendar anchors each fiscal year on a week boundary: here the
  // week-start day (Sunday) NEAREST to Feb 1 of the civil year (the
  // NRF-style rule), which makes every fiscal year exactly 364 days
  // (52 weeks) or 371 days (53 weeks) with no folding. All pure date
  // arithmetic — pushes into scans, no driver-side calendar loop, and
  // replayable in any engine with make_date/dayofweek.

  /** Week-aligned start of the fiscal year labelled `y`: the Sunday
    * nearest Feb 1 of civil year `y` (ties ≤3 days go backward).
    */
  def anchorStart(y: Column): Column = {
    val base = make_date(y, lit(2), lit(1))
    val diff = dayofweek(base) - 1 // days since Sunday, 0..6
    val prev = date_sub(base, diff)
    when(diff <= 3, prev).otherwise(date_add(prev, 7))
  }

  /** Fiscal year of date `d` (DateType) under the anchored calendar: a
    * late-January date belongs to the prior label when it precedes that
    * civil year's anchor.
    */
  def fiscalYearAnchored(d: Column): Column = {
    val y = year(d)
    when(d < anchorStart(y), y - 1).otherwise(y)
  }

  /** 1..52 (or 53 in a 371-day year) — exact week-of-fiscal-year, no
    * folding.
    */
  def fiscalWeekAnchored(d: Column): Column =
    floor(datediff(d, anchorStart(fiscalYearAnchored(d))) / lit(7.0)).cast("int") + 1

  /** 1..13 four-week periods; period 13 carries the extra week of a
    * 53-week year.
    */
  def fiscalPeriodAnchored(d: Column): Column =
    least(lit(13), floor((fiscalWeekAnchored(d) - 1) / lit(4.0)).cast("int") + 1)

  /** Materialized date dimension over [start, end], one row per day.
    * Generated with `sequence` + `explode` — fully distributed, no
    * driver-side loop; at 100 TB the dim is still only ~tens of
    * thousands of rows and always broadcast-joined.
    */
  def dateDim(spark: SparkSession, start: String, end: String): DataFrame = {
    val base = spark.sql(
      s"SELECT explode(sequence(to_date('$start'), to_date('$end'), interval 1 day)) AS cal_date")
    base
      .withColumn("fiscal_year", fiscalYear(col("cal_date")))
      .withColumn("fiscal_period", fiscalPeriod(col("cal_date")))
      .withColumn("fiscal_week", fiscalWeek(col("cal_date")))
      .withColumn("week_index", weekIndex(col("cal_date")))
      .withColumn("day_of_week", dayofweek(col("cal_date")))
  }
}
