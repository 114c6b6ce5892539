package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's 5-type scalar coercion vocabulary, re-expressed as
  * codegen-friendly Catalyst column expressions (no UDFs).
  *
  * Semantics mirror the reference's mapping-apply kernel
  * (`/root/reference/modules/pipeline_runner.py:81-130`):
  *   - string   → str(value)
  *   - date     → parse many formats, strip time (TZ-day-shift guard)
  *   - datetime → parse, assume UTC when naive
  *   - int      → comma-tolerant integer ("1,234" → 1234)
  *   - decimal  → comma-tolerant float, stored at scale 2
  * plus the multi-format date loop (`load_csv.py:46-51`,
  * `transformers.py:229-236`) and HH:MM time normalization
  * (`load_store_hours.py:33-61`).
  *
  * Everything here stays inside whole-stage codegen: `regexp_replace`,
  * `try_to_date`, `coalesce`, `try_cast` are all native expressions (the
  * try_ variants, because Spark 4's ANSI mode makes the plain forms throw
  * on unparseable input where the reference coerces to null) — important
  * because these kernels sit on every row of a 100 TB typed projection.
  */
object Coercions {

  /** Strip thousands separators before a numeric cast. */
  private def denumberized(c: Column): Column =
    regexp_replace(trim(c.cast(StringType)), ",", "")

  /** Comma-tolerant integer coercion. The reference routes through
    * float first (`int(float(x))`), i.e. "12.7" → 12 (truncation).
    * `-`, `NULL`, `''` sentinels (load_csv.py:58-59) coerce to null.
    */
  def asInt(c: Column): Column = {
    val cleaned = denumberized(c)
    when(cleaned.isin("-", "NULL", "null", ""), lit(null))
      .otherwise(cleaned.try_cast(DoubleType).cast(LongType))
  }

  /** Comma-tolerant decimal coercion at the reference's storage scale
    * (Dataverse DecimalAttributeMetadata Precision=2).
    */
  def asDecimal(c: Column, precision: Int = 18, scale: Int = 2): Column = {
    val cleaned = denumberized(c)
    when(cleaned.isin("-", "NULL", "null", ""), lit(null))
      .otherwise(cleaned.try_cast(DoubleType).cast(DecimalType(precision, scale)))
  }

  def asString(c: Column): Column = c.cast(StringType)

  /** Candidate formats the reference's dateutil-based parser accepts in
    * practice (transformers.py:229-236; load_csv.py:46-51). First match
    * wins via `coalesce`; time-of-day is dropped to guard against
    * timezone day-shifts (pipeline_runner.py:89-100).
    */
  private val dateFormats =
    Seq("M/d/yy", "M/d/yyyy", "yyyy-MM-dd", "MM/dd/yyyy", "yyyyMMdd")

  def asDate(c: Column): Column = {
    val s = trim(c.cast(StringType))
    // ISO datetime prefix handled first (strip time), then candidates.
    val isoPrefix = try_to_date(substring(s, 1, 10), "yyyy-MM-dd")
    coalesce((isoPrefix +: dateFormats.map(f => try_to_date(s, f))): _*)
  }

  /** Datetime coercion: ISO-8601, naive values assumed UTC (session TZ
    * is pinned to UTC — build.sbt / SparkSession config).
    */
  def asTimestamp(c: Column): Column = c.try_cast(TimestampType)

  /** Coerce by the 5-type vocabulary name used in mapping specs. */
  def coerce(c: Column, typeName: String): Column = typeName match {
    case "string"   => asString(c)
    case "date"     => asDate(c)
    case "datetime" => asTimestamp(c)
    case "int"      => asInt(c)
    case "decimal"  => asDecimal(c)
    case other      => throw new IllegalArgumentException(s"unknown mapping type: $other")
  }

  /** Statically-typed coercion: when the input column's declared type
    * makes the defensive string bridge a PROVABLE identity, emit the
    * direct form instead. Each short-circuit below is value-identical to
    * the bridge for every input including null:
    *   - date←DateType: `cast(date as string)` is `yyyy-MM-dd`, which the
    *     bridge's first (ISO-prefix) parser maps straight back.
    *   - datetime←TimestampType / string←StringType: the bridge is a
    *     self-cast.
    *   - int←IntegerType: int → repr → double → long is exact for every
    *     32-bit value; `cast(int as bigint)` is the same function.
    *   - int←LongType: identity (the parse kernel's long→double hop is
    *     only exact below 2^53 — the direct form is, if anything, more
    *     faithful; the reference's own `int(float(x))` has the same hop).
    *   - decimal←DoubleType: `Double.toString` round-trips to the exact
    *     same double (shortest-repr), and Spark's double→decimal cast is
    *     `BigDecimal.valueOf` = `new BigDecimal(Double.toString(d))` —
    *     the bridge and the direct cast are the same computation.
    *
    * Why this matters: the mapping layer sits directly on typed engine
    * aggregates in the e2e pipelines, and the bridge's 6-format date
    * parse + per-measure regex/try_cast chains, FUSED into the
    * aggregate's whole-stage-codegen output function, overran janino's
    * limits — the stage (decimal aggregation included) silently fell
    * back to interpreted execution, an ~8× slowdown on e12. Typed
    * inputs now compile to plain casts; stringly sources (CSV, XMLA
    * cell text) keep the full defensive kernel.
    */
  def coerceTyped(c: Column, typeName: String, inputType: Option[DataType]): Column =
    (typeName, inputType) match {
      case ("date", Some(DateType)) => c
      case ("datetime", Some(TimestampType)) => c
      case ("string", Some(StringType)) => c
      case ("int", Some(IntegerType)) => c.cast(LongType)
      case ("int", Some(LongType)) => c
      case ("decimal", Some(DoubleType)) => c.cast(DecimalType(18, 2))
      case _ => coerce(c, typeName)
    }

  /** HH:MM normalization (load_store_hours.py:33-61):
    *   100 → "01:00", 1100 → "11:00", "9:30" → "09:30", "11:00" stays.
    * Input may be int-like (minutes-free HHMM) or already HH:MM text.
    */
  def asHhmm(c: Column): Column = {
    val s = trim(c.cast(StringType))
    val numeric = s.rlike("^[0-9]{1,4}$")
    val padded = lpad(s, 4, "0")
    val fromInt = concat_ws(":", substring(padded, 1, 2), substring(padded, 3, 2))
    val fromText = concat_ws(":",
      lpad(split(s, ":").getItem(0), 2, "0"),
      lpad(split(s, ":").getItem(1), 2, "0"))
    when(s.isNull || s === "", lit(null))
      .when(numeric, fromInt)
      .when(s.contains(":"), fromText)
      .otherwise(lit(null))
  }
}
