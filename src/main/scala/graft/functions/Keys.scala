package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Business-key and display-name synthesis — the engine's MERGE identity.
  *
  * Mirrors the reference's key rules (`/root/reference/modules/
  * transformers.py:50-56`, `modules/pipeline_runner.py:212-223`):
  *   - each component is cleaned: spaces and hyphens → `_`
  *   - blank/null dimension values → the literal `Unknown`
  *   - dates render as `yyyyMMdd`
  *   - components join with `_`
  * Determinism of this string is what makes upsert retries idempotent
  * (SURVEY.md §7.5 risk 5), so the cleaning rules are centralized here
  * and property-tested.
  */
object Keys {

  /** Clean one key component: null/blank → "Unknown"; spaces/hyphens → "_". */
  def cleanComponent(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(s.isNull || s === "", lit("Unknown"))
      .otherwise(regexp_replace(s, "[ -]", "_"))
  }

  /** Render a date/timestamp component as yyyyMMdd. */
  def dateComponent(c: Column): Column = date_format(c, "yyyyMMdd")

  /** Compose the business key from pre-rendered components. */
  def businessKey(components: Column*): Column =
    concat_ws("_", components.map(cleanComponent): _*)

  /** Display name, `"{a} - {b} - ..."` (transformers.py:78). */
  def displayName(components: Column*): Column =
    concat_ws(" - ", components.map(c => coalesce(trim(c.cast("string")), lit("Unknown"))): _*)
}
