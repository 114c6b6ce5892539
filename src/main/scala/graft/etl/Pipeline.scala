package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Coercions, Keys}

/** Declarative pipeline spec → DataFrame plan compiler.
  *
  * This is the Spark-native equivalent of the reference's mapping layer:
  * a `PipelineDefinition` (`/root/reference/modules/pipeline_config.py:10-17`)
  * plus a mapping YAML (`pipelines/mappings/daily_sales.yaml`) applied by
  * `transform_df_to_records` (`modules/pipeline_runner.py:133-229`). Where
  * the reference loops rows in pandas building dicts, the compiled form is
  * a single `select` projection — narrow, codegen'd, zero shuffles — so
  * the same spec scales from the 60k-row test tables to a 100 TB fact.
  *
  * Stages compiled, in reference order (SURVEY.md §2.B):
  *   B4 drop 'All' cube-aggregate rows → B3 required-dim null filter →
  *   B1/B2 typed projection via the 5-type vocabulary → B9 default fill →
  *   B6 business key → B7 display name → B8 metadata stamp.
  */
final case class FieldSpec(
    src: String,
    dst: String,
    typ: String,
    default: Option[String] = None)

final case class PipelineSpec(
    name: String,
    fields: Seq[FieldSpec],
    measures: Seq[FieldSpec],
    /** dst names of dims that must be non-null (B3). */
    requiredDims: Seq[String] = Nil,
    /** src names checked for the 'All' cube artifact rows (B4). */
    dropAllOn: Seq[String] = Nil,
    /** dst names composed into the business key, in order (B6). */
    keyComponents: Seq[String] = Nil,
    /** dst names composed into the display name (B7). */
    displayComponents: Seq[String] = Nil,
    datasource: Option[String] = None)

object Pipeline {

  /** Compile the spec against a raw extract frame. `refreshedAt` defaults
    * to `current_timestamp()` (B8); pass a literal for reproducible runs
    * (and differential tests).
    */
  def compile(
      spec: PipelineSpec,
      raw: DataFrame,
      refreshedAt: Option[Column] = None): DataFrame = {

    // null-safe compare: a null dim must NOT trip the 'All' filter (it
    // would make the OR-chain NULL and silently drop the row — nulls are
    // the required-dims filter's job, not this one's)
    val noAll =
      if (spec.dropAllOn.isEmpty) raw
      else raw.filter(!spec.dropAllOn.map(c => col(c) <=> "All").reduce(_ || _))

    // the compiler knows each source column's static type: when the
    // extract is already typed (engine aggregates), the defensive
    // string-parse kernel compiles down to a plain cast (provable
    // identity — see Coercions.coerceTyped), keeping the fused codegen
    // function small; stringly extracts (CSV/XMLA text) keep the full
    // kernel
    val srcTypes = noAll.schema.fields.map(f => f.name -> f.dataType).toMap
    val projected = noAll.select(
      (spec.fields ++ spec.measures).map { f =>
        val coerced = Coercions.coerceTyped(col(f.src), f.typ, srcTypes.get(f.src))
        val withDefault = f.default match {
          case Some(d) => coalesce(coerced, Coercions.coerce(lit(d), f.typ))
          case None => coerced
        }
        withDefault.as(f.dst)
      }: _*)

    val filtered =
      if (spec.requiredDims.isEmpty) projected
      else projected.filter(spec.requiredDims.map(col(_).isNotNull).reduce(_ && _))

    val keyed =
      if (spec.keyComponents.isEmpty) filtered
      else {
        val typeOf = (spec.fields ++ spec.measures).map(f => f.dst -> f.typ).toMap
        val comps = spec.keyComponents.map { c =>
          if (typeOf.get(c).exists(t => t == "date" || t == "datetime"))
            Keys.dateComponent(col(c))
          else col(c)
        }
        filtered.withColumn("business_key", Keys.businessKey(comps: _*))
      }

    val named =
      if (spec.displayComponents.isEmpty) keyed
      else keyed.withColumn("display_name",
        Keys.displayName(spec.displayComponents.map(col): _*))

    spec.datasource match {
      case Some(ds) =>
        named.withColumn("datasource", lit(ds))
          .withColumn("lastrefreshed", refreshedAt.getOrElse(current_timestamp()))
      case None => named
    }
  }
}
