package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark plan plus (when SQL-expressible) the exact
  * DuckDB oracle the driver replays on the same parquet tables. Column
  * names/aliases MUST match between the two (driver sorts columns by name
  * before hashing).
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Central registry; sections live in their own files. */
object Queries {
  def all: Seq[QueryDef] =
    CubeQueries.all ++ EtlQueries.all ++ SourceQueries.all ++
      PipelineQueries.all ++ DedupQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ StreamQueries.all ++ MultimodalQueries.all

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
