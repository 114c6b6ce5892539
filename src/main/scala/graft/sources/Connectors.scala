package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.annotation.tailrec

/** Source-side connectors (SURVEY.md §2.A).
  *
  * A7 — CSV scan with the reference's semantics (`load_csv.py:131`):
  * header-keyed rows, everything a string until the mapping layer
  * coerces (schema-on-read at ingest, declared schema in the mapping).
  *
  * A9 — paged read: the reference follows `@odata.nextLink` pagination
  * into a dict (`load_store_hours.py:111-138`). Generalized here as a
  * driver-side page loop materializing into a DataFrame. This is for
  * SMALL control-plane reads (existing-key maps, metadata) that then
  * broadcast-join against the fact flow — never for fact data, which
  * must come through a partitioned scan.
  *
  * A10 — MDX/SQL template rendering (`modules/pipeline_config.py:20-34`):
  * substitute ONLY `${var}` placeholders; literal braces (MDX set
  * syntax) must survive untouched.
  */
object Connectors {

  /** A7 — header CSV, all columns strings (coercion happens in the
    * mapping layer, exactly like the reference's two-stage schema).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** A9 — one page of an external paged API. */
  trait PagedFetch extends Serializable {
    /** @return (rows, nextPageToken) — None token ends the loop. */
    def fetch(pageToken: Option[String]): (Seq[Row], Option[String])
  }

  /** A9 — drain a paged source into a DataFrame (driver-side loop,
    * bounded by `maxPages` as a runaway guard).
    */
  def pagedRead(spark: SparkSession, schema: StructType, source: PagedFetch,
      maxPages: Int = 10000): DataFrame = {
    @tailrec
    def loop(token: Option[String], acc: Vector[Row], pages: Int): Vector[Row] = {
      require(pages < maxPages, s"paged read exceeded $maxPages pages")
      val (rows, next) = source.fetch(token)
      val all = acc ++ rows
      next match {
        case Some(_) => loop(next, all, pages + 1)
        case None => all
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(loop(None, Vector.empty, 0).asJava, schema)
  }

  /** A9 at data scale — a page-ADDRESSABLE paged source: page `i` is
    * independently fetchable (OData `$$skip`/`$$top`, page-numbered REST
    * APIs), unlike the nextLink token chain, which is inherently
    * sequential.
    */
  trait PageRangeFetch extends Serializable {
    /** @return the rows of 0-based page `page` (empty when past the end). */
    def fetch(page: Int): Seq[Row]
  }

  /** A9 at data scale — read a page-addressable source as a PARTITIONED
    * scan: the page range is sliced across `partitions` input partitions
    * and each executor slice fetches its own pages, so a large OData
    * read-back lands distributed and can join against fact data without
    * a driver-side materialization (the [[pagedRead]] loop stays the
    * right tool for small control-plane reads that broadcast). Each page
    * is fetched exactly once per scan; re-scanning (two actions over the
    * same frame) re-fetches, as with any external scan — persist the
    * frame if the source isn't idempotent.
    */
  def pagedReadPartitioned(spark: SparkSession, schema: StructType,
      source: PageRangeFetch, numPages: Int, partitions: Int = 0): DataFrame = {
    require(numPages >= 0, s"numPages must be >= 0, got $numPages")
    val slices = math.max(1, if (partitions > 0) partitions
      else math.min(spark.sparkContext.defaultParallelism, numPages))
    val rdd = spark.sparkContext.parallelize(0 until numPages, slices)
      .mapPartitions(_.flatMap(p => source.fetch(p)))
    spark.createDataFrame(rdd, schema)
  }

  private val Placeholder = raw"\$$\{(\w+)\}".r

  /** A10 — render `${var}` placeholders; unknown vars raise, literal
    * braces survive (MDX `{[Measures].[x]}` must not be touched).
    */
  def renderTemplate(template: String, params: Map[String, String]): String =
    Placeholder.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(
        params.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"missing template param: ${m.group(1)}"))))
}
