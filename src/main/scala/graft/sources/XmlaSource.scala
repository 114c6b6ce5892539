package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import scala.util.matching.Regex

/** XMLA mddataset source — the full decode path of the reference's cube
  * extraction (`/root/reference/modules/olap.py:48-160` and
  * `modules/generic_xmla_parser.py:28-170`), operating on the actual
  * wire format:
  *
  *   Axis0 tuples  → measure captions (column order)
  *   Axis1 tuples  → dimension member tuples (one output row each)
  *   CellData      → sparse cells addressed by
  *                   CellOrdinal = row_idx * n_measures + col_idx
  *
  * Dimension columns are named by regex config exactly like the
  * reference (`generic_xmla_parser.py:28-62`, `pipelines.yaml:13-17`):
  * first pattern matching the member's hierarchy unique name wins, with
  * fall-through to a cleaned hierarchy name on no match
  * (`generic_xmla_parser.py:123-126`).
  *
  * Scale shape: ONE response is parsed driver-side (a cube response is
  * bounded by the cube's cell limits — the reference chunks queries per
  * fiscal year/period for exactly this reason, SURVEY.md §2.C2). The
  * engine parallelizes across slicer chunks: each (slicer, xml) pair
  * becomes one task's parse, and the decoded frames union — chunking
  * becomes connector input-partitioning, never a driver bottleneck.
  */
object XmlaSource {

  /** hierarchy-unique-name regex → output column (first match wins). */
  final case class DimMapping(pattern: String, field: String)

  final case class Parsed(
      measures: Seq[String],
      tuples: Seq[Seq[(String, String)]], // per row: (field, caption)
      cells: Seq[(Long, String)])

  /** Parse the mddataset XML (namespace-agnostic, like the reference's
    * `{urn:...mddataset}`-qualified lookups). The response comes from a
    * REMOTE server, so it parses through [[SecureXml]]: a
    * DOCTYPE-bearing or malformed response fails loudly instead of
    * resolving entities (XXE/entity-bomb surface).
    */
  def parse(xml: String, dims: Seq[DimMapping]): Parsed = {
    val root = SecureXml.loadString(xml, "xmla response")
    val axes = (root \\ "Axis")
    def tuplesOf(axisName: String) =
      axes.filter(a => (a \ "@name").text == axisName).flatMap(_ \\ "Tuple")

    val measures = tuplesOf("Axis0").map(t => ((t \\ "Member").head \ "Caption").text)

    val compiled = dims.map(d => new Regex(d.pattern) -> d.field)
    def fieldFor(hierarchy: String): String =
      compiled.collectFirst { case (r, f) if r.findFirstIn(hierarchy).isDefined => f }
        .getOrElse(hierarchy.replaceAll("[\\[\\]\\.]", "_").replaceAll("_+", "_").stripSuffix("_").stripPrefix("_"))

    val tuples = tuplesOf("Axis1").map { t =>
      (t \\ "Member").map { m =>
        val hierarchy = (m \ "@Hierarchy").text
        fieldFor(hierarchy) -> (m \ "Caption").text
      }.toSeq
    }.toSeq

    val cells = (root \\ "Cell").map { c =>
      ((c \ "@CellOrdinal").text.toLong, (c \ "Value").text)
    }.toSeq

    Parsed(measures.toSeq, tuples, cells)
  }

  /** Parse + decode into a flat DataFrame: dim columns (strings, from
    * the regex mapping) + one string column per Axis0 measure. Values
    * stay strings for the mapping layer to coerce (SURVEY.md §1.3's
    * two-stage schema).
    */
  def read(spark: SparkSession, xml: String, dims: Seq[DimMapping]): DataFrame = {
    val parsed = parse(xml, dims)
    val dimFields: Seq[String] =
      parsed.tuples.headOption.map(_.map(_._1)).getOrElse(Nil)
    require(parsed.tuples.forall(_.map(_._1) == dimFields),
      "mddataset axis tuples must share one hierarchy list")

    import scala.jdk.CollectionConverters._
    val tupleSchema = StructType(
      StructField("row_idx", LongType) +: dimFields.map(StructField(_, StringType)))
    val tupleRows = parsed.tuples.zipWithIndex.map { case (t, i) =>
      Row.fromSeq(i.toLong +: t.map(_._2))
    }
    val tuplesDf = spark.createDataFrame(tupleRows.asJava, tupleSchema)

    val cellSchema = StructType(Seq(
      StructField("ordinal", LongType), StructField("value", StringType)))
    val cellRows = parsed.cells.map { case (o, v) => Row(o, v) }
    val cellsDf = spark.createDataFrame(cellRows.asJava, cellSchema)

    Mddataset.decode(cellsDf, parsed.measures, Some(tuplesDf)).drop("row_idx")
  }
}
