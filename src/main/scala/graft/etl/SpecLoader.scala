package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** YAML pipeline-spec loader — the engine's form of the reference's
  * config layer (`/root/reference/modules/pipeline_config.py:41-87`,
  * the mapping YAMLs under `pipelines/mappings/`): declarative specs
  * on disk compile to DataFrame plans via graft.etl.Pipeline.
  *
  * Spec shape (all sections optional except name/fields/measures):
  * {{{
  * name: daily_sales
  * fields:
  *   - {src: StoreNumber, dst: store, type: string}
  *   - {src: CalendarDate, dst: cal_date, type: date}
  * measures:
  *   - {src: "TY Net Sales USD", dst: net_sales, type: decimal, default: "0"}
  * required_dims: [store, cal_date]
  * drop_all_on: [StoreNumber]
  * key_components: [store, cal_date]
  * display_components: [store, cal_date]
  * datasource: daily_sales
  * }}}
  */
object SpecLoader {

  private val mapper = new ObjectMapper(new YAMLFactory())

  def parse(yaml: String): PipelineSpec = {
    val root = mapper.readTree(yaml)
    def strSeq(field: String): Seq[String] =
      Option(root.get(field)).map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    def fieldSpecs(field: String): Seq[FieldSpec] =
      Option(root.get(field)).map(_.elements().asScala.map { n =>
        FieldSpec(
          src = n.get("src").asText(),
          dst = n.get("dst").asText(),
          typ = n.get("type").asText(),
          default = Option(n.get("default")).map(_.asText()))
      }.toSeq).getOrElse(Nil)
    val name = Option(root.get("name")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException("spec needs a name"))
    PipelineSpec(
      name = name,
      fields = fieldSpecs("fields"),
      measures = fieldSpecs("measures"),
      requiredDims = strSeq("required_dims"),
      dropAllOn = strSeq("drop_all_on"),
      keyComponents = strSeq("key_components"),
      displayComponents = strSeq("display_components"),
      datasource = Option(root.get("datasource")).map(_.asText()))
  }

  def load(path: String): PipelineSpec =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** Load one of the shipped reference pipeline specs from the classpath
    * (`src/main/resources/pipelines/<name>.yaml`).
    */
  def fromResource(name: String): PipelineSpec = {
    val in = getClass.getResourceAsStream(s"/pipelines/$name.yaml")
    require(in != null, s"no pipeline resource: $name")
    try parse(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
}
