package graft.sinks

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import graft.etl.{FieldSpec, PipelineSpec}

/** D6 wire-level DDL — the engine's form of the reference's per-table
  * creation scripts (`/root/reference/dataverse_table_creation/
  * create_oarsbidata_table.py:58-328`, `add_business_key_column.py:
  * 84-185`): instead of five near-identical hardcoded scripts, the
  * EntityMetadata / AttributeMetadata / EntityKeyMetadata JSON is
  * GENERATED from the shipped pipeline spec, one attribute per mapped
  * field/measure by the 5-type vocabulary (SURVEY.md §1.2):
  *
  *   string   → StringAttributeMetadata (MaxLength)
  *   date     → DateTimeAttributeMetadata Format=DateOnly
  *   datetime → DateTimeAttributeMetadata Format=DateAndTime
  *   int      → IntegerAttributeMetadata ±2^31
  *   decimal  → DecimalAttributeMetadata Precision=2, ±1e11
  *
  * plus the business-key column (String 50) and its alternate key —
  * the MERGE identity the batch uploader addresses rows by.
  *
  * Driver-side control-plane I/O (a handful of POSTs per table, ever);
  * mock-verified in `DdlSpec`.
  */
object DataverseDdl {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Microsoft.Dynamics.CRM.Label JSON (1033 = en-US, as the reference). */
  def label(text: String): String =
    s"""{"@odata.type":"Microsoft.Dynamics.CRM.Label","LocalizedLabels":[{"@odata.type":"Microsoft.Dynamics.CRM.LocalizedLabel","Label":"${esc(text)}","LanguageCode":1033}]}"""

  private val requiredNone =
    """"RequiredLevel":{"Value":"None","CanBeChanged":true,"ManagedPropertyLogicalName":"canmodifyrequirementlevelsettings"}"""

  /** One AttributeMetadata JSON for a mapped column, by type vocabulary. */
  def attributeJson(prefix: String, f: FieldSpec, maxLength: Int = 100): String = {
    val schema = s"${prefix}_${f.dst}"
    val display = label(f.src)
    f.typ match {
      case "string" =>
        s"""{"@odata.type":"Microsoft.Dynamics.CRM.StringAttributeMetadata","SchemaName":"${esc(schema)}","DisplayName":$display,"AttributeType":"String","AttributeTypeName":{"Value":"StringType"},"MaxLength":$maxLength,$requiredNone}"""
      case "date" | "datetime" =>
        val fmt = if (f.typ == "date") "DateOnly" else "DateAndTime"
        s"""{"@odata.type":"Microsoft.Dynamics.CRM.DateTimeAttributeMetadata","SchemaName":"${esc(schema)}","DisplayName":$display,"AttributeType":"DateTime","AttributeTypeName":{"Value":"DateTimeType"},"Format":"$fmt",$requiredNone}"""
      case "int" =>
        s"""{"@odata.type":"Microsoft.Dynamics.CRM.IntegerAttributeMetadata","SchemaName":"${esc(schema)}","DisplayName":$display,"AttributeType":"Integer","AttributeTypeName":{"Value":"IntegerType"},"MinValue":-2147483648,"MaxValue":2147483647,$requiredNone}"""
      case "decimal" =>
        s"""{"@odata.type":"Microsoft.Dynamics.CRM.DecimalAttributeMetadata","SchemaName":"${esc(schema)}","DisplayName":$display,"AttributeType":"Decimal","AttributeTypeName":{"Value":"DecimalType"},"Precision":2,"MinValue":-100000000000.0,"MaxValue":100000000000.0,$requiredNone}"""
      case other => sys.error(s"unknown mapping type for DDL: $other")
    }
  }

  /** Business-key column (String 50) — `add_business_key_column.py:84-118`. */
  def businessKeyColumnJson(prefix: String): String =
    s"""{"@odata.type":"Microsoft.Dynamics.CRM.StringAttributeMetadata","SchemaName":"${prefix}_businesskey","DisplayName":${label("Business Key")},"AttributeType":"String","AttributeTypeName":{"Value":"StringType"},"MaxLength":50,"FormatName":{"Value":"Text"},$requiredNone}"""

  /** Alternate key on the business-key column — the PATCH-by-key MERGE
    * identity (`add_business_key_column.py:160-176`).
    */
  def alternateKeyJson(prefix: String): String =
    s"""{"SchemaName":"${prefix}_businesskey_key","DisplayName":${label("Business Key")},"KeyAttributes":["${prefix}_businesskey"]}"""

  /** EntityMetadata with the primary-name attribute —
    * `create_oarsbidata_table.py:69-142`.
    */
  def entityJson(spec: PipelineSpec, prefix: String): String = {
    val primary =
      s"""{"@odata.type":"Microsoft.Dynamics.CRM.StringAttributeMetadata","SchemaName":"${prefix}_name","IsPrimaryName":true,"RequiredLevel":{"Value":"None","CanBeChanged":true,"ManagedPropertyLogicalName":"canmodifyrequirementlevelsettings"},"MaxLength":100,"FormatName":{"Value":"Text"},"DisplayName":${label("Name")},"Description":${label(s"Primary name for ${spec.name}")}}"""
    s"""{"@odata.type":"Microsoft.Dynamics.CRM.EntityMetadata","Attributes":[$primary],"DisplayName":${label(spec.name)},"DisplayCollectionName":${label(spec.name)},"Description":${label(s"Engine-provisioned table for the ${spec.name} pipeline")},"SchemaName":"${prefix}_${spec.name.replace("_", "")}","HasActivities":false,"HasNotes":false,"IsActivity":false,"OwnershipType":"UserOwned"}"""
  }

  final case class ProvisionResult(entityCreated: Boolean, columnsCreated: Int,
      columnsSkipped: Int, keyCreated: Boolean)

  private def post(url: String, token: String, body: String, timeoutMs: Int): (Int, String) = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestProperty("Authorization", s"Bearer $token")
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setRequestProperty("OData-MaxVersion", "4.0")
      conn.setRequestProperty("OData-Version", "4.0")
      conn.setRequestProperty("Accept", "application/json")
      val out = conn.getOutputStream
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
      val status = conn.getResponseCode
      val in = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val text = if (in == null) ""
        else try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      (status, text)
    } finally conn.disconnect()
  }

  /** Provision the table: entity, one POST per mapped column + the
    * business-key column, then the alternate key. Idempotent like the
    * reference: HTTP 400 with "already exists" counts as skip, not
    * failure.
    */
  def provision(baseUrl: String, token: String, spec: PipelineSpec,
      prefix: String = "crf63", timeoutMs: Int = 60000): ProvisionResult = {
    val api = s"${baseUrl.stripSuffix("/")}/api/data/v9.2"
    val logical = s"${prefix}_${spec.name.replace("_", "")}"
    def ok(s: Int) = s == 200 || s == 201 || s == 204
    def exists(s: Int, body: String) = s == 400 && body.contains("already exists")

    val (es, eb) = post(s"$api/EntityDefinitions", token, entityJson(spec, prefix), timeoutMs)
    if (!ok(es) && !exists(es, eb)) sys.error(s"entity create failed: HTTP $es ${eb.take(200)}")

    val attrUrl = s"$api/EntityDefinitions(LogicalName='$logical')/Attributes"
    val cols = (spec.fields ++ spec.measures).map(attributeJson(prefix, _)) :+
      businessKeyColumnJson(prefix)
    var created = 0; var skipped = 0
    cols.foreach { json =>
      val (s, b) = post(attrUrl, token, json, timeoutMs)
      if (ok(s)) created += 1
      else if (exists(s, b)) skipped += 1
      else sys.error(s"column create failed: HTTP $s ${b.take(200)}")
    }
    val (ks, kb) = post(s"$api/EntityDefinitions(LogicalName='$logical')/Keys",
      token, alternateKeyJson(prefix), timeoutMs)
    if (!ok(ks) && !exists(ks, kb)) sys.error(s"key create failed: HTTP $ks ${kb.take(200)}")
    ProvisionResult(ok(es), created, skipped, ok(ks))
  }
}
