package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.xml.Elem

/** A8 — Excel (.xlsx) scan with the reference's semantics
  * (`/root/reference/load_store_hours.py:64-108`): named sheet, first
  * row is the header, rows with an empty first cell are skipped, and
  * every value surfaces as a string for the mapping layer to coerce
  * (HH:MM cells via `Coercions.asHhmm` — the same two-stage schema as
  * the CSV path).
  *
  * xlsx is a zip of XML parts; this reads it with `java.util.zip` +
  * scala-xml — no external Excel codec. Decoded parts: workbook sheet
  * registry (+ its relationships for the sheet target), the shared
  * string table, and the sheet's cell matrix (`A1`-style references →
  * dense rows; `t="s"` shared strings, `t="inlineStr"` inline, numeric
  * otherwise, integral floats normalized to int strings like openpyxl's
  * `data_only` values).
  *
  * Excel files are master data (store hours: stores × 7 rows) — a
  * driver-side parse that broadcast-joins downstream, never a fact
  * path. Fact-scale inputs come through parquet/CSV partitioned scans.
  */
object ExcelSource {

  private val RelNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** Column letters of an `A1`-style ref → 0-based index. */
  private[graft] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  /** Integral floats ("930.0") normalize to int strings ("930") — what
    * openpyxl's data_only values look like to the reference's
    * `convert_time_to_hhmm`.
    */
  private def normalizeNumeric(v: String): String =
    if (v.matches("-?\\d+\\.0+")) v.substring(0, v.indexOf('.')) else v

  /** Raw sheet rows: one Seq per row, None for missing cells, padded to
    * the widest populated column.
    */
  def readRows(path: String, sheetName: String): Seq[Seq[Option[String]]] = {
    val zf = new java.util.zip.ZipFile(path)
    // xlsx parts are USER-SUPPLIED zip entries: parse through SecureXml
    // (DOCTYPE/XXE rejected loudly) behind a decompression cap — the zip
    // header's size field is attacker-controlled, so bytes are counted
    // as read. Entries are looked up by NAME inside the archive and
    // never extracted to disk, so a `../`-bearing rels target can only
    // miss (→ "missing sheet part"), never traverse the filesystem.
    val partCap = sys.props.get("graft.xlsx.maxPartBytes").map(_.toLong)
      .getOrElse(64L * 1024 * 1024)
    try {
      def part(name: String): Option[Elem] =
        Option(zf.getEntry(name)).map { e =>
          val in = new SecureXml.BoundedInputStream(
            zf.getInputStream(e), partCap, s"$path!$name")
          try SecureXml.load(in, s"$path!$name") finally in.close()
        }
      val wb = part("xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: not an xlsx (no workbook part)"))
      val rels = part("xl/_rels/workbook.xml.rels")
        .map(r => (r \ "Relationship")
          .map(n => (n \ "@Id").text -> (n \ "@Target").text).toMap)
        .getOrElse(Map.empty)
      val sheetRid = (wb \ "sheets" \ "sheet")
        .find(s => (s \ "@name").text == sheetName)
        .map(_.attribute(RelNs, "id").map(_.text).getOrElse(""))
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no sheet named '$sheetName' (have: ${(wb \ "sheets" \ "sheet").map(s => (s \ "@name").text).mkString(", ")})"))
      val target = rels.getOrElse(sheetRid, "worksheets/sheet1.xml")
      val sheetPath = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      val shared: IndexedSeq[String] = part("xl/sharedStrings.xml")
        .map(sst => (sst \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq)
        .getOrElse(IndexedSeq.empty)
      val sheet = part(sheetPath)
        .getOrElse(throw new IllegalArgumentException(s"$path: missing sheet part $sheetPath"))
      val rows = (sheet \ "sheetData" \ "row").map { row =>
        val cells = (row \ "c").flatMap { c =>
          val idx = colIndex((c \ "@r").text)
          val t = (c \ "@t").text
          val v = (c \ "v").text
          val value = t match {
            case "s" => Some(shared(v.toInt))
            case "inlineStr" => Some((c \ "is" \\ "t").map(_.text).mkString)
            case "b" => Some(if (v == "1") "TRUE" else "FALSE")
            case _ => if (v.isEmpty) None else Some(normalizeNumeric(v))
          }
          value.map(idx -> _)
        }.toMap
        val width = if (cells.isEmpty) 0 else cells.keys.max + 1
        (0 until width).map(cells.get)
      }
      val width = if (rows.isEmpty) 0 else rows.map(_.size).max
      rows.map(r => r.padTo(width, None)).toSeq
    } finally zf.close()
  }

  /** Header-keyed DataFrame of a sheet: first row = column names, rows
    * with an empty first cell skipped (`load_store_hours.py:80-84`),
    * everything StringType until the mapping coerces.
    */
  def read(spark: SparkSession, path: String, sheetName: String): DataFrame = {
    val rows = readRows(path, sheetName)
    require(rows.nonEmpty, s"$path!$sheetName: empty sheet")
    val header = rows.head.zipWithIndex.map { case (h, i) => h.getOrElse(s"_c$i") }
    val data = rows.tail.filter(_.headOption.flatten.exists(_.nonEmpty))
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val rowSeq = data.map(r => Row.fromSeq(header.indices.map(i => r.lift(i).flatten.orNull)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rowSeq.asJava, schema)
  }

  /** Minimal xlsx writer — a test/differential fixture so the reader can
    * be exercised end-to-end without binary test assets (the reference
    * only ever READS Excel). Digit-only values are written as numbers
    * (how Excel stores the reference's HHMM time cells), everything
    * else as inline strings.
    */
  def writeXlsx(path: String, sheetName: String, rows: Seq[Seq[String]]): Unit = {
    def colLetters(i: Int): String = {
      @annotation.tailrec
      def loop(n: Int, acc: String): String =
        if (n < 0) acc else loop(n / 26 - 1, ('A' + n % 26).toChar.toString + acc)
      loop(i, "")
    }
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sheetXml = {
      val rowsXml = rows.zipWithIndex.map { case (r, ri) =>
        val cells = r.zipWithIndex.map { case (v, ci) =>
          val ref = s"${colLetters(ci)}${ri + 1}"
          if (v.matches("-?\\d+(\\.\\d+)?"))
            s"""<c r="$ref"><v>$v</v></c>"""
          else
            s"""<c r="$ref" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cells</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowsXml</sheetData></worksheet>""".stripMargin
    }
    val workbookXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="$RelNs">
         |<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val relsXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val rootRelsXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin
    val out = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try {
      Seq(
        "[Content_Types].xml" -> contentTypes,
        "_rels/.rels" -> rootRelsXml,
        "xl/workbook.xml" -> workbookXml,
        "xl/_rels/workbook.xml.rels" -> relsXml,
        "xl/worksheets/sheet1.xml" -> sheetXml).foreach { case (name, content) =>
        out.putNextEntry(new java.util.zip.ZipEntry(name))
        out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.closeEntry()
      }
    } finally out.close()
  }
}
