package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.catalyst.FiscalMath
import graft.functions.{Coercions, Keys}

/** Property tests for the pure kernels (SURVEY.md §5 point 3): coercion
  * B2, business keys B6, 13-4 calendar G5 — the rules whose exactness
  * the MERGE identity and TY/LY alignment depend on. ScalaCheck
  * generators drive the cases (sampled manually — the scalatest bridge
  * artifact isn't in the offline cache); seeds are fixed so failures
  * reproduce.
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.session

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("fiscal period/week stay in range and are consistent") {
    for (epochDay <- samples(Gen.choose(-20000, 40000), 500)) {
      val p = FiscalMath.fiscalPeriod(epochDay)
      val w = FiscalMath.fiscalWeek(epochDay)
      assert(p >= 1 && p <= 13, s"day $epochDay period $p")
      assert(w >= 1 && w <= 53, s"day $epochDay week $w")
      // a period holds exactly weeks 4p-3..4p (weeks past 52 fold into P13)
      assert(p == math.min(13, (w - 1) / 4 + 1), s"day $epochDay p=$p w=$w")
    }
  }

  // --- hostile-input XML fixtures (A1/A8 hardening) ------------------
  // Both XML surfaces take UNTRUSTED bytes (a remote XMLA server's
  // response, a user-supplied xlsx). The secure loader must reject
  // DOCTYPE (entity bombs, XXE/SSRF) and malformed input LOUDLY, never
  // resolve an entity, and keep parsing legitimate documents unchanged.

  private val billionLaughs =
    """<?xml version="1.0"?>
      |<!DOCTYPE lolz [
      | <!ENTITY lol "lol">
      | <!ENTITY lol2 "&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;">
      | <!ENTITY lol3 "&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;">
      |]>
      |<root name="Axis0">&lol3;</root>""".stripMargin

  private val xxeProbe =
    """<?xml version="1.0"?>
      |<!DOCTYPE r [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
      |<root>&xxe;</root>""".stripMargin

  test("xmla parse rejects DOCTYPE (entity bomb, XXE) and malformed responses loudly") {
    for (hostile <- Seq(billionLaughs, xxeProbe)) {
      val e = intercept[IllegalArgumentException](
        graft.sources.XmlaSource.parse(hostile, Nil))
      assert(e.getMessage.contains("rejected hostile or malformed XML"), e.getMessage)
      assert(e.getMessage.contains("DOCTYPE"), e.getMessage)
    }
    val e = intercept[IllegalArgumentException](
      graft.sources.XmlaSource.parse("<root><unclosed></root>", Nil))
    assert(e.getMessage.contains("rejected hostile or malformed XML"), e.getMessage)
    // and a legitimate (DOCTYPE-free) document still parses unchanged
    val ok = graft.sources.XmlaSource.parse(
      """<root><Axes><Axis name="Axis0"><Tuple><Member Hierarchy="[M]">
        |<Caption>Net</Caption></Member></Tuple></Axis></Axes></root>""".stripMargin, Nil)
    assert(ok.measures == Seq("Net"))
  }

  private def writeZip(path: String, entries: (String, String)*): Unit = {
    val out = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try entries.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }

  test("xlsx parts: DOCTYPE rejected, decompression bomb capped, traversal targets just miss") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-hostile").toString
    val doctype = s"$dir/doctype.xlsx"
    writeZip(doctype, "xl/workbook.xml" ->
      """<?xml version="1.0"?><!DOCTYPE w [<!ENTITY e "x">]><workbook/>""")
    val e1 = intercept[IllegalArgumentException](
      graft.sources.ExcelSource.readRows(doctype, "Sheet1"))
    assert(e1.getMessage.contains("rejected hostile or malformed XML"), e1.getMessage)

    // oversize part: the cap counts bytes actually read, not the
    // attacker-controlled header size (sys-prop'd down so the fixture
    // stays tiny); a legitimate small file parses fine under the cap
    val bomb = s"$dir/bomb.xlsx"
    writeZip(bomb, "xl/workbook.xml" ->
      s"""<?xml version="1.0"?><workbook><sheets><sheet name="P">${"x" * 50000}</sheet></sheets></workbook>""")
    System.setProperty("graft.xlsx.maxPartBytes", "10000")
    try {
      val e2 = intercept[IllegalArgumentException](
        graft.sources.ExcelSource.readRows(bomb, "Sheet1"))
      assert(e2.getMessage.contains("zip-bomb guard"), e2.getMessage)
    } finally System.clearProperty("graft.xlsx.maxPartBytes")

    // a rels target that points outside the archive can only MISS (zip
    // entries are looked up by literal name, never extracted): loud
    // missing-part error, no filesystem traversal
    val traverse = s"$dir/traverse.xlsx"
    writeZip(traverse,
      "xl/workbook.xml" ->
        """<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships><Relationship Id="rId1" Target="../../../../etc/passwd"/></Relationships>""")
    val e3 = intercept[IllegalArgumentException](
      graft.sources.ExcelSource.readRows(traverse, "S"))
    assert(e3.getMessage.contains("missing sheet part"), e3.getMessage)

    // and a legitimate xlsx (writer fixture) still round-trips
    val good = s"$dir/good.xlsx"
    graft.sources.ExcelSource.writeXlsx(good, "Hours",
      Seq(Seq("store", "open"), Seq("7", "0930")))
    assert(graft.sources.ExcelSource.readRows(good, "Hours").size == 2)
  }

  test("asInt == comma-stripped int(float(x)) for arbitrary numerics") {
    import spark.implicits._
    val ds = samples(Gen.choose(-1e12, 1e12), 40)
    val raws = ds.map(d => f"$d%,.3f") // thousands separators + decimals
    val got = raws.toDF("x").select(Coercions.asInt(col("x"))).as[Long].collect()
    ds.zip(got).foreach { case (d, g) =>
      assert(g == d.toLong, s"$d -> $g")
    }
  }

  test("business keys are deterministic and never contain spaces or hyphens") {
    import spark.implicits._
    val comp = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("a b-c"), Gen.const(""), Gen.const(" x "))
    val pairs = samples(Gen.zip(comp, comp), 40)
    val out = (pairs ++ pairs).toDF("a", "b")
      .select(Keys.businessKey(col("a"), col("b")).as("k"))
      .as[String].collect()
    val (first, second) = out.splitAt(pairs.size)
    assert(first.toSeq == second.toSeq) // deterministic
    first.foreach { k =>
      assert(!k.contains(" ") && !k.contains("-"), k)
    }
  }

  test("anchored calendar: 52/53-week years, no gaps, week-aligned starts") {
    import spark.implicits._
    import graft.cube.FiscalCalendar._
    // every day over two decades, classified by the anchored calendar
    val dim = spark.sql(
      "SELECT explode(sequence(to_date('1990-01-15'), to_date('2010-12-15'), interval 1 day)) AS d")
      .select(col("d"),
        fiscalYearAnchored(col("d")).as("fy"),
        fiscalWeekAnchored(col("d")).as("fw"),
        fiscalPeriodAnchored(col("d")).as("fp"))
    val perYear = dim.groupBy("fy")
      .agg(count(lit(1)).as("days"), max(col("fw")).as("max_week"),
        min(col("fw")).as("min_week"), max(col("fp")).as("max_period"),
        min(col("d")).as("first_day"), max(col("d")).as("last_day"))
      .orderBy("fy")
      .collect()
    // interior years only (range edges truncate the first/last year)
    val interior = perYear.drop(1).dropRight(1)
    assert(interior.nonEmpty)
    interior.foreach { r =>
      val days = r.getAs[Long]("days")
      val maxW = r.getAs[Int]("max_week")
      assert(days == 364 || days == 371, s"fy=${r.get(0)} days=$days")
      assert(r.getAs[Int]("min_week") == 1)
      // week 53 exists exactly in 371-day years — no folding
      assert(maxW == (if (days == 371) 53 else 52), s"fy=${r.get(0)}")
      assert(r.getAs[Int]("max_period") == 13)
      // anchor is a Sunday (week-aligned start)
      assert(java.time.LocalDate.parse(r.getAs[java.sql.Date]("first_day").toString)
        .getDayOfWeek == java.time.DayOfWeek.SUNDAY)
    }
    // continuity: consecutive fiscal years tile the calendar exactly
    interior.sliding(2).foreach { case Array(a, b) =>
      val lastA = a.getAs[java.sql.Date]("last_day").toLocalDate
      val firstB = b.getAs[java.sql.Date]("first_day").toLocalDate
      assert(firstB == lastA.plusDays(1), s"gap between fy ${a.get(0)} and ${b.get(0)}")
    }
    // every week inside a fiscal year has exactly 7 days
    val weekSizes = dim.groupBy("fy", "fw").count()
      .join(dim.groupBy("fy").agg(count(lit(1)).as("ydays")), "fy")
      .filter(col("ydays") >= 364) // interior years
      .select("count").distinct().as[Long].collect().toSet
    assert(weekSizes == Set(7L))
  }

  test("asDate normalizes every supported format to the same day") {
    import spark.implicits._
    for (d <- samples(Gen.choose(0, 25000), 40)) { // 1970..2038
      val ld = java.time.LocalDate.ofEpochDay(d.toLong)
      val variants = Seq(
        ld.toString, // ISO
        s"${ld.getMonthValue}/${ld.getDayOfMonth}/${ld.getYear}",
        f"${ld.getMonthValue}%02d/${ld.getDayOfMonth}%02d/${ld.getYear}",
        ld.toString + " 13:14:15")
      val parsed = variants.toDF("x")
        .select(Coercions.asDate(col("x")).cast("string")).as[String].collect()
      assert(parsed.forall(_ == ld.toString), s"$variants -> ${parsed.toSeq}")
    }
  }

  test("media byte kernels never throw on arbitrary bytes (codegen safety fuzz)") {
    // these kernels execute INSIDE whole-stage codegen, where an
    // uncaught exception kills the task (and with ANSI semantics, the
    // query) — any malformed payload must come back as the kernel's
    // reject value (0 / empty / null), never an
    // ArrayIndexOutOfBounds/Negative-size throw. Three byte regimes:
    // pure noise, noise behind valid magic (forces the parsers past
    // their header checks), and truncations of VALID fixtures (every
    // prefix length of real encoder output).
    import graft.multimodal.{JpegMath, Mp4Math, Multimodal, PngMath, WavMath}
    def kernels(b: Array[Byte]): Unit = {
      WavMath.sumSq(b)
      WavMath.frameStats(b, 25)
      PngMath.resizeStats(b, 2)
      JpegMath.sof(b)
      Mp4Math.meta(b)
    }
    val noise = for {
      n <- Gen.choose(0, 300)
      bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bytes.toArray
    samples(noise, 300).foreach(kernels)
    val riff = "RIFF".getBytes; val wave = "WAVE".getBytes
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val soi = Array(0xFF, 0xD8).map(_.toByte)
    samples(noise, 300).foreach { tail =>
      kernels(riff ++ tail)
      kernels(riff ++ Array.fill[Byte](4)(0) ++ wave ++ tail)
      kernels(pngSig ++ tail)
      kernels(soi ++ tail)
    }
    for (id <- Seq(0L, 3L, 7L, 10L);
         fix <- Seq(Multimodal.wavFixture(id), Multimodal.pngFixture(id),
           Multimodal.jpegFixture(id), Multimodal.mp4Fixture(id));
         n <- 0 to fix.length) {
      kernels(fix.take(n))
    }
    // and single-byte corruptions of each valid fixture
    for (fix <- Seq(Multimodal.wavFixture(1L), Multimodal.pngFixture(1L),
           Multimodal.jpegFixture(1L), Multimodal.mp4Fixture(1L));
         i <- fix.indices) {
      val c = fix.clone(); c(i) = (c(i) ^ 0xFF).toByte
      kernels(c)
    }
  }
}
