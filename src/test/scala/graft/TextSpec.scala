package graft

import org.apache.spark.sql.functions._

/** Query-level coverage of the PII scrub pass (t08): detection counts,
  * the deterministic doc_id-keyed augmentation classes, redaction of
  * pre-existing PII in the text itself, and fingerprint sensitivity to
  * the redacted form. Runs the real `TextQueries.t08` plan over a tiny
  * documents.parquet written to a temp dir (the same shape the driver
  * provides), so the exact production plan is what's asserted.
  */
class TextSpec extends SparkSpec {

  private def withDocs[A](rows: Seq[(Long, String)])(f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_textspec").toFile
    try {
      import spark.implicits._
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("src0"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"${dir.getPath}/documents.parquet")
      f(dir.getPath)
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles.foreach(rm)
        x.delete(): Unit
      }
      rm(dir)
    }
  }

  test("t10: quantiles are rank-selected at ceil(q*n), ties by doc_id") {
    // 7 docs with token counts 1..7 (shuffled ids so rank != doc_id):
    // ceil-rank picks p25 = #2 (rank ceil(7/4)=2), p50 = #4, p75 = #6,
    // p95 = #7 — directly checkable by hand
    val rows = Seq(
      (31L, "a"), (12L, "a a"), (53L, "a a a"), (24L, "a a a a"),
      (45L, "a a a a a"), (6L, "a a a a a a"), (17L, "a a a a a a a"))
    withDocs(rows) { dir =>
      val got = TextQueries.t10.query(spark, dir).collect().head
      assert(got.getAs[Long]("n_docs") == 7L)
      assert(got.getAs[Int]("p25") == 2)
      assert(got.getAs[Int]("p50") == 4)
      assert(got.getAs[Int]("p75") == 6)
      assert(got.getAs[Int]("p95") == 7)
    }
  }

  test("t10: single-doc group — every quantile is that doc's length") {
    withDocs(Seq((1L, "x y z"))) { dir =>
      val got = TextQueries.t10.query(spark, dir).collect().head
      Seq("p25", "p50", "p75", "p95").foreach(c => assert(got.getAs[Int](c) == 3))
    }
  }

  test("t08: each doc_id class seeds and detects its PII kind") {
    // doc_id mod 7 selects the augmentation: 0=email, 1=phone, 2=ip,
    // 3=email+ip, else none.
    withDocs(Seq(0L -> "plain words here", 1L -> "plain words here",
      2L -> "plain words here", 3L -> "plain words here", 4L -> "plain words here")) { dir =>
      val got = TextQueries.t08.query(spark, dir)
        .select("doc_id", "n_emails", "n_phones", "n_ips", "pii_total")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
        .toMap
      assert(got(0L) == ((1, 0, 0, 1)))
      assert(got(1L) == ((0, 1, 0, 1)))
      assert(got(2L) == ((0, 0, 1, 1)))
      assert(got(3L) == ((1, 0, 1, 2)))
      assert(got(4L) == ((0, 0, 0, 0)))
    }
  }

  test("t08: PII already present in the text is detected and redacted") {
    // doc_id 4 gets no augmentation, so everything found comes from the
    // text body; the redacted fingerprint must equal md5 of the
    // hand-redacted canonical form.
    val text = "Write to  Bob@Mail.Example.org or call 555-123-4567 from 192.168.0.1 ok"
    withDocs(Seq(4L -> text, 11L -> "no pii at all")) { dir =>
      val rows = TextQueries.t08.query(spark, dir).collect()
        .map(r => r.getLong(0) -> r).toMap
      val r4 = rows(4L)
      assert(r4.getInt(r4.fieldIndex("n_emails")) == 1)
      assert(r4.getInt(r4.fieldIndex("n_phones")) == 1)
      assert(r4.getInt(r4.fieldIndex("n_ips")) == 1)
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest("write to <email> or call <phone> from <ip> ok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r4.getString(r4.fieldIndex("redacted_fp")) == expected)
      // A zero-PII document's fingerprint is just the canonical text's md5.
      val r11 = rows(11L)
      assert(r11.getInt(r11.fieldIndex("pii_total")) == 0)
      val plain = java.security.MessageDigest.getInstance("MD5")
        .digest("no pii at all".getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r11.getString(r11.fieldIndex("redacted_fp")) == plain)
    }
  }
}
