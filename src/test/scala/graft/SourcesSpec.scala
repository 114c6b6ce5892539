package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Connectors, Mddataset}

/** Source specs: mddataset ordinal pivot decode (A2), template rendering
  * (A10), paged read (A9). The decode test is a round trip: flatten a
  * known frame into (ordinal, value) cells and recover it.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("mddataset decode recovers rows from the dense ordinal matrix") {
    // 3 measures x 2 axis rows, one missing cell (NON EMPTY artifact).
    val measures = Seq("Net Sales", "Orders", "Avg TTDT")
    val cells = Seq(
      (0L, "100.5"), (1L, "7"), (2L, "21.2"),
      (3L, "88.0"), /* ordinal 4 missing */ (5L, "19.9"))
      .toDF("ordinal", "value")
    val tuples = Seq((0L, "S1", "2025-01-01"), (1L, "S2", "2025-01-01"))
      .toDF("row_idx", "store", "cal_date")
    val out = Mddataset.decode(cells, measures, Some(tuples))
      .orderBy("row_idx").collect()
    assert(out(0).getAs[String]("Net Sales") == "100.5")
    assert(out(0).getAs[String]("Orders") == "7")
    assert(out(1).getAs[String]("Orders") == null)
    assert(out(1).getAs[String]("Avg TTDT") == "19.9")
    assert(out(1).getAs[String]("store") == "S2")
  }

  test("mddataset decode + mapping layer = typed frame (A2 -> B1)") {
    val cells = (0 until 6).map(i => (i.toLong, s"${i * 10},5")).toDF("ordinal", "value")
    val decoded = Mddataset.decode(cells, Seq("m1", "m2"))
    val typed = decoded.select(col("row_idx"),
      graft.functions.Coercions.asInt(col("m1")).as("m1"))
    val m = typed.as[(Long, Long)].collect().toMap
    // m1 holds "0,5" / "20,5" / "40,5" — comma-stripped ints
    assert(m == Map(0L -> 5L, 1L -> 205L, 2L -> 405L))
  }

  test("template render substitutes ${var} and leaves MDX braces alone") {
    val mdx = "SELECT {[Measures].[X]} ON COLUMNS FROM [Cube] WHERE ([FY].&[${fy}])"
    val out = Connectors.renderTemplate(mdx, Map("fy" -> "2025"))
    assert(out == "SELECT {[Measures].[X]} ON COLUMNS FROM [Cube] WHERE ([FY].&[2025])")
    intercept[IllegalArgumentException] {
      Connectors.renderTemplate("${missing}", Map.empty)
    }
  }

  test("paged read follows next tokens to the end") {
    val schema = StructType(Seq(StructField("k", StringType), StructField("id", IntegerType)))
    val source = new Connectors.PagedFetch {
      def fetch(token: Option[String]): (Seq[Row], Option[String]) = token match {
        case None => (Seq(Row("a", 1), Row("b", 2)), Some("p2"))
        case Some("p2") => (Seq(Row("c", 3)), None)
        case other => fail(s"unexpected token $other")
      }
    }
    val df = Connectors.pagedRead(spark, schema, source)
    assert(df.count() == 3)
    assert(df.filter(col("k") === "c").select("id").as[Int].collect().toSeq == Seq(3))
  }

  test("partitioned paged read: N pages fetched exactly once across P input partitions") {
    val fetches = spark.sparkContext.longAccumulator("page-fetches")
    val schema = StructType(Seq(StructField("page", IntegerType), StructField("v", IntegerType)))
    val source = new Connectors.PageRangeFetch {
      def fetch(page: Int): Seq[Row] = {
        fetches.add(1)
        (0 until 3).map(i => Row(page, page * 10 + i))
      }
    }
    val df = Connectors.pagedReadPartitioned(spark, schema, source, numPages = 8, partitions = 4)
    // the scan is distributed: 4 input partitions, not a driver loop
    assert(df.rdd.getNumPartitions == 4)
    val rows = df.collect()
    // one action → every page fetched exactly once, each by its own slice
    assert(fetches.value == 8, s"expected 8 page fetches, saw ${fetches.value}")
    assert(rows.length == 24)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet ==
      (0 until 8).flatMap(p => (0 until 3).map(i => (p, p * 10 + i))).toSet)
  }

  test("partitioned paged read: zero pages is an empty frame, not an error") {
    val schema = StructType(Seq(StructField("v", IntegerType)))
    assert(Connectors.pagedReadPartitioned(spark, schema, SourcesSpec.MustNotFetch,
      numPages = 0).count() == 0)
  }

  test("csv scan: header-keyed, strings until mapping coerces (A7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val f = dir.resolve("in.csv")
    java.nio.file.Files.writeString(f,
      "Store,Date,Net Sales\nS1,11/5/25,\"1,234.5\"\nS2,11/6/25,99\n")
    val raw = Connectors.csv(spark, f.toString)
    assert(raw.schema.fields.forall(_.dataType == StringType))
    val typed = raw.select(
      graft.functions.Coercions.asDecimal(col("Net Sales")).as("net_sales"))
    assert(typed.as[BigDecimal].collect().map(_.toString).sorted.toSeq
      == Seq("1234.50", "99.00"))
  }
}

object SourcesSpec {
  /** Top-level (outer-free, serializable) source that must never fetch. */
  object MustNotFetch extends Connectors.PageRangeFetch {
    def fetch(page: Int): Seq[org.apache.spark.sql.Row] =
      throw new IllegalStateException(s"fetch($page) must not be called")
  }
}
