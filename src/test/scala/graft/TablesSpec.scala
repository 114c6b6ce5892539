package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata-drift smoke spec: the driver regenerates
  * `/root/testdata/sf*` between rounds and has already changed the
  * physical encoding of `events.ts` twice (TIMESTAMP(NANOS) → µs
  * TIMESTAMP_NTZ). Round 7 lost 14 queries to that silently. This suite
  * is the early-warning: it loads EVERY table the engine reads at
  * sf0.001 and asserts the post-load column types the query layer
  * assumes, failing with the table+column name — plus unit coverage of
  * each `Tables.events` schema branch so a fourth encoding fails loudly
  * instead of silently-late.
  */
class TablesSpec extends SparkSpec {

  /** Post-load types the engine's query layer assumes. For `events` the
    * load goes through `Tables.events` (the normalizing path), so `ts`
    * must always come back TimestampType no matter the file encoding.
    * `orders`/`lineitem` date columns are read raw and currently infer as
    * TIMESTAMP_NTZ — value-identical to TimestampType under the pinned
    * UTC session TZ, and the whole oracle suite is green with either — so
    * those accept both flavors (see `TsLike`).
    */
  private val TsLike: DataType = new DataType {
    override def defaultSize = 8
    override def asNullable: DataType = this
    override def typeName = "timestamp-like"
  }

  private def accepts(want: DataType, got: DataType): Boolean =
    if (want eq TsLike) got == TimestampType || got == TimestampNTZType
    else want == got

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map(
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType),
    "part" -> Map(
      "p_partkey" -> LongType, "p_brand" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TsLike,
      "o_orderpriority" -> StringType),
    "lineitem" -> Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_shipdate" -> TsLike),
    "events" -> Map(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  )

  test("every driver table loads at sf0.001 with the types the engine assumes") {
    val problems = Tables.names.flatMap { name =>
      val df =
        if (name == "events") Tables.events(spark, sfDir)
        else Tables(spark, sfDir, name)
      val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
      expected(name).flatMap { case (col, want) =>
        fields.get(col) match {
          case None => Some(s"$name.$col: column missing (testdata drift)")
          case Some(got) if !accepts(want, got) =>
            Some(s"$name.$col: expected ${want.typeName}, testdata now loads as $got")
          case _ => None
        }
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("every driver table is non-empty at sf0.001") {
    Tables.names.foreach { name =>
      val n = Tables(spark, sfDir, name).count()
      assert(n > 0, s"$name.parquet is empty at sf0.001")
    }
  }

  // --- Tables.events schema branches -------------------------------------

  private def withTmp[A](f: String => A): A = {
    val dir = Files.createTempDirectory("tables-spec").toFile
    try f(dir.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(dir)
    }
  }

  private val t0 = Timestamp.valueOf("2024-03-01 12:34:56.789")

  test("events branch: native µs TimestampType passes through") {
    import spark.implicits._
    withTmp { dir =>
      Seq((1L, t0, 7L, "view", 1.5, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = Tables.events(spark, dir)
      assert(got.schema("ts").dataType == TimestampType)
      assert(got.select("ts").as[Timestamp].collect().toSeq == Seq(t0))
    }
  }

  test("events branch: TIMESTAMP_NTZ casts to TimestampType, value-identical under UTC") {
    import spark.implicits._
    withTmp { dir =>
      Seq((1L, t0, 7L, "view", 1.5, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", col("ts").cast(TimestampNTZType))
        .write.parquet(s"$dir/events.parquet")
      assert(spark.read.parquet(s"$dir/events.parquet")
        .schema("ts").dataType == TimestampNTZType)
      val got = Tables.events(spark, dir)
      assert(got.schema("ts").dataType == TimestampType)
      assert(got.select("ts").as[Timestamp].collect().toSeq == Seq(t0))
    }
  }

  test("events branch: long ts under the nanos retry converts ns→µs exactly") {
    import spark.implicits._
    // Spark cannot write TIMESTAMP(NANOS) parquet, so exercise the
    // normalizer directly with what the nanosAsLong read surfaces: a
    // LongType column of epoch-nanoseconds.
    val nanos = t0.getTime * 1000000L + 789L // sub-µs part must truncate
    val raw = Seq((1L, nanos)).toDF("event_id", "ts")
    val got = Tables.normalizeEventsTs(raw, usedNanosRetry = true)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select("ts").as[Timestamp].collect().toSeq == Seq(t0))
  }

  test("events branch: long ts WITHOUT the nanos retry fails loudly (unknown unit)") {
    import spark.implicits._
    val raw = Seq((1L, 12345L)).toDF("event_id", "ts")
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventsTs(raw, usedNanosRetry = false)
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("events branch: a fourth encoding (string ts) fails loudly, not silently") {
    import spark.implicits._
    val raw = Seq((1L, "2024-03-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventsTs(raw, usedNanosRetry = false)
    }
    assert(e.getMessage.contains("drifted"))
  }

  test("events branch: LATER reads in a nanos session (sticky conf, long ts) still convert") {
    import spark.implicits._
    // once the first events() read takes the nanos retry, the legacy
    // conf stays on session-wide and subsequent reads surface LongType
    // directly WITHOUT throwing — they must convert, not crash
    withTmp { dir =>
      val nanos = t0.getTime * 1000000L + 789L
      Seq((1L, nanos)).toDF("event_id", "ts").write.parquet(s"$dir/events.parquet")
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val got = Tables.events(spark, dir)
        assert(got.schema("ts").dataType == TimestampType)
        assert(got.select("ts").as[Timestamp].collect().toSeq == Seq(t0))
      } finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      // without the session flag the same long ts has unknown unit → loud
      intercept[IllegalStateException](Tables.events(spark, dir).schema)
    }
  }

  test("nanos-illegal detector matches error class and wrapped messages") {
    val byMessage = new RuntimeException(
      "caused by [PARQUET_TYPE_ILLEGAL] Illegal Parquet type: INT64 (TIMESTAMP(NANOS,false))")
    assert(Tables.isParquetNanosIllegal(byMessage))
    assert(!Tables.isParquetNanosIllegal(new RuntimeException("boom")))
  }
}
