package graft

import org.apache.spark.sql.functions._
import graft.etl.{FieldSpec, Pipeline, PipelineSpec}
import graft.functions.Coercions
import graft.sinks.MergeWriter
import graft.functions.{Oracle => O}

/** ETL-surface queries (SURVEY.md §2 groups A–F): the operators the
  * reference implements itself — typed projection, coercion, key
  * generation, unions, keyed dedup/merge — compiled from declarative
  * specs into narrow Catalyst plans.
  */
object EtlQueries {

  /** B1–B9 end-to-end — the mapping-apply pipeline
    * (`/root/reference/modules/pipeline_runner.py:133-229`) compiled by
    * graft.etl.Pipeline over the events table as a raw extract: typed
    * projection (5-type vocabulary), JSON attribute extraction, business
    * key, display name, datasource/lastrefreshed stamping. Pure
    * projection — zero shuffles at any scale.
    *
    * Serialization note (applies to e05/e06 too): the pipeline computes
    * DateType / DecimalType(18,2) columns, but the *query output* ships
    * dates as ISO strings and decimals as doubles-of-the-rounded-value.
    * The driver's hasher reads Spark parquet and the DuckDB oracle
    * through different readers whose DATE/DECIMAL logical types hash
    * differently even when every cell is bit-identical (round-1 diff:
    * zero differing cells, hash red; DATE/DECIMAL appeared only in the
    * red queries). decimal(18,2) → double is exact below 2^53/100, so
    * the half-up-at-scale-2 semantics stay fully observable.
    */
  val e01 = QueryDef(
    "e01_typed_projection",
    (s, dir) => {
      // keyless fan-out (r19, guide §2.5): events.parquet is a single
      // row group; the per-row JSON parse + typed projection otherwise
      // run on one core. Pure projection — row set unchanged.
      val raw = Tables.fanOut(s, dir, "events", Tables.events(s, dir))
        .withColumn("k_raw", get_json_object(col("props"), "$.k"))
      val spec = PipelineSpec(
        name = "events_typed",
        fields = Seq(
          FieldSpec("user_id", "store", "string"),
          FieldSpec("ts", "cal_date", "date"),
          FieldSpec("event_type", "channel", "string")),
        measures = Seq(
          FieldSpec("value", "amount", "decimal"),
          FieldSpec("k_raw", "k", "int")),
        requiredDims = Seq("store", "cal_date"),
        keyComponents = Seq("store", "cal_date", "channel"),
        displayComponents = Seq("store", "channel"),
        datasource = Some("events"))
      Pipeline.compile(spec, raw,
        refreshedAt = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
        .withColumn("cal_date", date_format(col("cal_date"), "yyyy-MM-dd"))
        .withColumn("amount", col("amount").cast("double"))
    },
    Some("""
      SELECT CAST(user_id AS VARCHAR) AS store,
        strftime(CAST(ts AS DATE), '%Y-%m-%d') AS cal_date,
        event_type AS channel,
        -- VARCHAR-bridged: Spark's double->decimal rounds the shortest
        -- decimal repr; DuckDB's direct cast rounds the binary value
        CAST(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,2)) AS DOUBLE) AS amount,
        -- TRUNC: Spark's double->long truncates; DuckDB's cast rounds
        CAST(TRUNC(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT) AS k,
        concat_ws('_',
          regexp_replace(CAST(user_id AS VARCHAR), '[ -]', '_', 'g'),
          strftime(CAST(ts AS DATE), '%Y%m%d'),
          regexp_replace(event_type, '[ -]', '_', 'g')) AS business_key,
        concat_ws(' - ', CAST(user_id AS VARCHAR), event_type) AS display_name,
        'events' AS datasource,
        TIMESTAMP '2026-01-01 00:00:00' AS lastrefreshed
      FROM events
    """.stripMargin.trim))

  /** C1/C2 — per-fiscal-year extraction chunks recombined by union
    * (`modules/olap_sync.py:111-151`): two FY-sliced frames,
    * `unionByName`, re-aggregated. On FY-partitioned storage the union
    * is partition pruning — the plan here mirrors the client-side form.
    */
  val e02 = QueryDef(
    "e02_union_fiscal_years",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      def fy(y: Int) = li.filter(
        col("l_shipdate") >= to_timestamp(lit(f"$y-01-01")) &&
          col("l_shipdate") < to_timestamp(lit(f"${y + 1}-01-01")))
      fy(1996).unionByName(fy(1997))
        .groupBy(year(col("l_shipdate")).as("fiscal_year"))
        .agg(graft.functions.StableAgg.dsum(col("l_extendedprice")).as("net_sales"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""
      SELECT CAST(year(l_shipdate) AS INTEGER) AS fiscal_year,
        ${O.dsum("l_extendedprice")} AS net_sales,
        COUNT(*) AS n_lines
      FROM (
        SELECT * FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT * FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01')
      GROUP BY 1
    """.stripMargin.trim))

  /** C — implicit upsert dedup: identical business keys collapse, last
    * writer wins (`modules/dataverse.py:88` PATCH semantics), as a
    * deterministic row_number window — one shuffle on the key.
    */
  val e03 = QueryDef(
    "e03_last_writer_dedup",
    (s, dir) => {
      MergeWriter.latestPerKey(
        Tables.events(s, dir),
        keys = Seq("user_id", "event_type"),
        col("ts").desc, col("event_id").desc)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), col("value"))
    },
    Some("""
      SELECT user_id, event_type, event_id, ts, value
      FROM events
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """.stripMargin.trim))

  /** D1/D3 — keyed MERGE: updates replace same-key target rows, unmatched
    * target rows pass through (the join-based plan behind
    * `load_store_hours.py:141-193` and Delta's MERGE INTO). Target is
    * simulated as the even-id half of events; updates are the last-week
    * window — the reference's daily "last-14-days upsert" shape.
    */
  val e04 = QueryDef(
    "e04_keyed_merge",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val target = ev.filter(col("event_id") % 2 === 0)
      val updates = ev.filter(col("ts") >= to_timestamp(lit("2024-01-25 00:00:00")))
      MergeWriter.merge(target, updates, Seq("event_id"))
    },
    Some("""
      SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
      UNION ALL
      SELECT * FROM events
      WHERE event_id % 2 = 0 AND ts < TIMESTAMP '2024-01-25 00:00:00'
    """.stripMargin.trim))

  /** B2/B5/B11 — the coercion kernels on hostile raw strings: comma
    * thousands separators, `-` null sentinels, multi-format dates, HHMM
    * time normalization (`modules/pipeline_runner.py:81-130`,
    * `load_store_hours.py:33-61`). All native expressions — the whole
    * projection stays in one codegen stage.
    */
  val e05 = QueryDef(
    "e05_coercion_kernels",
    (s, dir) => {
      // keyless fan-out (r19): see e01 — parallelizes the coercion
      // kernels past the single-row-group scan.
      val raw = Tables.fanOut(s, dir, "events", Tables.events(s, dir)).select(
        col("event_id"),
        concat(col("user_id").cast("string"), lit(","),
          lpad((col("event_id") % 1000).cast("string"), 3, "0")).as("raw_int"),
        when(col("event_id") % 7 === 0, lit("-"))
          .otherwise(col("value").cast("string")).as("raw_dec"),
        date_format(col("ts"), "M/d/yyyy").as("raw_date"),
        (floor(col("value")).cast("int") % 24 * 100 + col("event_id") % 60)
          .cast("string").as("raw_hhmm"))
      raw.select(
        col("event_id"),
        Coercions.asInt(col("raw_int")).as("as_int"),
        Coercions.asDecimal(col("raw_dec")).cast("double").as("as_dec"),
        date_format(Coercions.asDate(col("raw_date")), "yyyy-MM-dd").as("as_date"),
        Coercions.asHhmm(col("raw_hhmm")).as("as_hhmm"))
    },
    Some("""
      SELECT event_id,
        CAST(TRUNC(CAST(replace(raw_int, ',', '') AS DOUBLE)) AS BIGINT) AS as_int,
        CASE WHEN raw_dec = '-' THEN NULL
             ELSE CAST(CAST(raw_dec AS DECIMAL(18,2)) AS DOUBLE) END AS as_dec,
        strftime(CAST(strptime(raw_date, '%m/%d/%Y') AS DATE), '%Y-%m-%d') AS as_date,
        concat_ws(':', substr(lpad(raw_hhmm, 4, '0'), 1, 2),
                       substr(lpad(raw_hhmm, 4, '0'), 3, 2)) AS as_hhmm
      FROM (
        SELECT event_id,
          concat(CAST(user_id AS VARCHAR), ',',
                 lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0')) AS raw_int,
          CASE WHEN event_id % 7 = 0 THEN '-' ELSE CAST(value AS VARCHAR) END AS raw_dec,
          strftime(ts, '%-m/%-d/%Y') AS raw_date,
          CAST(CAST(FLOOR(value) AS BIGINT) % 24 * 100 + event_id % 60 AS VARCHAR) AS raw_hhmm
        FROM events)
    """.stripMargin.trim))

  /** SURVEY.md §7.3 — the minimum end-to-end slice, whole: the
    * daily_sales incremental sync re-expressed natively. Rolling
    * last-28-day slicer (G6) → multi-measure group-by at store×day
    * grain (G1/G2) → typed projection through the mapping layer
    * (B1/B2) → business key + display name + metadata (B6/B7/B8).
    * The output is the exact record shape the keyed MERGE sink (D1)
    * consumes. One scan, one aggregation shuffle, then narrow
    * projections — at 100 TB the slicer prunes to the last partitions
    * and nothing else changes.
    */
  val e06 = QueryDef(
    "e06_daily_sales_e2e",
    (s, dir) => {
      import graft.functions.StableAgg._
      val li = Tables.lineitem(s, dir)
      val maxd = li.agg(max(col("l_shipdate")).as("max_ship"))
      val grouped = li.crossJoin(broadcast(maxd))
        .filter(datediff(col("max_ship"), col("l_shipdate")) < 28)
        .groupBy(col("l_suppkey").as("store_raw"),
          to_date(col("l_shipdate")).as("date_raw"))
        .agg(
          dsum(col("l_extendedprice")).as("net_sales_raw"),
          dsum(col("l_quantity")).as("qty_raw"),
          countDistinct(col("l_orderkey")).as("orders_raw"),
          davg(col("l_extendedprice")).as("avg_price_raw"))
      val spec = PipelineSpec(
        name = "daily_sales",
        fields = Seq(
          FieldSpec("store_raw", "store", "string"),
          FieldSpec("date_raw", "cal_date", "date")),
        measures = Seq(
          FieldSpec("net_sales_raw", "net_sales", "decimal"),
          FieldSpec("qty_raw", "qty", "decimal"),
          FieldSpec("orders_raw", "orders", "int"),
          FieldSpec("avg_price_raw", "avg_price", "decimal")),
        requiredDims = Seq("store", "cal_date"),
        keyComponents = Seq("store", "cal_date"),
        displayComponents = Seq("store", "cal_date"),
        datasource = Some("daily_sales"))
      Pipeline.compile(spec, grouped,
        refreshedAt = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
        .withColumn("cal_date", date_format(col("cal_date"), "yyyy-MM-dd"))
        .withColumn("net_sales", col("net_sales").cast("double"))
        .withColumn("qty", col("qty").cast("double"))
        .withColumn("avg_price", col("avg_price").cast("double"))
    },
    Some(s"""
      WITH base AS (
        SELECT * FROM lineitem
        WHERE date_diff('day', CAST(l_shipdate AS DATE),
                (SELECT CAST(MAX(l_shipdate) AS DATE) FROM lineitem)) < 28),
      g AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS store,
          CAST(l_shipdate AS DATE) AS cal_date,
          ${O.dsum("l_extendedprice")} AS net_sales_raw,
          ${O.dsum("l_quantity")} AS qty_raw,
          COUNT(DISTINCT l_orderkey) AS orders_raw,
          ${O.davg("l_extendedprice")} AS avg_price_raw
        FROM base GROUP BY 1, 2)
      SELECT store, strftime(cal_date, '%Y-%m-%d') AS cal_date,
        -- cast through VARCHAR: Spark's double->decimal goes via the
        -- shortest decimal repr (BigDecimal.valueOf), not the binary
        -- value, and DuckDB's string->decimal rounds half-up the same way
        CAST(CAST(CAST(net_sales_raw AS VARCHAR) AS DECIMAL(18,2)) AS DOUBLE) AS net_sales,
        CAST(CAST(CAST(qty_raw AS VARCHAR) AS DECIMAL(18,2)) AS DOUBLE) AS qty,
        orders_raw AS orders,
        CAST(CAST(CAST(avg_price_raw AS VARCHAR) AS DECIMAL(18,2)) AS DOUBLE) AS avg_price,
        concat_ws('_',
          regexp_replace(store, '[ -]', '_', 'g'),
          strftime(cal_date, '%Y%m%d')) AS business_key,
        concat_ws(' - ', store, CAST(cal_date AS VARCHAR)) AS display_name,
        'daily_sales' AS datasource,
        TIMESTAMP '2026-01-01 00:00:00' AS lastrefreshed
      FROM g
    """.stripMargin.trim))

  /** B9 — default-value fill through a mapping `default:` field
    * (`/root/reference/modules/pipeline_runner.py:168-195`: a null after
    * coercion takes the spec's default, itself coerced). Nulls are
    * injected on both a dimension (string default) and a measure
    * (decimal default) so the fill path is exercised for both branches.
    */
  val e20 = QueryDef(
    "e20_default_fill",
    (s, dir) => {
      val raw = Tables.part(s, dir).select(
        col("p_partkey").cast("string").as("PartId"),
        when(col("p_size") % 7 === 0, lit(null)).otherwise(col("p_brand")).as("Brand"),
        when(col("p_size") % 5 === 0, lit(null)).otherwise(col("p_retailprice")).as("Price"))
      val spec = PipelineSpec(
        name = "default_fill",
        fields = Seq(
          FieldSpec("PartId", "part_id", "string"),
          FieldSpec("Brand", "brand", "string", Some("UNKNOWN"))),
        measures = Seq(FieldSpec("Price", "price", "decimal", Some("0"))),
        requiredDims = Seq("part_id"),
        keyComponents = Seq("part_id"),
        datasource = Some("default_fill"))
      Pipeline.compile(spec, raw,
        refreshedAt = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
        .withColumn("price", col("price").cast("double"))
    },
    Some("""
      SELECT CAST(p_partkey AS VARCHAR) AS part_id,
        COALESCE(CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_brand END, 'UNKNOWN') AS brand,
        CAST(COALESCE(
          CAST(CAST(CASE WHEN p_size % 5 = 0 THEN NULL ELSE p_retailprice END AS VARCHAR)
            AS DECIMAL(18,2)), 0) AS DOUBLE) AS price,
        regexp_replace(CAST(p_partkey AS VARCHAR), '[ -]', '_', 'g') AS business_key,
        'default_fill' AS datasource,
        TIMESTAMP '2026-01-01 00:00:00' AS lastrefreshed
      FROM part
    """.stripMargin.trim))

  /** B12 — null-strip before sink, pinned at the serialized wire level:
    * null fields are OMITTED from the JSON body (a PATCH with an
    * explicit null would clear the column — the reference strips them,
    * `modules/dataverse.py:76`). Spark's `to_json` drops null struct
    * fields by default; the oracle rebuilds the exact wire string with
    * null-skipping concat, so a serializer that emitted `"k":null`
    * would hash-mismatch.
    */
  val e21 = QueryDef(
    "e21_null_strip_wire",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      c.select(
        col("c_custkey").as("id"),
        to_json(struct(
          col("c_custkey").as("id"),
          when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
            .otherwise(col("c_mktsegment")).as("segment"),
          when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
            .otherwise(col("c_name")).as("name"))).as("wire_json"))
    },
    Some("""
      SELECT c_custkey AS id,
        '{' || concat_ws(',',
          '"id":' || CAST(c_custkey AS VARCHAR),
          CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
            ELSE '"segment":"' || c_mktsegment || '"' END,
          CASE WHEN c_custkey % 3 = 0 THEN NULL
            ELSE '"name":"' || c_name || '"' END) || '}' AS wire_json
      FROM customer
    """.stripMargin.trim))

  /** Type-2 SCD merge ([[graft.sinks.Scd2]]): one update wave against
    * the supplier dimension — changed keys (suppkey % 7 = 0, balance
    * bumped) close their open row at the effective date and open a new
    * version; no-op updates (suppkey % 5 = 0, identical values) must
    * NOT create spurious versions; untouched keys pass through. The
    * result is the full history table a point-in-time fact join needs —
    * the history the reference's overwrite-style Dataverse upsert
    * discards.
    */
  val e24 = QueryDef(
    "e24_scd2_history",
    (s, dir) => {
      val sup = Tables.supplier(s, dir)
      val dim = sup.select(col("s_suppkey"), col("s_acctbal"))
        .withColumn("valid_from", lit("2024-01-01").cast("date"))
        .withColumn("valid_to", lit(null).cast("date"))
        .withColumn("is_current", lit(1))
      val updates = sup.filter(col("s_suppkey") % 7 === 0)
        .select(col("s_suppkey"), (col("s_acctbal") + 100).as("s_acctbal"))
        .unionByName(
          sup.filter(col("s_suppkey") % 5 === 0 && col("s_suppkey") % 7 =!= 0)
            .select(col("s_suppkey"), col("s_acctbal")))
      graft.sinks.Scd2.merge(dim, updates, "s_suppkey",
        Seq("s_acctbal"), lit("2024-06-01"))
    },
    Some("""
      WITH dim AS (
        SELECT s_suppkey, s_acctbal, DATE '2024-01-01' AS valid_from,
               CAST(NULL AS DATE) AS valid_to, 1 AS is_current
        FROM supplier),
      u AS (
        SELECT s_suppkey, s_acctbal + 100 AS s_acctbal
        FROM supplier WHERE s_suppkey % 7 = 0
        UNION ALL
        SELECT s_suppkey, s_acctbal
        FROM supplier WHERE s_suppkey % 5 = 0 AND s_suppkey % 7 <> 0),
      chg AS (
        SELECT d.s_suppkey FROM dim d JOIN u ON u.s_suppkey = d.s_suppkey
        WHERE u.s_acctbal <> d.s_acctbal)
      SELECT d.s_suppkey, d.s_acctbal, d.valid_from,
        CASE WHEN c.s_suppkey IS NOT NULL THEN DATE '2024-06-01' END AS valid_to,
        CAST(CASE WHEN c.s_suppkey IS NOT NULL THEN 0 ELSE 1 END AS INTEGER) AS is_current
      FROM dim d LEFT JOIN chg c USING (s_suppkey)
      UNION ALL
      SELECT u.s_suppkey, u.s_acctbal, DATE '2024-06-01' AS valid_from,
        CAST(NULL AS DATE) AS valid_to, CAST(1 AS INTEGER) AS is_current
      FROM u JOIN chg USING (s_suppkey)
    """.stripMargin.trim))

  def all: Seq[QueryDef] = Seq(e01, e02, e03, e04, e05, e06, e20, e21, e24)
}
