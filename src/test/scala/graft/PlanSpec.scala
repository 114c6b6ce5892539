package graft

import org.apache.spark.sql.functions._

/** Plan-quality regression tests: the scale properties (pushdown,
  * pruning, broadcast, partial aggregation) asserted on the actual
  * physical plans, so a refactor can't silently regress them.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(name: String): String =
    Queries.byName(name).query(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q01: date slicer reaches the parquet scan; columns prune") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // only the 8 needed columns of 11 are read
    assert(!p.contains("l_partkey"), "column pruning lost: l_partkey read but unused")
  }

  test("q02: all dimension joins broadcast; fact never shuffles for them") {
    val p = planOf("q02_star_join_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, p.linesIterator.take(30).mkString("\n"))
  }

  test("q11: 47 measures aggregate with map-side partial combine") {
    val df = Queries.byName("q11_daily_sales_wide").query(spark, sfDir)
    assert(df.columns.length == 50) // 3 group cols + 47 measures
    val p = df.queryExecution.executedPlan.toString
    // partial + final hash aggregation (pre-shuffle combine)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final aggregation")
  }

  test("partitioned table: calendar predicate prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    Tables.lineitem(spark, sfDir)
      .withColumn("fiscal_year", year(col("l_shipdate")))
      .write.partitionBy("fiscal_year").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("fiscal_year") === 1996)
      .agg(sum(col("l_quantity")))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(fiscal_year"), scan)
    assert(scan.contains("(fiscal_year#") && scan.contains("= 1996)"), scan)
  }

  test("e01: typed projection adds no shuffle beyond the scan-layout fan-out") {
    // r19: a single round-robin exchange right above the scan is the
    // scan-layout fan-out (Tables.fanOut — the testdata is one row group,
    // so the JSON parse + projection would otherwise run one core wide);
    // the mapping itself must still add NO exchange of its own.
    val p = planOf("e01_typed_projection")
    val exchanges = "Exchange [A-Za-z]+".r.findAllIn(p).toSeq
    assert(exchanges.forall(_.contains("RoundRobinPartitioning")) &&
      exchanges.size <= 1,
      s"mapping projection must not shuffle beyond the fan-out: $exchanges")
  }

  test("d05: LSH candidate generation has no nested-loop/theta join") {
    val p = planOf("d05_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"), "n² pair space leaked into the plan")
    assert(!p.contains("CartesianProduct"), "n² pair space leaked into the plan")
    // candidates come from hash joins on (band, band_hash) equality
    assert("HashJoin".r.findAllIn(p).nonEmpty, p.linesIterator.take(20).mkString("\n"))
    // the whole hot path is codegen'd kernels (r13): signatures and
    // dots must never regress to interpreted array-HOF folds
    assert(p.contains("lsh_band_hashes"), "signature kernel missing from the plan")
    assert(p.contains("dot_exact") && p.contains("dot_fast"),
      "cosine re-verify must use the codegen'd dot kernels")
    assert(!p.contains("zip_with") && !p.contains("aggregate("),
      "an interpreted array-HOF fold regressed into the LSH hot path")
  }

  test("d12: substring-dedup plan is linear — equi-joins only, no pair operator") {
    val p = planOf("d12_substring_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin"), "pair space leaked into the plan")
    assert(!p.contains("CartesianProduct"), "pair space leaked into the plan")
    // sharedness is a 1:1 equi-join on the gram hash; the interval
    // merge is a per-doc window — both keyed, both linear
    assert(p.contains("Join") && p.contains("Window"), p.linesIterator.take(20).mkString("\n"))
  }

  test("d14: benchmark grams broadcast; span merge is the train side's only wide op") {
    val p = planOf("d14_decontamination_spans")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "benchmark gram probe must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "contamination probe must not shuffle the train corpus against the benchmark")
  }

  test("d09: benchmark gram set broadcasts; the train side has one shuffle (its own agg)") {
    val p = planOf("d09_decontamination")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark membership probe must broadcast — the eval suite is fixed-size at any corpus scale")
    assert(!p.contains("SortMergeJoin"),
      "train grams must not shuffle for the benchmark probe")
  }

  test("d16: bloom probe plan has NO join of any kind — the bitmap rides as a plan literal") {
    val qe = Queries.byName("d16_bloom_decontamination").query(spark, sfDir).queryExecution
    assert(!qe.executedPlan.toString.contains("Join"),
      "bloom membership must be a per-row kernel against the embedded bitmap, " +
        "never a join — the operator's whole point is a fixed-size benchmark side")
    // the kernel lands in the distinct aggregate's RESULT expressions
    // (collapsed by the optimizer — evaluated once per distinct gram),
    // which the physical toString abbreviates away: pin it logically
    assert(qe.optimizedPlan.toString.contains("bloom_hits"),
      "probe kernel missing from the plan")
  }

  test("e12/e13: offer/item dimensions broadcast; fact never shuffles for them") {
    Seq("e12_offers_e2e", "e13_inventory_e2e").foreach { n =>
      val p = planOf(n)
      assert(p.contains("BroadcastHashJoin"), s"$n: part join must broadcast")
    }
  }

  test("bucketed keyed table: merge join shuffles only the updates side (D6)") {
    import graft.sinks.{MergeWriter, TableManager}
    val name = "graft_bucket_pin"
    TableManager.drop(spark, name)
    val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), name)
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    val seed = (1 to 5000).map(i => (s"K$i", i.toDouble)).toDF("business_key", "v")
    TableManager.ensureKeyedTable(spark, name, seed.schema, "business_key", buckets = 4)
    TableManager.mergeInto(spark, name, seed, "business_key")
    val updates = (1 to 500).map(i => (s"K${i * 7}", -i.toDouble)).toDF("business_key", "v")
    // force the sort-merge path (broadcast would hide the distribution
    // question entirely — at 100 TB the updates side can be large too)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = MergeWriter.merge(spark.table(name), updates, Seq("business_key"))
      merged.write.mode("overwrite").format("noop").save()
      val p = merged.queryExecution.executedPlan.toString
      // the table side reads its 4 buckets as the join distribution: the
      // one shuffle in the anti-join belongs to the updates side only —
      // at 100 TB the years-deep table never re-shuffles for a merge
      assert(p.contains("SelectedBucketsCount: 4 out of 4"), p.linesIterator.take(40).mkString("\n"))
      val antiJoinShuffles = raw"Exchange hashpartitioning\(business_key".r.findAllIn(p).size
      assert(antiJoinShuffles == 1,
        s"expected exactly one key shuffle (updates side), got $antiJoinShuffles:\n" +
          p.linesIterator.take(40).mkString("\n"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      TableManager.drop(spark, name)
    }
  }

  test("e11/q05: TY/LY self-join reads the persisted aggregate — fact scanned once") {
    Seq("e11_sales_channel_e2e", "q05_ty_ly_weekly").foreach { n =>
      val df = Queries.byName(n).query(spark, sfDir)
      try {
        val p = df.queryExecution.executedPlan.toString
        // both join inputs come from the cached group-grain aggregate;
        // the lineitem FileScan lives only INSIDE the cached relation, so
        // the fact is read exactly once however many times TY is reused
        // both join inputs must read the cached aggregate: the fact is
        // computed once, however many times TY is reused. (FileScan lines
        // still appear in the string — they are the cached relation's own
        // plan printed as detail under each InMemoryTableScan, not a
        // recompute; a recompute would drop one of the InMemoryTableScans.)
        val inMem = "InMemoryTableScan".r.findAllIn(p).size
        assert(inMem == 2, s"$n: expected both TY/LY inputs cached, got $inMem:\n" +
          p.linesIterator.take(30).mkString("\n"))
      } finally spark.catalog.clearCache()
    }
  }

  test("kmv sketch-only aggregation shuffles O(k) per group, not per distinct") {
    // q16 itself publishes the exact count alongside, which forces a
    // (group, hash)-grain pre-aggregate — deliberate for the error
    // story. THIS pin is the production shape: sketch only, where the
    // partial aggregate keys on the group alone and the exchange
    // carries one O(k) buffer per (partition, group).
    val kmv = udaf(new graft.functions.KmvAggregator(64),
      org.apache.spark.sql.Encoders.scalaLong)
    val h = conv(substring(md5(col("l_orderkey").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val df = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), h.as("h"))
      .groupBy("l_returnflag")
      .agg(kmv(col("h")).as("sketch"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_kmvaggregator"), p.linesIterator.take(20).mkString("\n"))
    // the partial aggregate's keys must be the group column only — a
    // (group, h) key would mean the shuffle scales with distincts again
    val keys = "keys=\\[([^\\]]*)\\]".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keys.nonEmpty && keys.forall(k => k.contains("l_returnflag") && !k.contains("h#")),
      s"partial aggregate keyed on the hash — shuffle is per-distinct: keys=$keys")
  }

  test("t12: per-source totals broadcast; the keep decision never shuffles the corpus") {
    val p = planOf("t12_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(20).mkString("\n"))
    // exactly one data-shuffle: the per-source aggregate feeding the
    // broadcast (its exchange + the broadcast exchange); the corpus side
    // joins map-side
    val exchanges = "ShuffleExchange|Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"corpus side must not shuffle for the rate join:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("t13/m03: chunking and frame extraction are pure narrow plans (no shuffle)") {
    for (q <- Seq("t13_chunking", "m03_audio_frames")) {
      val p = planOf(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    }
  }

  test("t15: byte-level encode is scan → explode → one count shuffle; columns prune") {
    val p = planOf("t15_bpe_byte_encode")
    // the encoder kernel and token-id lookup are per-row expressions —
    // the only wide ops are the (doc_id, token) count's exchange (with
    // map-side partial combine in front of it) and, since r19, the
    // round-robin scan-layout fan-out below the encode (Tables.fanOut —
    // the testdata is one row group per file)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    val rrEx = "Exchange RoundRobinPartitioning".r.findAllIn(p).size
    assert(hashEx == 1 && rrEx <= 1 &&
      "Exchange".r.findAllIn(p).size == hashEx + rrEx,
      p.linesIterator.take(30).mkString("\n"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final aggregate expected")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // only (doc_id, text) of the documents table's five columns reach
    // the scan — asserted on the scan's ReadSchema field set, not on
    // substring absence over the whole plan (a future identifier or
    // codegen token containing 'lang' must not fail this spuriously,
    // and a renamed column must not pass it vacuously)
    val readFields = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p)
      .map(_.group(1).split(",").map(_.trim.takeWhile(_ != ':')).toSet).toSeq
    assert(readFields.nonEmpty, s"no ReadSchema in the formatted plan:\n$p")
    assert(readFields == Seq(Set("doc_id", "text")),
      s"column pruning lost: documents scan reads $readFields, want {doc_id, text}")
  }

  test("e24: SCD2 merge is a keyed full-outer join — no cartesian anywhere") {
    val p = planOf("e24_scd2_history")
    assert(p.contains("FullOuter"), "update-vs-open must be a keyed full-outer join:\n" +
      p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "SCD2 merge leaked a pair space")
  }

  test("q17: top-k aggregates partially map-side; no Window sort of the revenue rows") {
    val p = planOf("q17_topk_per_group")
    assert(!p.contains("Window"), "top-k must not window-sort every group row")
    assert(p.toLowerCase.contains("partial_topkaggregator"),
      "top-k partial (map-side) aggregation missing:\n" +
        p.linesIterator.take(25).mkString("\n"))
  }
}
