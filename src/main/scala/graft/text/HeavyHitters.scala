package graft.text

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAggregator

/** Corpus-wide heavy hitters (most frequent tokens) as the two-phase
  * sketch-then-verify pipeline a 100 TB corpus needs:
  *
  *  1. **Candidate pass** — one scan aggregating a Misra–Gries summary
  *     (O(sketchK) state per partition, map-side partials; the
  *     vocabulary never shuffles) plus the exact stream length N.
  *  2. **Verify pass** — exact counts for the ≤sketchK candidate
  *     tokens only (the IN-filter prunes at the scan), then the top-N
  *     by (count desc, token asc).
  *
  * The result is certified EXACT, not approximate: MG guarantees every
  * token with true count > N/(sketchK+1) survives the sketch, so when
  * the published N-th count exceeds that bound no non-candidate could
  * displace it. If the distribution is too flat to certify (or ties
  * straddle the cut), fall back to the full exact aggregation — same
  * answer, just without the vocabulary bound. Either way the output is
  * deterministic and oracle-replayable; the sketch only decides how
  * much work the verify pass does.
  */
object HeavyHitters {

  /** Top-`topN` tokens of `docs`' text by exact count, with
    * `corpus_frac` = count/N. `sketchK` bounds sketch state and sets
    * the certification bound N/(sketchK+1).
    */
  def topTokens(spark: SparkSession, docs: DataFrame,
      topN: Int = 20, sketchK: Int = 256): DataFrame = {
    val tok = docs
      .withColumn("__toks", TextFunctions.tokens(col("text")))
      .select(explode(col("__toks")).as("token"))
    val mg = udaf(new MisraGriesAggregator(sketchK), Encoders.STRING)

    // control-plane: one row — the ≤sketchK-entry summary and N
    val head = tok.agg(mg(col("token")).as("cand"), count(lit(1)).as("n")).head()
    val cand = head.getMap[String, Long](0).keys.toSeq
    val nTotal = head.getLong(1)
    val bound = nTotal / (sketchK + 1)

    def ranked(counts: DataFrame): DataFrame = counts
      .orderBy(col("n_exact").desc, col("token"))
      .limit(topN)
      .withColumn("corpus_frac", col("n_exact") / lit(nTotal))

    // ≤topN rows after the limit — control-plane. Collecting here and
    // re-publishing via createDataFrame means the returned frame is a
    // LocalRelation: a caller materializing it does NOT re-execute the
    // tokenize+explode scan and candidate aggregation a second time
    // (the lazy form re-ran both on every downstream action).
    def rows(counts: DataFrame): Array[org.apache.spark.sql.Row] = ranked(counts).collect()
    val verified = rows(
      tok.filter(col("token").isInCollection(cand))
        .groupBy("token").agg(count(lit(1)).as("n_exact")))

    // certified iff no non-candidate could reach the list: every
    // non-candidate has true count ≤ bound (the MG guarantee), so a
    // full topN list whose minimum strictly exceeds the bound cannot be
    // displaced. Anything weaker (short list, ties at the bound) falls
    // back to the full exact aggregation — correct at any distribution.
    val certified =
      verified.length == topN && verified.map(_.getLong(1)).min > bound
    val finalRows = if (certified) verified
      else rows(tok.groupBy("token").agg(count(lit(1)).as("n_exact")))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("token", StringType),
      StructField("n_exact", LongType, nullable = false),
      StructField("corpus_frac", DoubleType)))
    spark.createDataFrame(java.util.Arrays.asList(finalRows: _*), schema)
  }
}
