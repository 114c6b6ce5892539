package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAggregator
import graft.text.HeavyHitters

/** Misra–Gries sketch + heavy-hitters pipeline: the N/(k+1) coverage
  * guarantee under hostile orderings and partitionings, and the
  * end-to-end exactness of the published top-N whichever path
  * (certified sketch or fallback) runs.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def mgLocal(k: Int, xs: Seq[String]): Map[String, Long] = {
    val agg = new MisraGriesAggregator(k)
    xs.foldLeft(agg.zero)(agg.reduce)
  }

  test("MG guarantee: every item with count > N/(k+1) survives, any order") {
    // 3 heavy items among a sea of uniques — the exact shape that kills
    // a naive "keep the first k" counter
    val heavy = Seq.fill(40)("aaa") ++ Seq.fill(35)("bbb") ++ Seq.fill(30)("ccc")
    val noise = (0 until 200).map(i => s"u$i")
    val k = 9
    for (seed <- Seq(1, 7, 42)) {
      val stream = new scala.util.Random(seed).shuffle(heavy ++ noise)
      val n = stream.size
      val bound = n / (k + 1) // 27
      val summary = mgLocal(k, stream)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      exact.filter(_._2 > bound).keys.foreach { t =>
        assert(summary.contains(t), s"seed $seed: heavy item $t lost (count ${exact(t)} > bound $bound)")
      }
      // undercount bound holds for every surviving counter
      summary.foreach { case (t, c) =>
        assert(exact(t) - c <= bound, s"seed $seed: $t undercount ${exact(t) - c} > $bound")
        assert(c <= exact(t), s"seed $seed: $t overcounted")
      }
    }
  }

  test("MG merge preserves the guarantee across 1/3/17 partitions") {
    val heavy = Seq.fill(60)("hot") ++ Seq.fill(45)("warm")
    val noise = (0 until 300).map(i => s"u${i % 150}") // 150 items ×2
    val data = new scala.util.Random(5).shuffle(heavy ++ noise)
    val k = 15
    val bound = data.size / (k + 1)
    val mg = udaf(new MisraGriesAggregator(k), Encoders.STRING)
    for (parts <- Seq(1, 3, 17)) {
      val summary = data.toDF("t").repartition(parts)
        .agg(mg(col("t"))).head().getMap[String, Long](0)
      assert(summary.size <= k)
      Seq("hot", "warm").foreach(t => assert(summary.contains(t),
        s"$parts parts: $t (count > $bound) lost in merge"))
    }
  }

  test("topTokens == brute-force exact top-N on the corpus, certified or not") {
    val docs = Tables.documents(spark, sfDir)
    def brute(n: Int) = docs
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token")).limit(n)
      .select("token", "n_exact").as[(String, Long)].collect().toSeq
    // generous sketch (certifies on this corpus) and a starved one
    // (forces the fallback) must both publish the exact list
    for (sketchK <- Seq(256, 2)) {
      val got = HeavyHitters.topTokens(spark, docs, topN = 10, sketchK = sketchK)
        .select("token", "n_exact").as[(String, Long)].collect().toSeq
      assert(got == brute(10), s"sketchK=$sketchK diverged from exact")
    }
  }

  test("topTokens corpus_frac is count/N over the token stream") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.select(explode(graft.text.TextFunctions.tokens(col("text")))).count()
    val rows = HeavyHitters.topTokens(spark, docs, topN = 5)
      .select("n_exact", "corpus_frac").as[(Long, Double)].collect()
    rows.foreach { case (c, f) => assert(f == c.toDouble / n) }
  }
}
