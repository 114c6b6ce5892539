package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dedup specs: exact-dedup survivor rule, SimHash banding exactness
  * (pigeonhole vs brute force), LSH candidate recall on the real corpus.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps the lowest id per identical content") {
    val docs = Seq(
      (10L, "same  Text here"), (3L, "same text HERE"), (7L, "different"))
      .toDF("doc_id", "text")
    val kept = Dedup.exact(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 7L)) // normalization collapses case/space
  }

  test("simhash banding equals brute-force hamming scan (pigeonhole)") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val banded = Dedup.simhashPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sims = Dedup.simhash(docs)
    val a = sims.select(col("doc_id").as("da"), col("simhash").as("sa"))
    val b = sims.select(col("doc_id").as("db"), col("simhash").as("sb"))
    val brute = a.join(b, col("da") < col("db"))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(banded == brute)
    assert(brute.nonEmpty)
  }

  test("typed MinHashAggregator equals the Column-plan signatures") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).limit(50)
    // base hashes exactly as minhashBands computes them
    val hashes = docs
      .withColumn("__toks", graft.text.TextFunctions.tokens(col("text")))
      .select(col("doc_id"),
        explode(graft.text.TextFunctions.shinglesOf(col("__toks"))).as("__s"))
      .withColumn("h",
        conv(substring(md5(col("__s")), 1, 15), 16, 10).cast("long") % Dedup.MinhashP)
      .select(col("doc_id"), col("h")).as[(Long, Long)]
    val agg = new graft.dedup.MinHashAggregator(16)
    val typed = hashes.groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sig"))
      .collect().toMap
    val fromBands = Dedup.minhashBands(docs)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("band"))
        .flatMap(_.getAs[String]("band_hash").split("_").map(_.toLong)).toSeq)
      .toMap
    assert(typed.keySet == fromBands.keySet)
    typed.foreach { case (id, sig) =>
      assert(sig.toSeq == fromBands(id), s"doc $id")
    }
  }

  test("minhash-LSH finds the strong Jaccard pairs the exact scan finds") {
    val docs = Tables.documents(spark, sfDir)
    val exact = Dedup.jaccardPairs(Dedup.shingleIndex(docs), threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // r=2/b=8 recall at j≥0.8 is 1-(1-0.64)^8 ≈ 0.9997 — on this corpus
    // every strong pair must surface.
    assert(exact.subsetOf(lsh), s"missing: ${exact.diff(lsh)}")
  }

  test("sign-bit LSH cosine pairs match brute force at the design threshold") {
    import graft.similarity.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    // perturbed copies — same construction as d05 (float-exact k/128 factors)
    val copies = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") *
            (lit(1.0) +
              ((i.cast("long") * 7919L + col("vec_id") * 104729L) % 11L - 5L)
                .cast("double") / lit(128.0)))
            .cast("float").cast("double")).as("embedding"))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(copies)
    val lsh = Similarity.lshCosinePairs(corpus, "vec_id", "embedding", 0.9)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteCosinePairs(corpus, "vec_id", "embedding", 0.9)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    // at cosine ≈ 0.999 a sign bit agrees with p ≈ 0.99, an 8-bit band with
    // p ≈ 0.93 — any of the 4 bands missing all 100 pairs is ~impossible
    assert(lsh == brute, s"lsh=${lsh.size} brute=${brute.size} missing=${brute.diff(lsh)}")
    assert(brute.nonEmpty)
  }

  test("sign-bit LSH on an empty corpus returns the empty pair set") {
    import graft.similarity.Similarity
    // an empty daily slice is a plausible input — must not NPE on the
    // null max-dims aggregate
    val empty = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 0)
    val out = Similarity.lshCosinePairs(empty, "vec_id", "embedding", 0.9)
    assert(out.columns.toSeq == Seq("va", "vb", "cosine"))
    assert(out.count() == 0)
  }
}
