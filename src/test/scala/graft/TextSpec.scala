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
  import spark.implicits._

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

  test("t11: two-level prefix sum equals a naive global cumsum, any partitioning") {
    // doc lengths 1..25 tokens, doc_ids crossing bucket boundaries
    // (bucket = doc_id div 100): ids 90..114 span two buckets
    val rows = (90L to 114L).map(id => id -> (1 to (id % 25 + 1).toInt).map(i => s"w$i").mkString(" "))
    withDocs(rows) { dir =>
      val got = TextQueries.t11.query(spark, dir)
        .select("doc_id", "n_tokens", "tok_offset", "seq_id", "straddles")
        .as[(Long, Int, Long, Long, Int)].collect().sortBy(_._1)
      var off = 0L
      rows.sortBy(_._1).zip(got).foreach { case ((id, text), g) =>
        val n = text.split(" ").length
        assert(g._1 == id && g._2 == n)
        assert(g._3 == off, s"doc $id offset")
        assert(g._4 == off / 2048)
        assert(g._5 == (if (off / 2048 != (off + n - 1) / 2048) 1 else 0))
        off += n
      }
    }
  }

  test("t12: rates bound to (0,1]; keep flag is a pure function of doc_id") {
    val rows = (0L to 59L).map(id => id -> (1 to 40).map(i => s"t$i").mkString(" "))
    withDocs(rows) { dir =>
      val a = TextQueries.t12.query(spark, dir)
        .select("doc_id", "rate", "keep").as[(Long, Double, Int)].collect().sortBy(_._1)
      assert(a.forall { case (_, r, _) => r > 0.0 && r <= 1.0 })
      // 60 docs x 40 tokens = 2400 tokens in src0, budget 1300 → rate
      // 1300/2400, some kept and some dropped
      assert(a.exists(_._3 == 1) && a.exists(_._3 == 0))
      assert(math.abs(a.head._2 - 1300.0 / 2400.0) < 1e-12)
      // the keep decision replays identically on a re-read (salted hash
      // of doc_id, nothing positional)
      val b = TextQueries.t12.query(spark, dir)
        .select("doc_id", "rate", "keep").as[(Long, Double, Int)].collect().sortBy(_._1)
      assert(a.toSeq == b.toSeq)
    }
  }

  test("t13: chunks tile the document — strip the overlap and the text reassembles") {
    val text = (1 to 137).map(i => s"tok$i").mkString(" ")
    withDocs(Seq(42L -> text)) { dir =>
      val chunks = TextQueries.t13.query(spark, dir)
        .select("chunk_id", "start_tok", "chunk_len", "chunk_text")
        .as[(Int, Int, Int, String)].collect().sortBy(_._1)
      assert(chunks.map(_._1).toSeq == chunks.indices.toSeq)
      // each chunk starts stride tokens after the previous; interior
      // chunks are full-size
      chunks.foreach { case (id, start, len, t) =>
        assert(start == id * 40)
        assert(t.split(" ").length == len)
      }
      chunks.dropRight(1).foreach { case (_, _, len, _) => assert(len == 50) }
      // drop each chunk's 10-token overlap prefix (except the first) and
      // the concatenation is the original document, token for token
      val reassembled = chunks.map { case (id, _, _, t) =>
        val toks = t.split(" ")
        if (id == 0) toks else toks.drop(10)
      }.flatten
      assert(reassembled.toSeq == text.split(" ").toSeq)
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

  test("BPE kernel: greedy leftmost merge-all semantics, chains, ids, unknown chars") {
    import graft.text.Bpe
    // overlapping-run semantics: merge all non-overlapping occurrences
    // of the best pair, leftmost first — the classic GPT-2 loop
    assert(Bpe.encodePiece("value").toSeq == Seq("value"))   // 4-level chain
    assert(Bpe.encodePiece("table").toSeq == Seq("table"))
    assert(Bpe.encodePiece("the").toSeq == Seq("the"))
    assert(Bpe.encodePiece("then").toSeq == Seq("the", "n")) // no (the,n) merge
    assert(Bpe.encodePiece("x").toSeq == Seq("x"))           // single char
    assert(Bpe.encodePiece("qqq").toSeq == Seq("q", "q", "q")) // no merges apply
    // (i,n) then (in,g): 'ing' chains; 'inin' merges both non-overlapping
    assert(Bpe.encodePiece("ing").toSeq == Seq("ing"))
    assert(Bpe.encodePiece("inin").toSeq == Seq("in", "in"))
    // token ids: code point for single chars, MergedIdBase+rank for
    // merges (past MAX_CODE_POINT, so the spaces can never collide)
    assert(Bpe.tokenId("q") == 'q'.toInt)
    assert(Bpe.tokenId("th") == Bpe.MergedIdBase)
    assert(Bpe.tokenId("the") == Bpe.MergedIdBase + 1)
    assert(Bpe.tokenId("zz") == -1) // not an encoder-producible token
    // unknown (non-ASCII) characters are base tokens with their code point
    assert(Bpe.tokenId("é") == 0xe9)
    // symbols are CODE POINTS, not UTF-16 units: a supplementary
    // character (2 chars in Java) must stay ONE token with its real
    // code point — split surrogates would UTF8-encode as '?' and
    // diverge from the code-point-based oracle
    assert(Bpe.encodePiece("👍").toSeq == Seq("👍")) // 👍
    assert(Bpe.tokenId("👍") == 0x1f44d)
  }

  test("t14: doc-level encoding — pre-tokenizer pieces, empty docs, id column") {
    import graft.text.BpeFunctions
    BpeFunctions.register(spark)
    withDocs(Seq(1L -> "The value, the value!", 2L -> "", 3L -> "   ",
        4L -> "👍 The 👍")) { dir =>
      val rows = TextQueries.t14.query(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> ((r.getInt(2), r.getLong(3)))).toMap
      // norm = "the value, the value!": pieces the/value/,/the/value/!
      assert((rows - ((4L, "the")) - ((4L, "👍"))) == Map(
        (1L, "the") -> ((graft.text.Bpe.MergedIdBase + 1, 2L)),
        (1L, "value") -> ((graft.text.Bpe.MergedIdBase + 5, 2L)),
        (1L, ",") -> ((','.toInt, 1L)),
        (1L, "!") -> (('!'.toInt, 1L))), rows)
      // empty/blank docs produce no token rows at all (no null tokens)
      assert(!rows.keys.exists(_._1 == 2L) && !rows.keys.exists(_._1 == 3L))
      // a supplementary character survives the whole doc pipeline as one
      // token with its real code point (not two mangled surrogates)
      assert(rows((4L, "👍")) == ((0x1f44d, 2L)), rows)
      assert(rows((4L, "the")) == ((graft.text.Bpe.MergedIdBase + 1, 1L)), rows)
    }
  }

  test("t11/t13 opt-in real-token mode: packing offsets and chunks in BPE tokens") {
    import graft.text.BpeFunctions
    import graft.text.TextFunctions.normText
    BpeFunctions.register(spark)
    // "the value" = 2 BPE tokens (vs 2 words), "q q q" = 3, "inin x" = 3
    withDocs(Seq(1L -> "the value", 2L -> "q q q", 3L -> "inin x")) { dir =>
      val d = Tables.documents(spark, dir).withColumn("norm", normText(col("text")))
      val packed = TextQueries.packSequences(
        d.select(col("doc_id"),
          org.apache.spark.sql.functions.size(expr("bpe_tokens(norm)")).as("n_tokens")),
        budget = 4)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
      // offsets are the cumulative REAL token counts: 0, 2, 5; seq budget 4
      assert(packed == Map(
        1L -> ((2, 0L, 0L)), 2L -> ((3, 2L, 0L)), 3L -> ((3, 5L, 1L))), packed)
      val chunks = TextQueries.chunkTokens(
        d.select(col("doc_id"), expr("bpe_tokens(norm)").as("toks")), size = 2, stride = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(4)).toMap
      // doc 3 = [in, in, x] → chunks ["in in", "x"] measured in model tokens
      assert(chunks((3L, 0)) == "in in" && chunks((3L, 1)) == "x", chunks)
      assert(chunks((1L, 0)) == "the value")
    }
  }

  test("merges.txt loader: real-format fixture binds the session kernels to a model vocabulary; malformed files refuse") {
    import graft.text.{Bpe, BpeFunctions}
    import graft.text.TextFunctions.normText
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-merges")
    def write(name: String, lines: String*): String = {
      val f = dir.resolve(name)
      java.nio.file.Files.write(f, java.util.Arrays.asList(lines: _*))
      f.toString
    }
    // the standard format: #version header, one space-separated pair
    // per line, rank = line order
    val path = write("merges.txt",
      "#version: 0.2", "t h", "th e", "h e", "l l", "he ll", "hell o")
    val merges = Bpe.loadMerges(path)
    assert(merges == Vector(("t", "h"), ("th", "e"), ("h", "e"), ("l", "l"),
      ("he", "ll"), ("hell", "o")))
    // the loaded vocabulary encodes with ITS ranks: "hello" chains
    // through he/ll/hell/hello, while the pinned fixture's chains
    // ("value") don't exist here
    val vocab = new Bpe.Vocab(merges)
    assert(vocab.encodePiece("hello").toSeq == Seq("hello"))
    assert(vocab.encodePiece("the").toSeq == Seq("the"))
    assert(vocab.encodePiece("value").toSeq == "value".map(_.toString))
    // merged ids live past MAX_CODE_POINT so they can never collide
    // with a single character's code point (e.g. 'Ā' = U+0100 = 256)
    assert(vocab.tokenId("hello") == Bpe.MergedIdBase + 5 &&
      vocab.tokenId("th") == Bpe.MergedIdBase)
    assert(vocab.tokenId("Ā") == 0x100, "single-char ids stay code points")
    // session binding: the re-registered kernels drive the DataFrame
    // path with the loaded vocabulary (the Runner --bpe-merges flow)
    BpeFunctions.register(spark, vocab)
    try {
      withDocs(Seq(1L -> "Hello the value")) { d =>
        val toks = Tables.documents(spark, d)
          .withColumn("norm", normText(col("text")))
          .select(explode(expr("bpe_tokens(norm)")).as("tok"))
          .withColumn("id", expr("bpe_token_id(tok)"))
          .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
        assert(toks.take(2) == Seq(("hello", Bpe.MergedIdBase + 5),
          ("the", Bpe.MergedIdBase + 1)), toks)
        assert(toks.drop(2).map(_._1) == Seq("v", "a", "l", "u", "e"), toks)
      }
    } finally BpeFunctions.register(spark) // restore the pinned default
    // the default (oracle-bound) vocabulary is untouched by the load
    assert(Bpe.encodePiece("value").toSeq == Seq("value"))
    assert(Bpe.tokenId("the") == Bpe.MergedIdBase + 1)
    // refusals: a silently skipped line would shift every later rank
    val e1 = intercept[RuntimeException](
      Bpe.loadMerges(write("bad.txt", "#version: 0.2", "a b c")))
    assert(e1.getMessage.contains("expected 'A B'"), e1.getMessage)
    val e2 = intercept[RuntimeException](
      Bpe.loadMerges(write("dup.txt", "a b", "c d", "a b")))
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
    val e3 = intercept[RuntimeException](
      Bpe.loadMerges(write("empty.txt", "#version: 0.2", "")))
    assert(e3.getMessage.contains("no merges"), e3.getMessage)
  }

  test("loadVocab arbitrates pre-tokenization mode: byte-level vocabularies auto-detect, fixture-dead merges refuse loudly") {
    import graft.text.Bpe
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-vocab")
    def write(name: String, content: String): String = {
      val f = dir.resolve(name)
      java.nio.file.Files.write(f, content.getBytes("UTF-8"))
      f.toString
    }
    // a GPT-2-style byte-level file: Ġ (U+0120) marks a leading space.
    // Auto-detected; its merges FIRE (they'd all be dead under the
    // fixture pre-tokenizer, which lowercases and strips spaces)
    val bl = Bpe.loadVocab(write("bl.txt",
      "#version: 0.2\nĠ t\nĠt h\nĠth e\nT h\nTh e\nh e"))
    assert(bl.byteLevel, "Ġ in a symbol must select byte-level mode")
    val toks = bl.encodeDoc(org.apache.spark.unsafe.types.UTF8String
      .fromString("The the")).toArray[AnyRef](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(toks == Seq("The", "Ġthe"), toks)
    // lossless by construction: unmapped token bytes reproduce the text
    assert(new String(Bpe.unmapBytes(toks), "UTF-8") == "The the")
    // case-sensitive merges fire in byte mode ("The"), and ids stay
    // injective: single chars are code points, merges live past them
    assert(bl.tokenId("The") == Bpe.MergedIdBase + 4)
    assert(bl.tokenId("Ġ") == 0x120)

    // a case-sensitive vocabulary with NO byte markers: unreachable
    // under the fixture pre-tokenizer -> the auto load must FAIL, not
    // silently inflate token counts
    val deadPath = write("dead.txt", "#version: 0.2\nT h\nTh e\nt h")
    val e = intercept[RuntimeException](Bpe.loadVocab(deadPath))
    assert(e.getMessage.contains("can never fire"), e.getMessage)
    // the explicit opt-in loads (and warns on stderr)
    val forced = Bpe.loadVocab(deadPath, byteLevel = Some(false))
    assert(!forced.byteLevel && forced.merges.size == 3)
    // forcing byte-level is also allowed — the merges are reachable there
    assert(Bpe.loadVocab(deadPath, byteLevel = Some(true)).byteLevel)
  }

  test("byte-level training: learned merges carry byte markers, round-trip merges.txt into auto-detected byte mode, and encode losslessly") {
    import graft.text.Bpe
    // a tiny raw-cased corpus: byte-level training pre-tokenizes with
    // the GPT-2 regex (space-prefixed pieces) and maps bytes, so the
    // learned merges MUST contain remapped byte chars (Ġ = space)
    val texts = (0 until 50).flatMap(_ => Seq(
      "The cat sat on the mat", "The dog sat on the log",
      "Cats and dogs, dogs and cats!"))
    val merges = Bpe.trainFromTexts(texts, 60, byteLevel = true)
    assert(merges.nonEmpty)
    assert(merges.exists { case (a, b) => (a + b).contains('Ġ') },
      s"byte-level training must learn Ġ-marked merges: ${merges.take(10)}")
    // round-trip: the file format is plain text (every byte maps to a
    // PRINTABLE char), and loadVocab auto-detects byte mode from it
    val path = java.nio.file.Files.createTempDirectory("graft-bpe-bl")
      .resolve("merges.txt")
    java.nio.file.Files.write(path, Bpe.mergesFileContent(merges).getBytes("UTF-8"))
    val vocab = Bpe.loadVocab(path.toString)
    assert(vocab.byteLevel && vocab.merges == merges)
    // lossless by construction on arbitrary raw text — case, spaces,
    // punctuation, non-ASCII all survive the byte mapping
    val raw = "The cat — sat; on the MAT? Ärger 10x!"
    val toks = vocab.encodeDoc(org.apache.spark.unsafe.types.UTF8String
      .fromString(raw)).toArray[AnyRef](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(new String(Bpe.unmapBytes(toks), "UTF-8") == raw)
    // trained merges actually fire on in-domain text
    val inDomain = vocab.encodeDoc(org.apache.spark.unsafe.types.UTF8String
      .fromString("The cat sat on the mat")).numElements()
    assert(inDomain < "The cat sat on the mat".length / 2,
      s"trained byte-level merges must compress in-domain text: $inDomain tokens")
  }

  test("t15: the pinned trained byte-level vocabulary is deterministic; the query's tokens merge, id cleanly, and unmap losslessly") {
    import graft.text.Bpe
    val v = TextQueries.t15Vocab
    // training runs to pair exhaustion on this fixture (108 merges;
    // the 120 passed to train is a cap, not a target)
    assert(v.byteLevel && v.merges.size == 108, v.merges.size)
    // deterministic training: an independent run derives the identical
    // ranked merges — the oracle SQL is generated from this vector, so
    // any nondeterminism here would be a silent gate flake
    assert(Bpe.trainFromTexts(TextQueries.t15TrainCorpus, 120,
      byteLevel = true) == v.merges)
    val out = TextQueries.t15.query(spark, sfDir).persist()
    try {
      assert(out.count() > 0)
      // trained merges FIRE on the real corpus (multi-char tokens with
      // ids in the merged space), and every token resolves to an id
      assert(out.filter(col("token_id") >= Bpe.MergedIdBase).count() > 0,
        "no merged tokens — the trained vocabulary never fired")
      assert(out.filter(col("token_id") === -1).count() == 0,
        "encoder output must always resolve to a vocabulary id")
      // byte-level contract on the real data: one doc's raw text
      // round-trips through encode → unmap bit-identically
      val doc = Tables.documents(spark, sfDir).orderBy("doc_id")
        .select("text").head.getString(0)
      val toks = v.encodeDoc(org.apache.spark.unsafe.types.UTF8String
        .fromString(doc)).toArray[AnyRef](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(new String(Bpe.unmapBytes(toks), "UTF-8") == doc)
    } finally { out.unpersist(); () }
  }

  test("realistic-size vocabulary: thousands of trained merges round-trip merges.txt and drive the codegen kernel") {
    import graft.text.{Bpe, BpeFunctions}
    import graft.text.TextFunctions.normText
    // the driver corpus has only ~31 distinct words — far too few for a
    // realistic vocabulary. Build a deterministic Zipf-distributed
    // lexicon from English syllables instead (shared subword structure
    // is exactly what BPE training exploits) and train at real size:
    // proves the merge loop, the id space, and the codegen
    // reference-object path all hold at thousands of merges.
    val syll = Vector("a", "ab", "al", "an", "ar", "at", "con", "de", "dis",
      "e", "en", "er", "es", "ic", "in", "ing", "ion", "is", "it", "le",
      "ly", "ment", "ness", "o", "on", "or", "ous", "pre", "pro", "re",
      "st", "ter", "th", "ti", "tion", "un", "ure", "us", "ve", "qu")
    def word(i: Int): String = {
      // avalanche the (i, j) pair so adjacent-syllable combinations
      // cover the full pair space — a linear mix yields only |syll|
      // distinct adjacencies and the training exhausts at ~150 merges
      def syl(j: Int): Int = {
        var h = i * 1000003 + j * 7919
        h ^= h >>> 13; h *= 0x5bd1e995; h ^= h >>> 15
        math.abs(h) % syll.size
      }
      val n = 2 + i % 3
      (0 until n).map(j => syll(syl(j))).mkString
    }
    val lexicon = (0 until 6000).map(word).distinct
    val pieceCounts: Map[String, Long] = lexicon.zipWithIndex
      .map { case (w, i) => w -> math.max(1L, 6000L / (i + 1)) }.toMap
    val t0 = System.nanoTime()
    val merges = Bpe.train(pieceCounts, 3000)
    val trainSec = (System.nanoTime() - t0) / 1e9
    assert(merges.size >= 2000,
      s"expected a realistic vocabulary, got ${merges.size} merges")
    // round-trip through the standard file format + the load-time checks
    val path = java.nio.file.Files.createTempDirectory("graft-bpe-big")
      .resolve("merges.txt")
    java.nio.file.Files.write(path, Bpe.mergesFileContent(merges).getBytes("UTF-8"))
    val vocab = Bpe.loadVocab(path.toString)
    assert(!vocab.byteLevel && vocab.merges == merges)
    // the most frequent word must fully merge; ids must stay injective
    // across the whole merged space (the MergedIdBase guarantee)
    assert(vocab.encodePiece(lexicon.head).length == 1)
    assert(vocab.tokenId(vocab.encodePiece(lexicon.head).head) >= Bpe.MergedIdBase)
    // the loaded vocabulary rides the plan as a codegen reference
    // object — prove the full Spark path at real vocabulary size
    BpeFunctions.register(spark, vocab)
    try {
      val docs = (0 until 2000).map { d =>
        (d.toLong, (0 until 30).map(k => lexicon(
          math.abs(d * 131 + k * k * 7) % lexicon.size)).mkString(" "))
      }.toDF("doc_id", "text")
      val t1 = System.nanoTime()
      val stats = docs
        .withColumn("norm", normText(col("text")))
        .select(explode(expr("bpe_tokens(norm)")).as("tok"))
        .withColumn("id", expr("bpe_token_id(tok)"))
        .agg(count(lit(1)), sum(length(col("tok"))), min(col("id")),
          count(when(col("id") >= Bpe.MergedIdBase, 1)))
        .head()
      val encodeSec = (System.nanoTime() - t1) / 1e9
      val (nTok, nChar, minId) = (stats.getLong(0), stats.getLong(1), stats.getInt(2))
      val nMerged = stats.getLong(3)
      assert(nTok > 0 && nChar > nTok * 2,
        s"a trained vocabulary must actually merge: $nTok tokens / $nChar chars")
      assert(nMerged > nTok / 2,
        s"most tokens should be merged symbols at this vocab size: $nMerged of $nTok")
      assert(minId >= 0, "every encoder output token must have an id")
      info(f"trained ${merges.size} merges in $trainSec%.1f s; " +
        f"encoded 60k words -> $nTok tokens ($nMerged merged) in $encodeSec%.1f s")
    } finally BpeFunctions.register(spark) // restore the pinned default
  }
}
