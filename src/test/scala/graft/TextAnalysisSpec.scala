package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "der hund und die katze und das haus", "de"),
      (2L, "word", "en")
    ).toDF("doc_id", "text", "lang")
  }

  test("bigram LM proxy: shuffled text scores rare transitions; single-token docs drop out") {
    import spark.implicits._
    val d = Seq(
      (0L, "the cat sat", "en"),
      (1L, "the cat sat", "en"),       // duplicate: its transitions are common
      (2L, "cat the sat", "en"),       // same tokens, shuffled: transitions unique
      (3L, "word", "en")               // no bigrams — must not appear
    ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.bigramLmStats(d).orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // docs 0/1 share both transitions ("the cat", "cat sat") -> freq 2 each
    assert(r(0).getAs[Long]("n_bigrams") == 2 &&
      r(0).getAs[Double]("mean_bigram_freq") == 2.0 &&
      r(0).getAs[Long]("min_bigram_freq") == 2 &&
      r(0).getAs[Long]("n_singletons") == 0)
    // doc 2's transitions exist nowhere else: all singletons
    assert(r(2).getAs[Long]("min_bigram_freq") == 1 &&
      r(2).getAs[Long]("n_singletons") == 2)
  }

  test("token stats: counts, types, TTR, mean length") {
    val r = TextAnalysis.tokenStats(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_tokens") == 6)
    assert(r(0).getAs[Int]("n_types") == 5)           // 'the' twice
    assert(r(0).getAs[Double]("type_token_ratio") == 5.0 / 6)
    // "the cat sat on the mat" = 22 chars, 17 non-space / 6 tokens
    assert(r(0).getAs[Double]("mean_token_len") == 17.0 / 6)
    assert(r(2).getAs[Int]("n_tokens") == 1)
  }

  test("language id: stopword ratios pick the labeled language") {
    val r = TextAnalysis.languageId(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[String]("predicted_lang") == "en")
    assert(r(1).getAs[String]("predicted_lang") == "de")
    assert(r(2).getAs[String]("predicted_lang") == "en")   // no signal → default
  }

  test("BPE pair census: adjacent pairs counted corpus-wide, ties broken by pair") {
    import spark.implicits._
    val tiny = Seq(
      (0L, "a b a b c"),     // pairs: a b, b a, a b, b c
      (1L, "a b"),           // pair:  a b
      (2L, "x")              // single token → no pairs
    ).toDF("doc_id", "text")
    val top = TextAnalysis.bpePairCensus(tiny, topN = 10).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("freq"))).toSeq
    assert(top == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("fingerprint is order- and repetition-insensitive") {
    import spark.implicits._
    val perm = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "mat on sat cat the"),            // same token set, permuted
      (2L, "a completely different text")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(perm).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
  }

  test("token frequencies count the corpus histogram") {
    val freq = TextAnalysis.tokenFrequencies(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq("the") == 2L)
    assert(freq("und") == 2L)
    assert(freq("cat") == 1L)
  }

  test("CDC chunks tile the document and re-synchronize after a prefix edit") {
    import spark.implicits._
    val text = {
      var seed = 42L
      Array.fill(600) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        ('a' + (math.abs(seed >>> 17) % 26).toInt).toChar
      }.mkString
    }
    val cdcDocs = Seq((1L, text), (2L, "XYZ" + text)).toDF("doc_id", "text")
    val rows = TextAnalysis.cdcChunks(cdcDocs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_no"),
        r.getAs[Int]("start"), r.getAs[Int]("chunk_len"), r.getAs[Long]("chunk_hash")))
    val byDoc = rows.groupBy(_._1).map { case (d, cs) => d -> cs.sortBy(_._2) }
    // chunks tile the text exactly: start at 1, contiguous, lengths sum to L
    byDoc.foreach { case (d, cs) =>
      val len = if (d == 1L) 600 else 603
      assert(cs.head._3 == 1)
      cs.sliding(2).foreach { case Array(a, b) => assert(b._3 == a._3 + a._4) case _ => }
      assert(cs.map(_._4).sum == len)
      assert(cs.length > 3, s"divisor 64 should cut ~600 chars into several chunks, got ${cs.length}")
    }
    // content-defined property: after the 3-char prefix insert, boundaries
    // re-sync, so all but the leading chunk hashes are shared
    val h1 = byDoc(1L).map(_._5).toSet
    val h2 = byDoc(2L).map(_._5).toSet
    assert((h1 intersect h2).size >= h1.size - 2,
      s"CDC must re-sync after an edit: ${h1.size} vs shared ${(h1 intersect h2).size}")
  }

  test("repetition stats flag repeated tokens and bigrams; rarity reflects corpus frequency") {
    import spark.implicits._
    val d = Seq(
      (1L, "spam spam spam spam ham"),          // top token 4/5
      (2L, "a b a b a b a b"),                  // all bigrams duplicated
      (3L, "one two three four five"),          // clean
      (4L, "solo")                              // single token: no bigrams
    ).toDF("doc_id", "text")
    val rep = TextAnalysis.repetitionStats(d).orderBy("doc_id").collect()
    assert(rep(0).getAs[Double]("top_token_frac") == 0.8 && rep(0).getAs[Boolean]("is_repetitive"))
    // 7 bigrams, 2 distinct ("a b", "b a") → 5/7 duplicated
    assert(rep(1).getAs[Double]("dup_bigram_frac") == 5.0 / 7)
    assert(!rep(2).getAs[Boolean]("is_repetitive"))
    assert(rep(3).getAs[Double]("dup_bigram_frac") == 0.0)
    val rar = TextAnalysis.rarityStats(d).orderBy("doc_id").collect()
    // doc 3's tokens are corpus-unique → mean freq 1; doc 1's 'spam' has freq 4
    assert(rar(2).getAs[Double]("mean_token_freq") == 1.0)
    assert(rar(0).getAs[Double]("mean_token_freq") == (4 * 4 + 1).toDouble / 5)
    assert(rar(0).getAs[Long]("min_token_freq") == 1L)  // 'ham'
  }

  test("PII redaction counts and scrubs emails and long digit runs") {
    import spark.implicits._
    val pii = Seq(
      (1L, "call 5551234567 or mail bob.smith@mail.example now"),
      (2L, "short 123456 stays, 12345678 goes"),
      (3L, "nothing sensitive here"),
      (4L, "Write John.Doe@Example.COM today"),          // mixed case must match
      (5L, "acct 12345678@corp.example only")             // digits inside the email: ONE category
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(pii).orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_emails") == 1 && r(0).getAs[Int]("n_long_numbers") == 1)
    assert(r(1).getAs[Int]("n_emails") == 0 && r(1).getAs[Int]("n_long_numbers") == 1)
    assert(r(2).getAs[Int]("n_emails") == 0 && r(2).getAs[Int]("n_long_numbers") == 0)
    assert(r(3).getAs[Int]("n_emails") == 1 && r(3).getAs[Int]("n_long_numbers") == 0)
    assert(r(4).getAs[Int]("n_emails") == 1 && r(4).getAs[Int]("n_long_numbers") == 0,
      "an email's digits must not be double-counted as a long number")
    // the scrubbed text really has the PII replaced (6-digit run survives)
    val scrubbed = pii.select(org.apache.spark.sql.functions.col("doc_id"),
        TextAnalysis.redacted("<PII>").as("t"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(scrubbed(0) == "call <PII> or mail <PII> now")
    assert(scrubbed(1) == "short 123456 stays, <PII> goes")
    assert(scrubbed(2) == "nothing sensitive here")
    assert(scrubbed(3) == "Write <PII> today")
    assert(scrubbed(4) == "acct <PII> only")
  }

  test("redaction token with replacement metacharacters stays literal; digit tokens rejected") {
    import spark.implicits._
    val pii = Seq((1L, "mail a@b.example now")).toDF("doc_id", "text")
    // '$' starts a group reference and '\' escapes it under Java
    // replacement semantics (an unquoted bare '$' even throws) — both
    // must land in the output verbatim
    val scrubbed = pii.select(TextAnalysis.redacted("[$\\x]").as("t"))
      .collect().head.getString(0)
    assert(scrubbed == "mail [$\\x] now")
    // a digit-bearing token would itself match the long-digit-run pass
    intercept[IllegalArgumentException] { TextAnalysis.redacted("<PII1234567>") }
    intercept[IllegalArgumentException] {
      TextAnalysis.redactPii(pii, "<X9>").collect()
    }
  }

  test("normalization composes NFC, folds case, collapses whitespace") {
    import spark.implicits._
    // decomposed e + combining acute, decomposed u + combining diaeresis:
    // NFC must compose them BEFORE hashing so byte-distinct spellings of
    // the same rendered text normalize identically
    val decomposed = "Cafe\u0301   MU\u0308NCHEN\t visit "
    val composed = "caf\u00e9 m\u00fcnchen visit"
    val out = TextAnalysis.withNormalizedText(
        Seq((1L, decomposed), (2L, "  plain   ascii TEXT "), (3L, composed))
          .toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(_.getAs[String]("norm_text"))
    assert(out(0) == composed)
    assert(out(1) == "plain ascii text")
    assert(out(2) == composed) // pre-composed input is a fixpoint
  }

  test("CDC chunks are correct on non-ASCII text (code-point positions)") {
    import spark.implicits._
    // Mixed-width text: 1-byte ASCII, 2-byte umlauts, 3-byte CJK, and a
    // 4-byte supplementary-plane emoji — every UTF-8 width class.
    val text = {
      val alphabet = "abcdefäöüßéàç漢字測試文🎉 ".toCharArray // includes surrogate pair
      val cps = alphabet.mkString.codePoints().toArray
      var seed = 7L
      val sb = new java.lang.StringBuilder
      (1 to 500).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.appendCodePoint(cps((math.abs(seed >>> 17) % cps.length).toInt))
      }
      sb.toString
    }
    val nCps = text.codePointCount(0, text.length)
    val cdcDocs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = TextAnalysis.cdcChunks(cdcDocs).collect()
      .map(r => (r.getAs[Int]("chunk_no"), r.getAs[Int]("start"),
        r.getAs[Int]("chunk_len"), r.getAs[Long]("chunk_hash")))
      .sortBy(_._1)
    // chunks tile the CODE-POINT length (not the byte length, which is larger)
    assert(rows.head._2 == 1)
    rows.sliding(2).foreach { case Array(a, b) => assert(b._2 == a._2 + a._3) case _ => }
    assert(rows.map(_._3).sum == nCps,
      s"chunk lengths must sum to code-point count $nCps (byte len ${text.getBytes("UTF-8").length})")
    // each chunk_hash equals the rolling hash of the code-point slice the
    // (start, chunk_len) coordinates address — i.e. boundaries and substring
    // agree on the unit
    def rh(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((acc, c) => (acc * 131L + c) % 1000000007L)
    val cpArr = text.codePoints().toArray
    rows.foreach { case (_, start, len, hash) =>
      val slice = new String(cpArr.slice(start - 1, start - 1 + len), 0, len)
      assert(rh(slice) == hash, s"chunk at $start len $len: hash mismatch")
    }
  }

  test("BM25 ranking: tf raises, doc length penalizes, rare terms outscore common") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y p q"),     // tf(x)=2, dl=5
      (2L, "x y p q r"),     // tf(x)=1, dl=5
      (3L, "x z"),           // tf(x)=1, dl=2  (shorter -> beats doc 2)
      (4L, "y p q r s")      // no x
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq("x", "z"), topN = 4)
      .orderBy("term", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(6)))
    val xs = out.filter(_._1 == "x")
    // tf monotone at equal dl: doc1 (tf 2) above doc2 (tf 1); length
    // normalization: doc3 (tf 1, dl 2) above doc2 (tf 1, dl 5)
    assert(xs.map(_._3).toSeq == Seq(1L, 3L, 2L))
    // z appears once in the corpus: its idf beats x's everywhere
    val zTop = out.filter(_._1 == "z").head
    assert(zTop._3 == 3L && zTop._4 > xs.head._4)
    // scores strictly ordered with rank
    assert(xs.sliding(2).forall { case Array(a, b) => a._4 >= b._4 case _ => true })
    // partitioning cannot move a rank
    val out2 = TextAnalysis.bm25TopK(docs.repartition(7), Seq("x", "z"), topN = 4)
      .orderBy("term", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(6)))
    assert(out2.toSeq == out.toSeq)
  }

  test("collocations: pair that always co-occurs outranks independent pair; floor filters hapax") {
    import spark.implicits._
    // "a b" always adjacent (5 times); "x y" co-occur but x,y also appear
    // apart (x 10 times, y 10 times, together 5); "q z" occurs once (hapax)
    val docs = Seq(
      (1L, "a b x p x p y r y r"),
      (2L, "a b x p x p y r y r"),
      (3L, "a b x y q z"),
      (4L, "a b x y m m"),
      (5L, "a b x y m m")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.collocationTopK(docs, minCount = 3L, topN = 10).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(5))).toMap
    // hapax pair filtered by the count floor
    assert(!out.contains(("q", "z")))
    // exclusive pair (a,b): c_xy=5, c_x=5, c_y=5 -> T*5/25; diluted pair
    // (x,y): c_xy=3, c_x=10, c_y=8 -> strictly smaller score
    assert(out(("a", "b")) > out(("x", "y")))
    // determinism across partitioning
    val out2 = TextAnalysis.collocationTopK(docs.repartition(7), minCount = 3L, topN = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(5))).toMap
    assert(out2 == out)
  }

  test("inverted index: incremental add is idempotent, served search == direct scan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y p q"), (2L, "x y y p r"), (3L, "x z q q r"), (4L, "y p q r s")
    ).toDF("doc_id", "text")
    val postings = graft.stages.MergeTable.scratch(Seq("term", "doc_id"))
    val stats = graft.stages.MergeTable.scratch(Seq("doc_id"))
    TextAnalysis.invertedIndexBuild(docs.filter($"doc_id" <= 2), postings, stats)
    TextAnalysis.invertedIndexAdd(docs.filter($"doc_id" > 2), postings, stats)
    def searched = TextAnalysis.invertedIndexSearch(spark, postings, stats,
        Seq("x", "q"), topN = 3)
      .orderBy("term", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(6))).toSeq
    val direct = TextAnalysis.bm25TopK(docs, Seq("x", "q"), topN = 3)
      .orderBy("term", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(6))).toSeq
    val first = searched
    assert(first == direct, "index-served search must equal the direct scan")
    // replaying the add (failure re-run) changes nothing
    TextAnalysis.invertedIndexAdd(docs.filter($"doc_id" > 2), postings, stats)
    assert(searched == first)
  }

  test("BPE merge kernel: greedy left-to-right, runs merge alternating from the left") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, lit}
    graft.functions.GraftFunctions.register(spark)
    val t = Seq(
      (1L, Seq("x", "x", "x")),           // -> [xx, x], never [x, xx]
      (2L, Seq("x", "x", "x", "x")),      // -> [xx, xx]
      (3L, Seq("a", "x", "x", "b")),      // -> [a, xx, b]
      (4L, Seq("x")),                     // no pair
      (5L, Seq.empty[String])             // empty
    ).toDF("id", "toks")
      .withColumn("m", call_function("graft_bpe_merge", col("toks"), lit("x"), lit("x")))
      .orderBy(col("id")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    assert(t(1L) == Seq("xx", "x"))
    assert(t(2L) == Seq("xx", "xx"))
    assert(t(3L) == Seq("a", "xx", "b"))
    assert(t(4L) == Seq("x"))
    assert(t(5L) == Seq.empty)
  }

  test("BPE training: hand-computed merges and tokenizer application on a tiny vocab") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // corpus words: "aaab" x3, "ab" x2 -> round 1 pairs: (a,a):6 [two per
    // aaab], (a,b):5, so merge1 = (a,a) freq 6 ("aaab" -> [aa,a,b] greedily);
    // round 2: (aa,a):3, (a,b):5 -> merge2 = (a,b)?? careful: after merge1,
    // "aaab" = [aa, a, b] with pairs (aa,a):3, (a,b):3; "ab" = [a, b] with
    // (a,b):2 -> (a,b):5 wins round 2; round 3: "aaab" = [aa, ab] -> (aa,ab):3
    val d = Seq(
      (0L, "aaab aaab ab"),
      (1L, "aaab ab")
    ).toDF("doc_id", "text")
    val (merges, vocab) = TextAnalysis.bpeTrain(d, rounds = 3)
    val m = merges.orderBy(col("round")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "a", 6L), (2, "a", "b", 5L), (3, "aa", "ab", 3L)))
    val v = vocab.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(v("aaab") == Seq("aaab"))
    assert(v("ab") == Seq("ab"))
    val applied = TextAnalysis.bpeApply(d, vocab).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0: 3 words, symbols 1+1+1, chars 4+4+2; doc 1: 2 words
    assert(applied.toSeq == Seq((0L, 3L, 3L, 10L), (1L, 2L, 2L, 6L)))
  }

  test("unigram Viterbi kernel: multi-piece wins, ties prefer shortest, OOV falls back to chars") {
    graft.functions.GraftFunctions.register(spark)
    def seg(word: String, pieces: Seq[String], probs: Seq[Double]): Seq[String] = {
      import org.apache.spark.sql.functions.{call_function, lit, typedLit}
      spark.range(1).select(call_function("graft_unigram_segment",
          lit(word), typedLit(pieces), typedLit(probs), lit(4)).as("s"))
        .collect().head.getSeq[String](0)
    }
    // "ab" piece beats the char path: 0.6 > 0.2*0.2
    assert(seg("abab", Seq("a", "b", "ab"), Seq(0.2, 0.2, 0.6)) == Seq("ab", "ab"))
    // exact tie (0.5*0.5 vs 0.25): strict-greater scan keeps the SHORTER piece
    assert(seg("aa", Seq("a", "aa"), Seq(0.5, 0.25)) == Seq("a", "a"))
    // out-of-vocabulary char is emitted as its own zero-probability piece
    assert(seg("axb", Seq("a", "b"), Seq(0.5, 0.5)) == Seq("a", "x", "b"))
    assert(seg("", Seq("a"), Seq(1.0)) == Seq())
  }

  test("unigram training: planted frequent bigram enters the vocab and survives pruning") {
    import spark.implicits._
    // 'xy' dominates: seed census must rank it top multi, round-1 Viterbi
    // must USE it (usage count > 0), and it must survive the prune
    val d = Seq((0L, "xy xy xy xy zq"), (1L, "xy xy w"))
      .toDF("doc_id", "text")
    val (counts, segd) = TextAnalysis.unigramTrain(d)
    val byRound = counts.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val r2 = byRound.filter(_._1 == 2)
    assert(r2.exists { case (_, p, c) => p == "xy" && c == 6L },
      s"round-2 census must count 6 freq-weighted uses of 'xy': ${r2.toSeq}")
    val segs = segd.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segs("xy") == Seq("xy"), "the planted bigram segments as one piece")
    val applied = TextAnalysis.unigramApply(d, segd).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0: 5 words → 4×[xy] + zq-as-pieces; chars 2*4+2=10
    assert(applied.head._1 == 0L && applied.head._2 == 5L && applied.head._4 == 10L)
  }

  test("WordPiece greedy longest-match: whole-word pieces win, 5-char word takes 4+1, fallback covers") {
    import spark.implicits._
    // every ≤4-char word is its own substring and lands in the seed vocab
    // (all substrings counted), so it segments as ONE piece; "abcde" has
    // no 5-char piece (maxPieceLen=4) → greedy takes "abcd" then "e".
    val d = Seq((0L, "abcde ab"), (1L, "abcd abcd cd")).toDF("doc_id", "text")
    val rows = graft.ops.TextAnalysis.wordpieceApply(d)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0: abcde → 2 pieces, ab → 1; 2 words, 3 pieces, 7 chars
    assert(rows(0) == ((0L, 2L, 3L, 7L)), s"doc 0: ${rows(0)}")
    // doc 1: abcd → 1, abcd → 1, cd → 1; 3 words, 3 pieces, 10 chars
    assert(rows(1) == ((1L, 3L, 3L, 10L)), s"doc 1: ${rows(1)}")
  }
}
