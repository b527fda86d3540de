package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis, TrainPrep}

/** Training-prep operator semantics: sampling determinism, packing
  * tiling/content-addressing, and decontamination hit accounting.
  */
class TrainPrepSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("stratified sample is deterministic and rate-shaped per language") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i =>
      (i, s"tok${i % 7} tok${i % 11} tok${i % 13}",
        Seq("en", "de", "zh")(  (i % 3).toInt ))).toDF("doc_id", "text", "lang")
    val rates = Map("en" -> 10, "de" -> 50, "zh" -> 100)
    val s1 = TrainPrep.stratifiedSample(docs, rates).select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = TrainPrep.stratifiedSample(docs.repartition(13), rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "hash-bucket sampling must not depend on partitioning")
    val census = TrainPrep.sampleCensus(docs, rates).collect()
      .map(r => r.getAs[String]("lang") -> (r.getAs[Long]("n_sampled"), r.getAs[Long]("n_total"))).toMap
    // zh rate 100 keeps everything; others land near their rate
    assert(census("zh")._1 == census("zh")._2)
    val enRate = census("en")._1.toDouble / census("en")._2
    assert(enRate > 0.02 && enRate < 0.25, s"en achieved rate $enRate far from 10%")
  }

  test("range shards: two-level composition == direct ntile arithmetic across size regimes") {
    import spark.implicits._
    // regimes that exercise every branch of the rank->tile arithmetic:
    // N < shards (all-wide-tiles branch), N == shards, N divisible
    // (r == 0: first branch empty), remainders on both sides, and a size
    // spanning many buckets of the two-level composition
    for (n <- Seq(1, 3, 7, 8, 9, 16, 103, 240); shards <- Seq(5, 8)) {
      val docs = (0 until n).map(i => (i.toLong, ((i * 37) % 101 + 1).toLong))
        .toDF("doc_id", "n_chars")
      val got = TrainPrep.rangeShardCensus(docs, shards, bucketWidth = 16L)
        .orderBy("shard").collect()
        .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("lo_chars"), r.getAs[Long]("hi_chars")))
      // reference: explicit ntile over the sorted keys
      val sorted = (0 until n).map(i => (i.toLong, ((i * 37) % 101 + 1).toLong))
        .sortBy(t => (t._2, t._1))
      val q = n / shards; val r = n % shards
      val expected = sorted.zipWithIndex.map { case ((_, chars), idx) =>
        val k = idx + 1
        val tile =
          if (k <= (q + 1) * r) (k + q) / (q + 1)
          else r + (k - (q + 1) * r + q - 1) / math.max(q, 1)
        (tile, chars)
      }.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
        (t, g.size.toLong, g.map(_._2).min, g.map(_._2).max)
      }
      assert(got.toSeq == expected, s"n=$n shards=$shards")
    }
  }

  test("range shards: equal populations (ntile), ordered non-overlapping boundaries") {
    import spark.implicits._
    val docs = (0L until 103L).map(i => (i, (i * 37) % 101 + 1))
      .toDF("doc_id", "n_chars")
    val census = TrainPrep.rangeShardCensus(docs, shards = 8)
      .orderBy("shard").collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("lo_chars"), r.getAs[Long]("hi_chars")))
    assert(census.map(_._2).sum == 103L)
    // ntile: populations differ by at most 1, earlier shards get the extra
    assert(census.map(_._2).distinct.toSet.subsetOf(Set(12L, 13L)))
    assert(census.map(_._2).toSeq == census.map(_._2).toSeq.sorted.reverse)
    // boundaries ascend and never overlap (ties can only touch, not cross)
    census.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"shard ${a._1} hi ${a._4} crosses shard ${b._1} lo ${b._3}")
    }
  }

  test("packed sequences tile the token stream and are content-addressed") {
    import spark.implicits._
    val text = (1 to 150).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val seqs = TrainPrep.packSequences(docs, seqLen = 64)
      .orderBy("seq_no").collect()
      .map(r => (r.getAs[Int]("seq_no"), r.getAs[Int]("n_toks"), r.getAs[String]("seq_hash")))
    assert(seqs.map(_._2).toSeq == Seq(64, 64, 22))      // 150 = 64 + 64 + 22
    assert(seqs.map(_._1).toSeq == Seq(0, 1, 2))
    // content-addressing: same window content → same hash, regardless of doc
    val docs2 = Seq((2L, text)).toDF("doc_id", "text")
    val seqs2 = TrainPrep.packSequences(docs2, seqLen = 64)
      .orderBy("seq_no").collect().map(_.getAs[String]("seq_hash"))
    assert(seqs.map(_._3).toSeq == seqs2.toSeq)
  }

  test("FFD packing: perfect-fit corpus packs exactly, oversize docs censused out") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    // one shard (ids ≡ 0 mod 8); lengths 7,5,4,4,3,1 pack PERFECTLY into
    // three bins of 8 under FFD (7+1, 5+3, 4+4) — a greedy one-bin-at-a-
    // time packer would leak; plus one oversize doc (9 > 8)
    val docs = Seq(7, 5, 4, 4, 3, 1, 9).zipWithIndex
      .map { case (n, i) => (i * 8L, words(n)) }
      .toDF("doc_id", "text")
    val r = TrainPrep.ffdPackCensus(docs, capacity = 8, nShards = 8)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Int]("shard") == 0)
    assert(row.getAs[Long]("n_docs") == 6L)
    assert(row.getAs[Long]("total_tokens") == 24L)
    assert(row.getAs[Long]("n_bins_ffd") == 3L, s"FFD must pack 3 full bins, got $row")
    assert(row.getAs[Long]("ffd_waste") == 0L)
    assert(row.getAs[Long]("fill_e4") == 10000L)
    assert(row.getAs[Long]("baseline_waste") == 6L * 8 - 24L)
    assert(row.getAs[Long]("n_oversize") == 1L)
    assert(row.getAs[Long]("oversize_tokens") == 9L)
  }

  test("FFD packing: a shard whose docs are ALL oversize still surfaces in the census") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    // shard 0 packs normally; shard 1 (ids ≡ 1 mod 8) holds ONLY oversize
    // docs — it has no packing row, and the pre-r15 left join dropped it
    val docs = Seq((0L, words(5)), (8L, words(3)),
      (1L, words(9)), (9L, words(12))).toDF("doc_id", "text")
    val rows = TrainPrep.ffdPackCensus(docs, capacity = 8, nShards = 8)
      .orderBy("shard").collect()
    assert(rows.map(_.getAs[Int]("shard")).toSeq == Seq(0, 1),
      s"oversize-only shard must not vanish, got ${rows.mkString(";")}")
    val s1 = rows(1)
    assert(s1.getAs[Long]("n_docs") == 0L)
    assert(s1.getAs[Long]("n_bins_ffd") == 0L)
    assert(s1.isNullAt(s1.fieldIndex("fill_e4")),
      "fill over zero bins is undefined and must stay NULL")
    assert(s1.getAs[Long]("n_oversize") == 2L)
    assert(s1.getAs[Long]("oversize_tokens") == 21L)
  }

  test("split-then-pack: oversize doc becomes capacity windows + remainder, all tokens land in bins") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    // one shard: a 20-token doc at capacity 8 -> pieces 8, 8, 4; plus
    // in-capacity docs 5 and 3. FFD over (8,8,5,4,3): bins 8 | 8 | 5+3 | 4
    val docs = Seq((0L, words(20)), (8L, words(5)), (16L, words(3)))
      .toDF("doc_id", "text")
    val r = TrainPrep.splitPackCensus(docs, capacity = 8, nShards = 8).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") == 3L)
    assert(row.getAs[Long]("n_pieces") == 5L, s"20 -> 3 pieces + 2 docs, got $row")
    assert(row.getAs[Long]("n_overflow_pieces") == 2L)
    assert(row.getAs[Long]("total_tokens") == 28L, "every token packed, none censused out")
    assert(row.getAs[Long]("n_bins_ffd") == 4L, s"FFD(8,8,5,4,3) at cap 8 = 4 bins, got $row")
    assert(row.getAs[Long]("ffd_waste") == 4L * 8 - 28L)
  }

  test("bucketed prefix sum equals the global window cumsum; shards respect the budget") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // sparse, shuffled doc_ids so buckets are uneven and some are empty
    val docs = (0L until 3000L).filter(i => i % 7 != 0)
      .map(i => (i * 3, (1 to ((i % 50) + 1).toInt).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text").repartition(11)
    val scalable = TrainPrep.withTokenPrefix(docs, bucketWidth = 100)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens")))
    val global = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("cum", sum(col("n")).over(Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum")))
    assert(scalable.toSeq == global.toSeq)
    // shard boundaries: monotone, and each shard's span stays within one
    // budget of tokens (a document never splits, so spans can exceed the
    // budget only by the straddling document's length)
    val shards = TrainPrep.shardByTokenBudget(docs, budget = 500, bucketWidth = 100)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("cum_tokens"), r.getAs[Long]("n_tokens")))
    assert(shards.map(_._1).toSeq == shards.map(_._1).sorted.toSeq)
    shards.foreach { case (shard, cum, n) =>
      assert((cum - n) / 500 == shard.toLong)
    }
    assert(shards.map(_._1).distinct.length > 2, "expect several shards at this size")
  }

  test("global shuffle: contiguous positions, ±1 shard balance, partitioning-independent") {
    import spark.implicits._
    val docs = (1L to 101L).map(i => (i, s"doc $i", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TrainPrep.globalShuffle(docs, nShards = 8).collect()
    // positions are exactly 1..n with no gaps or dupes
    assert(out.map(_.getAs[Long]("position")).sorted.toSeq == (1L to 101L))
    // round-robin shards balance to ±1 document
    val byShard = out.groupBy(_.getAs[Int]("shard")).view.mapValues(_.length)
    assert(byShard.values.max - byShard.values.min <= 1 && byShard.size == 8)
    // the permutation is a function of doc_id alone: a differently
    // partitioned input yields the identical (position, shard, doc_id) map
    val repart = TrainPrep.globalShuffle(docs.repartition(7), nShards = 8).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("position"), r.getAs[Int]("shard"),
        r.getAs[Long]("doc_id"))).sortBy(_._1).toSeq
    assert(key(out) == key(repart))
    // and it is NOT the input order (it actually shuffles)
    assert(out.sortBy(_.getAs[Long]("position")).map(_.getAs[Long]("doc_id")).toSeq
      != (1L to 101L))
  }

  test("decontamination counts exactly the shingles shared with the held-out split") {
    import spark.implicits._
    // craft ids whose split buckets we can read back, then verify hit math
    val docs = (0L until 400L).map(i =>
      (i, (1 to 12).map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val report = TrainPrep.decontaminationReport(docs, n = 3, valPct = 25, testPct = 25, tau = 0.05)
      .collect()
    assert(report.nonEmpty)
    report.foreach { r =>
      val nSh = r.getAs[Int]("n_shingles")
      val nC = r.getAs[Long]("n_contaminated")
      assert(nC >= 0 && nC <= nSh)
      assert(r.getAs[Double]("contamination") == nC.toDouble / nSh)
      assert(r.getAs[Boolean]("is_contaminated") == (nC.toDouble / nSh >= 0.05))
    }
    // a train doc that REPEATS a held-out doc's text must be fully contaminated
    val split = TextAnalysis.withSplit(docs, valPct = 25, testPct = 25)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val heldOut = split.collectFirst { case (id, s) if s != "train" => id }.get
    val trainTwin = split.collectFirst { case (id, s) if s == "train" => id }.get
    val heldText = docs.filter(col("doc_id") === heldOut).collect().head.getString(1)
    val planted = docs.filter(col("doc_id") =!= trainTwin)
      .unionByName(Seq((trainTwin, heldText, "en")).toDF("doc_id", "text", "lang"))
    val twinRow = TrainPrep.decontaminationReport(planted, n = 3, valPct = 25, testPct = 25)
      .filter(col("doc_id") === trainTwin).collect().head
    assert(twinRow.getAs[Double]("contamination") == 1.0,
      s"verbatim benchmark copy must be 100% contaminated, got $twinRow")
    assert(twinRow.getAs[Boolean]("is_contaminated"))
  }

  test("systematic sample: exactly n picks, weight-proportional, heavy docs always in") {
    import spark.implicits._
    // weights: one doc carries half the corpus mass, a tail of light docs
    val docs = (
      Seq((1L, Seq.fill(100)("w").mkString(" "))) ++       // w=100 (heavy)
      (2L to 21L).map(i => (i, Seq.fill(5)("w").mkString(" ")))  // 20 × w=5
    ).toDF("doc_id", "text")                               // W = 200
    val n = 10L
    val out = TrainPrep.systematicSample(docs, n).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    // total multiplicity is exactly n
    assert(out.map(_._2).sum == n)
    // the heavy doc (weight 100 = W/2) takes picks proportional to mass: 5 of 10
    assert(out.head == (1L, 5L))
    // every pick count is >= 1 among returned rows, and no doc exceeds
    // ceil(w * n / W) + 1 picks
    assert(out.forall(_._2 >= 1))
    // stride = W/n = 20 > light weight 5: light docs get at most 1 pick
    assert(out.tail.forall(_._2 == 1))
    // partitioning cannot move a pick
    val out2 = TrainPrep.systematicSample(docs.repartition(7), n)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(out2 == out)
    // a doc heavier than the stride W/n can never be skipped: any interval
    // of length >= stride contains a midpoint position
    val docs2 = (1L to 8L).map(i => (i, Seq.fill(if (i % 2 == 0) 30 else 2)("w").mkString(" "))).toDF("doc_id", "text")
    // W=128, n=4, stride=32: every 30-token doc is near-stride; n=8 -> stride 16 < 30
    val picked = TrainPrep.systematicSample(docs2, 8L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1L to 8L).filter(_ % 2 == 0).forall(picked))
  }

  test("drift census: self-drift is zero, shifted batch concentrates in top buckets") {
    import spark.implicits._
    val ref = (1L to 1000L).map(i => (i, (i % 100) + 1)).toDF("doc_id", "v")
    // identical distribution -> every bucket's per-10k shares agree exactly
    val self = TrainPrep.driftCensus(ref, ref, "v", nBuckets = 10)
      .orderBy("bucket").collect()
    assert(self.length == 10)
    assert(self.forall(_.getLong(5) == 0L), "identical distributions must show zero shift")
    assert(self.map(_.getLong(1)).sum == 1000L)
    // candidate shifted up by 90: its mass must land in the top reference
    // buckets and the bottom buckets must drain
    val cand = (1L to 1000L).map(i => (i, (i % 100) + 91)).toDF("doc_id", "v")
    val drifted = TrainPrep.driftCensus(ref, cand, "v", nBuckets = 10)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(5))).toSeq
    val byBucket = drifted.map(d => d._1 -> d).toMap
    // bottom bucket: reference has mass, candidate has none
    assert(byBucket(1)._2 > 0 && byBucket(1)._3 == 0)
    // the overflow bucket (> all 9 boundaries) holds most of the candidate
    val top = drifted.maxBy(_._1)
    assert(top._3 > top._2, "shifted mass must pool above the frozen top boundary")
    assert(drifted.map(_._4).sum > 10000, "gross shift must flag a 90% displacement")
    // partitioning invariance
    val again = TrainPrep.driftCensus(ref.repartition(7), cand.repartition(3), "v", 10)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(5))).toSeq
    assert(again == drifted)
  }

  test("greedy coverage: picks maximize marginal gain with deterministic tie-break") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 3-gram shingle counts: doc 0 has 6 distinct shingles, doc 1 shares
    // doc 0's text plus adds 2 more words (2 extra shingles), doc 2 is
    // fully disjoint with 3, doc 3 duplicates doc 2 exactly (gain 0 after
    // doc 2 is taken; ties on gain 0 go to the smaller id)
    val d = Seq(
      (0L, "a b c d e f g h"),          // 6 shingles
      (1L, "a b c d e f g h x y"),      // 8 shingles, 6 shared with doc 0
      (2L, "p q r s t"),                // 3 shingles
      (3L, "p q r s t")                 // same 3
    ).toDF("doc_id", "text")
    val out = graft.ops.TrainPrep.greedyCoverage(d, k = 4)
      .orderBy(col("round")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // round 1: doc 1 (8 new) > doc 0 (6); round 2: doc 2 (3 new, id < 3).
    // After that every shingle is covered — zero-gain docs vanish from the
    // anti-joined gain table, so selection EXHAUSTS at 2 picks (k=4 is a
    // cap, not a quota; the oracle's empty bN CTEs drop the same rounds)
    assert(out.toSeq == Seq((1, 1L, 8L, 8L), (2, 2L, 3L, 11L)))
  }

  test("capacity sweep: oversize monotone down, coverage constant, bins bounded below by token volume") {
    import spark.implicits._
    // lengths 3/5/7/9 across two shards (doc_id % 8): everything fits at
    // cap 9, only 3 fits at cap 4
    val d = Seq(
      (0L, "a b c"), (1L, "a b c d e"),
      (2L, "a b c d e f g"), (3L, "a b c d e f g h i")
    ).toDF("doc_id", "text")
    val rows = graft.ops.TrainPrep.packCapacityReport(d,
        capacities = Seq(4, 9, 24), nShards = 8)
      .orderBy(col("capacity")).collect()
    assert(rows.length == 3)
    val total = 3L + 5L + 7L + 9L
    rows.foreach { r =>
      val cap = r.getAs[Long]("capacity")
      assert(r.getAs[Long]("n_docs") + r.getAs[Long]("n_oversize") == 4L,
        s"cap=$cap: coverage must be constant")
      val bins = r.getAs[Long]("n_bins")
      val toks = r.getAs[Long]("total_tokens")
      assert(bins * cap >= toks, s"cap=$cap: bins must hold the tokens")
      assert(r.getAs[Long]("ffd_waste") == bins * cap - toks)
    }
    val oversize = rows.map(_.getAs[Long]("n_oversize"))
    assert(oversize.sliding(2).forall { case Array(a, b) => a >= b },
      s"oversize monotone non-increasing: ${oversize.mkString(",")}")
    assert(oversize.toSeq == Seq(3L, 0L, 0L))
    // cap 24: one doc per shard => 4 singleton bins; cap 9: docs sit in
    // 4 different shards (ids 0-3 mod 8) so FFD can't co-pack them
    assert(rows(2).getAs[Long]("n_bins") == 4L)
  }

  test("next-fit vs FFD: hand-traced online penalty on one shard") {
    import spark.implicits._
    // one shard (ids ≡ 0 mod 8), capacity 10, arrival lens 6,5,4,5:
    // NF: [6] | close, [5, +4=9] | close, [5] → 3 bins
    // FFD (sorted 6,5,5,4): b1=6+4=10, b2=5+5=10 → 2 bins
    val d = Seq(
      (0L, "a a a a a a"), (8L, "b b b b b"),
      (16L, "c c c c"), (24L, "d d d d d")
    ).toDF("doc_id", "text")
    val r = graft.ops.TrainPrep.nextFitPackCensus(d, capacity = 10, nShards = 8)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_bins_nf") == 3L, s"$row")
    assert(row.getAs[Long]("n_bins_ffd") == 2L, s"$row")
    assert(row.getAs[Long]("online_penalty_bins") == 1L)
    assert(row.getAs[Long]("nf_waste") == 3L * 10 - 20L)
    assert(row.getAs[Long]("ffd_waste") == 0L)
  }
}
