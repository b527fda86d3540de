package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Planted-duplicate fixtures: the ops must find the near-copy pair and
  * nothing else among unrelated documents.
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val base =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey"
  private val nearCopy = base.replace("echo", "echoX") + " xray"
  private val unrelated1 =
    "one two three four five six seven eight nine ten eleven twelve thirteen " +
    "fourteen fifteen sixteen seventeen eighteen nineteen twenty twentyone twentytwo"
  private val unrelated2 =
    "zebra yak xenon walrus viper urchin toad snake rabbit quail panther otter " +
    "newt moose lemur koala jackal ibis heron gazelle ferret eagle dingo"

  private def docs = {
    import spark.implicits._
    Seq((0L, base), (1L, nearCopy), (2L, unrelated1), (3L, unrelated2), (4L, base))
      .toDF("doc_id", "text")
  }

  test("paragraph dedup strips shared boilerplate segments, keeps unique content in order") {
    import spark.implicits._
    val header = "terms of service apply"          // one 4-token boilerplate segment
    val pd = Seq(
      (0L, s"$header alpha bravo charlie delta"),  // header + unique tail
      (1L, s"$header echo foxtrot golf hotel"),    // header + different tail
      (2L, header),                                // pure boilerplate
      (3L, "india juliet kilo lima mike november oscar papa")) // untouched
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(pd, k = 4, maxDf = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_segs"),
        r.getAs[Long]("n_kept"), r.getAs[String]("clean_md5")))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0) == (0L, 2L, 1L, md5hex("alpha bravo charlie delta")))
    assert(out(1) == (1L, 2L, 1L, md5hex("echo foxtrot golf hotel")))
    // a fully-boilerplate document survives as an empty row, not a dropped one
    assert(out(2) == (2L, 1L, 0L, md5hex("")))
    // a document with no shared segments reassembles to its own text
    assert(out(3) == (3L, 2L, 2L,
      md5hex("india juliet kilo lima mike november oscar papa")))
  }

  test("exact duplicates group by raw text") {
    val groups = Dedup.exactDuplicateGroups(docs).collect()
    val dupGroup = groups.filter(_.getAs[Long]("n_docs") > 1)
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getAs[Long]("canonical_doc") == 0L)
    assert(dupGroup.head.getAs[Long]("n_docs") == 2L)
  }

  test("minhash LSH finds the near-copy pair and no unrelated pair") {
    val pairs = Dedup.minhashLshPairs(docs, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 4L)))
    assert(pairs.contains((0L, 4L)))            // identical pair always survives
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("exact n-gram jaccard agrees with LSH on planted pairs") {
    val lsh = Dedup.minhashLshPairs(docs, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh) || lsh.subsetOf(exact))
    assert(exact.contains((0L, 4L)))
  }

  test("CDC chunk overlap pairs edited near-copies, not unrelated docs") {
    import spark.implicits._
    val text = {
      var seed = 7L
      Array.fill(800) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        ('a' + (math.abs(seed >>> 17) % 26).toInt).toChar
      }.mkString
    }
    val other = {
      var seed = 99L
      Array.fill(800) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        ('a' + (math.abs(seed >>> 17) % 26).toInt).toChar
      }.mkString
    }
    val cdcDocs = Seq(
      (1L, text),
      (2L, text.take(100) + "EDITEDEDITED" + text.drop(100)), // mid-document insert
      (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.cdcOverlapPairs(cdcDocs, minShared = 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)), s"edited near-copy must share chunks, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"unrelated doc paired: $pairs")
  }

  test("simhash: identical docs at hamming 0; unrelated docs not paired") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number]("hamming").intValue()))
      .toMap
    assert(pairs((0L, 4L)) == 0)
    assert(!pairs.keySet.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("winnowing guarantee: any shared run >= L+W-1 yields a shared anchored gram") {
    import spark.implicits._
    // a 60-char shared run (>= 48+8-1 = 55) embedded in otherwise-different
    // text, at DIFFERENT offsets — the guarantee must not depend on position
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    assert(shared.length >= 55)
    val docs = Seq(
      (1L, s"AAAA BBBB $shared CCCC DDDD"),
      (2L, s"completely unrelated preamble text here $shared and a different tail"),
      (3L, "no overlap with anything else in this corpus at all, " +
        "padded until it is long enough to produce anchored grams of its own ok"))
      .toDF("doc_id", "text")
    val census = Dedup.winnowedAnchorCensus(docs, L = 48, W = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(census(1L) >= 1, s"doc 1 must share an anchored gram: $census")
    assert(census(2L) >= 1, s"doc 2 must share an anchored gram: $census")
    assert(census(3L) == 0, s"doc 3 shares nothing: $census")
  }

  test("connected components resolve transitive chains to the minimum id") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 10-11,
    // and a chain whose min arrives from the HIGH end (20-19, 19-18)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 19L), (19L, 18L))
      .toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(Seq(18L, 19L, 20L).forall(comp(_) == 18L))
    assert(comp.size == 9)
    // partitioning must not affect the fixpoint
    val comp2 = Dedup.connectedComponents(pairs.repartition(7)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    assert(comp2 == comp)
    // no near-dups at all: an empty pair set yields an empty (not failing) result
    assert(Dedup.connectedComponents(pairs.filter("doc_a < 0")).count() == 0)
  }

  test("large-star/small-star components == label propagation, in O(log n) rounds on a chain") {
    import spark.implicits._
    // 41-node chain: diameter 40, so propagation pays ~40 rounds while the
    // star alternation folds it in O(log n); plus a pair and a ring so the
    // fixture has several shapes at once
    val chain = (0L until 40L).map(i => (i, i + 1))
    val ring = Seq((100L, 101L), (101L, 102L), (102L, 103L), (103L, 100L))
    val pairs = (chain ++ ring ++ Seq((200L, 201L))).toDF("doc_a", "doc_b")
    // driverThreshold = 0 forces the distributed alternation — this test
    // exists to prove the O(log n) round bound, not the tiny-set fast path
    val (starDf, starRounds) = Dedup.connectedComponentsStarCounted(pairs, driverThreshold = 0L)
    val star = starDf.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    assert((0L to 40L).forall(star(_) == 0L))
    assert((100L to 103L).forall(star(_) == 100L))
    assert(star(200L) == 200L && star(201L) == 200L)
    assert(star.size == 47)
    val (propDf, propRounds) = Dedup.connectedComponentsCounted(pairs)
    val prop = propDf.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    assert(prop == star, "both algorithms must land on identical labels")
    // the point of the star variant: rounds independent of the diameter
    assert(propRounds > 10, s"chain fixture should force propagation deep, got $propRounds")
    assert(starRounds <= 8, s"star alternation must fold the chain in O(log n), got $starRounds")
    // the driver union-find fast path (edge count under the threshold)
    // must land on byte-identical labels in ZERO distributed rounds
    val (fastDf, fastRounds) = Dedup.connectedComponentsStarCounted(pairs)
    val fast = fastDf.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    assert(fastRounds == 0, s"fixture is under the driver threshold, got $fastRounds rounds")
    assert(fast == star, "driver union-find must match the distributed labels")
  }

  test("star components: LSH pairs at sf0.001 match propagation; partitioning-invariant") {
    val lshPairs = Dedup.minhashLshPairs(Tables.documents(spark, "/root/testdata/sf0.001"))
      .select(org.apache.spark.sql.functions.col("doc_a"),
        org.apache.spark.sql.functions.col("doc_b"))
    val star = Dedup.connectedComponentsStar(lshPairs).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    val prop = Dedup.connectedComponents(lshPairs).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    assert(star == prop && star.nonEmpty)
    val star7 = Dedup.connectedComponentsStar(lshPairs.repartition(7)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    assert(star7 == star)
    // empty edge set stays an empty (not failing) result
    assert(Dedup.connectedComponentsStar(lshPairs.filter("doc_a < 0")).count() == 0)
  }

  test("edit-distance-1 blocking: substitution/insert/delete/equal found, distance-2 excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "kitten"),   // vs 2 substitution (mitten), vs 3 deletion (kitte... no)
      (2L, "mitten"),   // dist 1 from kitten
      (3L, "kitte"),    // deletion of kitten's last char -> dist 1 from kitten
      (4L, "kittens"),  // insertion -> dist 1 from kitten
      (5L, "kitten"),   // exact duplicate of 1
      (6L, "sitting")   // dist 3 from kitten: must have no neighbors
    ).toDF("id", "name")
    val got = graft.ops.Dedup.editDistance1Neighbors(rows, "id", "name")
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    // cross-checked against DuckDB's quadratic levenshtein join
    assert(got.toSeq == Seq(
      (1L, 4L, 2L),   // mitten, kitte, kittens, kitten(dup)
      (2L, 2L, 1L),   // the two kittens (mitten-kitte and mitten-kittens are dist 2)
      (3L, 2L, 1L),   // the two kittens (kitte-kittens is dist 2)
      (4L, 2L, 1L),   // the two kittens
      (5L, 4L, 1L),   // mirror of id 1
      (6L, 0L, -1L))) // sitting: no neighbors within distance 1
  }

  test("prefix filter: exactly the brute-force Jaccard >= 3/5 pairs (no false negatives)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // deterministic overlapping-text corpus: doc i covers tokens
    // [7i/8, 7i/8 + len_i) of a shared vocabulary, so adjacent docs share
    // long shingle runs (pairs above tau) and distant docs share few
    val gen = (0 until 40).map { i =>
      val start = i * 7 / 8
      val len = 12 + (i % 5)
      (i.toLong, (start until start + len).map(t => s"t$t").mkString(" "))
    }
    val df = gen.toDF("doc_id", "text")
    // brute force over the SAME shingle-hash sets the op uses (all pairs,
    // no prefix/length pruning) — any candidate the filters wrongly drop
    // shows up as a missing pair here
    val sets = Dedup.withShingleHashes(df, Dedup.defaultShingle)
      .select(col("doc_id"), col("hbase")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSet).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      uni = (sets(a) | sets(b)).size
      if inter * 5 >= uni * 3
    } yield (a, b, inter, uni)).toSet
    assert(brute.nonEmpty && brute.size < (40 * 39) / 2, s"fixture degenerate: ${brute.size}")
    val got = Dedup.prefixFilterPairs(df).orderBy(col("id1"), col("id2")).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
        r.getAs[Int]("inter_sz"), r.getAs[Int]("union_sz"))).toSet
    assert(got == brute, s"prefix filter diverged from brute force: " +
      s"missing=${brute -- got} extra=${got -- brute}")
  }
}
