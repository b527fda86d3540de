package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Proves [[Dedup.substringSpanCut]]'s guarantee: after the cut, NO run of
  * length ≥ L+W-1 from the original corpus is still shared between any two
  * cleaned documents — winnowing's detection property means every such run
  * witnesses a shared selected gram in both docs, the span is cut in both,
  * and every surviving fragment of a shared run is itself too short to
  * have escaped selection. Checked pairwise brute-force on planted
  * fixtures (distinct per-doc filler so cut junctions cannot manufacture
  * coincidental cross-doc matches).
  *
  * This spec runs the GUARANTEE check on the real cleaned text, so it
  * re-derives the clean strings with a literal reference cut (sorted
  * shared positions → merged intervals → segment splice) over the same
  * winnow positions the operator uses — also pinning the operator's
  * md5/length output against an independent reassembly.
  */
class SubstringCutSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val L = 16
  private val W = 4
  // deterministic distinct filler: repeating per-doc alphabet soup with no
  // 19-char (L+W-1) overlap across docs
  private def filler(seed: Char, n: Int): String =
    (0 until n).map(i => ('a' + (seed - 'a' + i * 7 + i * i % 13) % 26).toChar).mkString

  private val sharedA = "THE-QUICK-BROWN-FOX-JUMPS-OVER-THE-LAZY-DOG-AGAIN-AND-AGAIN"
  private val sharedB = "PACK-MY-BOX-WITH-FIVE-DOZEN-LIQUOR-JUGS-RIGHT-NOW"

  private def fixture = {
    import spark.implicits._
    Seq(
      (0L, filler('a', 80) + sharedA + filler('b', 60)),
      (1L, filler('c', 50) + sharedA + filler('d', 70) + sharedB + filler('e', 40)),
      (2L, sharedB + filler('f', 90)),
      (3L, filler('g', 120)), // clean doc: untouched
      (4L, sharedA) // doc that IS a shared run: cut to (near-)empty
    ).toDF("doc_id", "text")
  }

  /** All distinct substrings of length n. */
  private def gramsOf(s: String, n: Int): Set[String] =
    if (s.length < n) Set.empty
    else (0 to s.length - n).map(i => s.substring(i, i + n)).toSet

  /** Reference clean text: cut merged [p, p+L-1] spans of cross-doc-shared
    * winnow grams, splice survivors — independent scalar re-derivation of
    * the operator's distributed plan.
    */
  private def referenceClean(all: Seq[(Long, String)]): Map[Long, String] = {
    def winnowPositions(text: String): Seq[Int] = {
      val P = 1000000007L
      val n = text.length - L + 1
      if (n < W) return Seq.empty
      val powW = (0 until L).foldLeft(1L)((p, _) => p * 131L % P)
      val hs = new Array[Long](n)
      var acc = 0L
      for (i <- text.indices) {
        acc = (acc * 131L + text.charAt(i)) % P
        if (i >= L) { acc = (acc - text.charAt(i - L) * powW) % P; if (acc < 0) acc += P }
        if (i + 1 >= L) hs(i + 1 - L) = acc
      }
      (0 to n - W).map { a =>
        val win = (a until a + W)
        val m = win.minBy(hs(_)) // minBy keeps the FIRST minimal index
        m + 1
      }.distinct
    }
    val withGrams = all.map { case (id, t) =>
      (id, t, winnowPositions(t).map(p => (p, t.substring(p - 1, p - 1 + L))))
    }
    val docsPerGram = withGrams
      .flatMap { case (id, _, gs) => gs.map(g => (g._2, id)) }
      .groupBy(_._1).map { case (g, xs) => (g, xs.map(_._2).distinct.size) }
    withGrams.map { case (id, t, gs) =>
      val ps = gs.filter(g => docsPerGram(g._2) > 1).map(_._1).distinct.sorted
      // merge [p, p+L-1] intervals (touching counts as merged)
      val merged = ps.foldLeft(List.empty[(Int, Int)]) { case (acc, p) =>
        acc match {
          case (s, e) :: rest if p <= e + 1 => (s, math.max(e, p + L - 1)) :: rest
          case _ => (p, p + L - 1) :: acc
        }
      }.reverse
      val sb = new StringBuilder
      var cur = 1
      merged.foreach { case (s, e) => sb.append(t.substring(cur - 1, s - 1)); cur = e + 1 }
      sb.append(t.substring(math.min(cur - 1, t.length)))
      (id, sb.toString)
    }.toMap
  }

  test("no shared run of length >= L+W-1 survives the cut; operator output matches reference splice") {
    import org.apache.spark.sql.functions.col
    val raw = fixture.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)

    // sanity: the planted spans ARE shared in the raw corpus
    val n = L + W - 1
    assert(gramsOf(raw(0)._2, n).intersect(gramsOf(raw(1)._2, n)).nonEmpty)
    assert(gramsOf(raw(1)._2, n).intersect(gramsOf(raw(2)._2, n)).nonEmpty)

    val out = Dedup.substringSpanCut(fixture, L = L, W = W)
      .orderBy(col("doc_id")).collect()
    val clean = referenceClean(raw)

    // operator output == independent reference splice (md5 + length pin)
    out.foreach { r =>
      val id = r.getLong(0)
      val expect = clean(id)
      assert(r.getAs[Int]("clean_len") == expect.length,
        s"doc $id clean_len: got ${r.getAs[Int]("clean_len")}, reference ${expect.length}")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(expect.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(r.fieldIndex("clean_md5")) == md, s"doc $id clean_md5 mismatch")
    }

    // the guarantee: pairwise, no surviving common substring >= L+W-1
    val ids = clean.keys.toSeq.sorted
    for {
      i <- ids; j <- ids if i < j
      common = gramsOf(clean(i), n).intersect(gramsOf(clean(j), n))
    } assert(common.isEmpty,
      s"docs $i/$j still share a run >= $n after the cut: ${common.headOption}")

    // clean doc untouched; shared-only doc heavily cut
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getLong(1) == 0L && byId(3L).getAs[Int]("clean_len") == 120)
    assert(byId(4L).getLong(1) >= 1L &&
      byId(4L).getAs[Int]("clean_len") < sharedA.length)
  }

  test("keep-one: the minimum-doc-id holder keeps each span, other holders cut") {
    import org.apache.spark.sql.functions.col
    def byId(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r).toMap
    val keepOne = byId(Dedup.substringSpanCut(fixture, L = L, W = W, keepOne = true)
      .orderBy(col("doc_id")).collect())
    val cutAll = byId(Dedup.substringSpanCut(fixture, L = L, W = W)
      .orderBy(col("doc_id")).collect())
    val raw = fixture.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // doc 0 is the canonical (min-id) holder of every sharedA gram: untouched
    assert(keepOne(0L).getLong(1) == 0L &&
      keepOne(0L).getAs[Int]("clean_len") == raw(0L).length)
    // clean doc still untouched
    assert(keepOne(3L).getLong(1) == 0L)
    // doc 1 cuts sharedA (doc 0 is canonical) but KEEPS sharedB (doc 1 is
    // its canonical) — strictly fewer chars cut than cut-all mode
    assert(keepOne(1L).getLong(2) > 0L &&
      keepOne(1L).getLong(2) < cutAll(1L).getLong(2))
    // doc 2 is never canonical (sharedB's min holder is 1): cuts identically
    assert(keepOne(2L).getLong(2) == cutAll(2L).getLong(2) &&
      keepOne(2L).getLong(2) > 0L)
    // doc 4 cuts sharedA (doc 0 canonical)
    assert(keepOne(4L).getLong(2) > 0L)
  }

  test("disjoint corpus: zero spans, every doc byte-identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((0L, filler('a', 100)), (1L, filler('k', 100))).toDF("doc_id", "text")
    val out = Dedup.substringSpanCut(docs, L = L, W = W)
      .orderBy(col("doc_id")).collect()
    assert(out.forall(_.getLong(1) == 0L))
    assert(out.forall(_.getAs[Int]("clean_len") == 100))
  }
}
