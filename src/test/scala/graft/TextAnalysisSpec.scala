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
}
