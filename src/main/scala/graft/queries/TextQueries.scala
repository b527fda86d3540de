package graft.queries

import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.ops.TextAnalysis

/** Text-analysis operators over `documents`, each with a DuckDB oracle.
  * Scores are integer counts with one final double division → exact
  * cross-engine match (see Ledger.scala numeric strategy).
  */
object TextQueries {

  private val toksSql = "string_split(text, ' ')"

  private def hitsSql(words: Seq[String]): String = {
    val cond = words.map(w => s"t = '$w'").mkString(" OR ")
    s"len(list_filter($toksSql, t -> $cond))"
  }

  private val scoreSql: Map[String, String] =
    TextAnalysis.stopwords.map { case (lang, words) =>
      lang -> s"(CAST(${hitsSql(words)} AS DOUBLE) / len($toksSql))"
    }.toMap

  val all: Seq[GQuery] = Seq(

    GQuery("text_token_stats",
      (s, dir) => TextAnalysis.tokenStats(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
                     CAST(length(text) AS INT) AS n_chars,
                     CAST(len($toksSql) AS INT) AS n_tokens,
                     CAST(len(list_distinct($toksSql)) AS INT) AS n_types,
                     CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql) AS type_token_ratio,
                     CAST(length(text) - len($toksSql) + 1 AS DOUBLE) / len($toksSql) AS mean_token_len
              FROM documents ORDER BY doc_id"""),
      doc = "token counting: whitespace tokens, types, TTR, mean length"),

    GQuery("text_langid",
      (s, dir) => TextAnalysis.languageId(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some {
        val scores = TextAnalysis.stopwords.map { case (l, _) =>
          s"${scoreSql(l)} AS score_$l" }.mkString(",\n                     ")
        s"""WITH scored AS (
              SELECT doc_id, lang AS labeled_lang,
                     $scores
              FROM documents)
            SELECT doc_id, labeled_lang,
                   CASE WHEN score_zh > score_en AND score_zh > score_de AND score_zh > score_es AND score_zh > score_fr THEN 'zh'
                        WHEN score_fr > score_en AND score_fr > score_de AND score_fr > score_es AND score_fr >= score_zh THEN 'fr'
                        WHEN score_es > score_en AND score_es > score_de AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
                        WHEN score_de > score_en AND score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
                        ELSE 'en' END AS predicted_lang,
                   score_en, score_de, score_es, score_fr, score_zh
            FROM scored ORDER BY doc_id"""
      },
      doc = "stopword-ratio language heuristic with deterministic argmax"),

    GQuery("text_quality",
      (s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
                     CAST(length(text) AS INT) AS n_chars,
                     CAST(len($toksSql) AS INT) AS n_tokens,
                     CAST(len(list_distinct($toksSql)) AS INT) AS n_types,
                     CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql) AS type_token_ratio,
                     CAST(length(text) - len($toksSql) + 1 AS DOUBLE) / len($toksSql) AS mean_token_len,
                     ${scoreSql("en")} AS stopword_ratio,
                     (len($toksSql) >= 20
                      AND CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql) >= 0.3
                      AND CAST(length(text) - len($toksSql) + 1 AS DOUBLE) / len($toksSql) BETWEEN 2.0 AND 12.0)
                       AS is_quality
              FROM documents ORDER BY doc_id"""),
      doc = "document quality signals + composite flag"),

    GQuery("text_fingerprint",
      (s, dir) => TextAnalysis.fingerprint(Tables.documents(s, dir))
        .groupBy(col("fingerprint"))
        .agg(min(col("doc_id")).as("canonical_doc"), count(lit(1)).as("n_docs"))
        .orderBy(col("fingerprint")),
      Some(s"""SELECT md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fingerprint,
                     min(doc_id) AS canonical_doc,
                     count(*) AS n_docs
              FROM documents
              GROUP BY fingerprint ORDER BY fingerprint"""),
      doc = "order-insensitive token-set fingerprint; collisions = near-copies"),

    GQuery("text_regex_tokens",
      (s, dir) => TextAnalysis.regexTokenStats(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
                     CAST(len($toksSql) AS INT) AS n_ws_tokens,
                     CAST(len(regexp_extract_all(text, '${TextAnalysis.regexTokenPattern}')) AS INT) AS n_re_tokens
              FROM documents ORDER BY doc_id"""),
      doc = "BPE-ish regex token counting alongside whitespace tokens"),

    GQuery("text_rolling_hash",
      (s, dir) => TextAnalysis.rollingFingerprint(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(range(1, length(text) + 1),
                                        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
                       (acc, c) -> (acc * 131 + c) % 1000000007) AS rhash
              FROM documents ORDER BY doc_id"""),
      doc = "Rabin-Karp rolling-hash fingerprint (position-sensitive)"),

    GQuery("text_token_freq",
      (s, dir) => TextAnalysis.tokenFrequencies(Tables.documents(s, dir))
        .orderBy(col("freq").desc, col("token")),
      Some(s"""SELECT t.token, count(*) AS freq
              FROM (SELECT unnest($toksSql) AS token FROM documents) t
              GROUP BY t.token ORDER BY freq DESC, t.token"""),
      doc = "corpus token histogram (explode → shuffle-bearing count)")
  )
}
