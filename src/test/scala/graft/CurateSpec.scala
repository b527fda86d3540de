package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Curate
import graft.stages.MergeTable

/** End-to-end curation through a STORAGE boundary: the survivor stage is
  * merge-committed to a MergeTable and the census is computed from what
  * storage holds — the production shape — and must equal the in-query
  * cached form the oracle checks.
  */
class CurateSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  private def censusRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("labeled_lang", "predicted_lang").collect()
      .map(r => (r.getAs[String]("labeled_lang"), r.getAs[String]("predicted_lang"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"))).toSeq

  test("curation through a MergeTable equals the in-query cached form") {
    val cached = censusRows(Curate.curateCorpus(docs))
    val table = MergeTable.scratch(Seq("doc_id"))
    val stored = censusRows(Curate.curateCorpusThrough(docs, table))
    assert(stored == cached && stored.nonEmpty)
    // the survivor table is a real committed artifact other jobs can read
    assert(table.currentVersion.contains("v0"))
    assert(table.read(spark, docs.schema).count() > 0)
  }

  test("re-running the curation against the same table converges (idempotent merge)") {
    val table = MergeTable.scratch(Seq("doc_id"))
    val first = censusRows(Curate.curateCorpusThrough(docs, table))
    val survivorCount = table.read(spark, docs.schema).count()
    val second = censusRows(Curate.curateCorpusThrough(docs, table))
    assert(second == first)
    assert(table.read(spark, docs.schema).count() == survivorCount)
    assert(table.currentVersion.contains("v1")) // a new version, same content
  }
}
