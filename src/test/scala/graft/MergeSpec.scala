package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.stages.Merge

/** SCD0/SCD1 rewrite semantics incl. idempotent replay (FIXTURES.md §A5). */
class MergeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def df(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("courier_key", "courier_name")
  }

  private def asMap(d: org.apache.spark.sql.DataFrame): Map[String, String] =
    d.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("SCD1 upsert: incoming overwrites matches, keeps unmatched existing, adds new") {
    val existing = df(Seq("c1" -> "Ann", "c2" -> "Bob"))
    val incoming = df(Seq("c2" -> "Bobby", "c3" -> "Cleo"))
    val merged = asMap(Merge.upsert(existing, incoming, Seq("courier_key")))
    assert(merged == Map("c1" -> "Ann", "c2" -> "Bobby", "c3" -> "Cleo"))
  }

  test("SCD0 insert-ignore: first write wins, in-batch duplicates collapse") {
    val existing = df(Seq("c1" -> "Ann"))
    val incoming = df(Seq("c1" -> "Annette", "c2" -> "Bob", "c2" -> "Bob"))
    val merged = Merge.insertIgnore(existing, incoming, Seq("courier_key"))
    assert(asMap(merged) == Map("c1" -> "Ann", "c2" -> "Bob"))
    assert(merged.count() == 2)
  }

  test("replay idempotence: applying the same batch twice equals once") {
    val existing = df(Seq("c1" -> "Ann", "c2" -> "Bob"))
    val incoming = df(Seq("c2" -> "Bobby", "c3" -> "Cleo"))
    val once = Merge.upsert(existing, incoming, Seq("courier_key"))
    val twice = Merge.upsert(once, incoming, Seq("courier_key"))
    assert(asMap(once) == asMap(twice))
    val onceI = Merge.insertIgnore(existing, incoming, Seq("courier_key"))
    val twiceI = Merge.insertIgnore(onceI, incoming, Seq("courier_key"))
    assert(asMap(onceI) == asMap(twiceI) && twiceI.count() == 3)
  }
}
