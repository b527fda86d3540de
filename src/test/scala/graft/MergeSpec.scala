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

  test("SCD2 upsert: change closes current version, no-op delivery adds nothing, replay idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val existing = Seq(
      ("c1", "Ann", ts("2024-01-01 00:00:00"), Some(ts("2024-01-10 00:00:00")), false),
      ("c1", "Anne", ts("2024-01-10 00:00:00"), None: Option[java.sql.Timestamp], true),
      ("c2", "Bob", ts("2024-01-02 00:00:00"), None: Option[java.sql.Timestamp], true)
    ).toDF("courier_key", "courier_name", "effective_from", "effective_to", "is_current")
    val incoming = Seq(
      ("c1", "Annette", ts("2024-01-20 00:00:00")),   // change → close + insert
      ("c2", "Bob", ts("2024-01-25 00:00:00"))        // unchanged → no-op
    ).toDF("courier_key", "courier_name", "change_ts")
    def shape(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(col("courier_key"), col("effective_from")).collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4))).toSeq
    val once = Merge.scd2Upsert(existing, incoming,
      Seq("courier_key"), Seq("courier_name"))
    assert(shape(once) == Seq(
      ("c1", "Ann", ts("2024-01-01 00:00:00"), Some(ts("2024-01-10 00:00:00")), false),
      ("c1", "Anne", ts("2024-01-10 00:00:00"), Some(ts("2024-01-20 00:00:00")), false),
      ("c1", "Annette", ts("2024-01-20 00:00:00"), None, true),
      ("c2", "Bob", ts("2024-01-02 00:00:00"), None, true)))
    // replay: same batch again converges to the same history
    val twice = Merge.scd2Upsert(once, incoming,
      Seq("courier_key"), Seq("courier_name"))
    assert(shape(twice) == shape(once))
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
