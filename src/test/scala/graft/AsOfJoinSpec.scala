package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks latest right <= left ts; equal ts included; no prior → null") {
    import spark.implicits._
    val left = Seq(
      (1L, 101L, ts("2024-01-01 10:00:00")),   // after r1, r2 → r2
      (1L, 102L, ts("2024-01-01 08:00:00")),   // == r1 ts → r1 (<= semantics)
      (1L, 103L, ts("2024-01-01 07:00:00")),   // before everything → null
      (2L, 201L, ts("2024-01-01 12:00:00"))    // other key: only r3
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), 11L),    // r1
      (1L, ts("2024-01-01 09:00:00"), 12L),    // r2
      (2L, ts("2024-01-01 11:00:00"), 21L)     // r3
    ).toDF("user_id", "s_ts", "signup_id")

    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "s_ts", Seq("signup_id"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("signup_id")).map(_.toLong)).toMap
    assert(out(101L).contains(12L))
    assert(out(102L).contains(11L))
    assert(out(103L).isEmpty)
    assert(out(201L).contains(21L))
  }
}
