package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{EventIn, SessionOut}

/** flatMapGroupsWithState sessionization — closed sessions emitted by the
  * streaming operator must equal the batch gaps-and-islands result for all
  * but each user's final (still-open) session.
  */
class SessionizeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def ts(s: String) = Timestamp.valueOf(s)

  // whole-second timestamps: user 7 has two sessions (gap > 30 min) plus an
  // open tail; user 8 one closed session + open tail
  private val batch1 = Seq(
    EventIn(7L, ts("2024-01-01 10:00:00"), 10.0),
    EventIn(7L, ts("2024-01-01 10:10:00"), 5.0),
    EventIn(8L, ts("2024-01-01 09:00:00"), 1.0))
  private val batch2 = Seq(
    EventIn(7L, ts("2024-01-01 11:00:00"), 2.0),   // > 30 min after 10:10 → new session
    EventIn(7L, ts("2024-01-01 11:05:00"), 3.0),
    EventIn(8L, ts("2024-01-01 12:00:00"), 4.0),   // closes 09:00 session
    EventIn(7L, ts("2024-01-01 13:00:00"), 9.0))   // closes 11:00 session

  test("dynamic-gap sessions: purchase windows split fast, a view window shields later events") {
    import spark.implicits._
    val df = Seq(
      // user 1: two purchases 6 min apart — each window is [ts, ts+5m),
      // no overlap → TWO sessions (the static 360-min gap would give one)
      (1L, ts("2024-01-01 10:00:00"), 1.0, "purchase"),
      (1L, ts("2024-01-01 10:06:00"), 2.0, "purchase"),
      // user 2: the view's 360-min window covers the purchase AND an event
      // 100 min later even though the purchase's own window ended long
      // before → ONE session (running max of ends, not last event's gap)
      (2L, ts("2024-01-01 10:00:00"), 1.0, "view"),
      (2L, ts("2024-01-01 10:04:00"), 2.0, "purchase"),
      (2L, ts("2024-01-01 11:40:00"), 3.0, "view")
    ).toDF("user_id", "ts", "value", "event_type")
    val r = Sessionize.sessionsDynamicGap(df)
      .orderBy("user_id", "session_start").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 1L, 2L))
    assert(r(2).getAs[Long]("n_events") == 3L)
  }

  test("gap-closed sessions match batch; watermark timeout flushes idle tails") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventIn]
    val sink = s"sessions_${System.nanoTime()}"
    val q = Sessionize.sessionsStreaming(input.toDS(), gapMinutes = 30)
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName(sink).start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    def streamed() = spark.table(sink).as[SessionOut].collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet

    val all = Sessionize.sessionsBatch(
        (batch1 ++ batch2).toDF(), gapMinutes = 30)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("session_start"),
        r.getAs[String]("session_end"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"))).toSet

    // after batch2 the watermark is 13:00 - 10 min = 12:50, which is past
    // user 8's idle deadline (12:00 + 30 min): 8's tail is FLUSHED by the
    // event-time timeout. User 7's tail (13:00 + 30 min) is still open.
    val tail7 = all.filter(_._2 == "2024-01-01 13:00:00")
    assert(tail7.size == 1)
    assert(streamed() == all -- tail7)
    // spot-check a closed session: user 7, 10:00-10:10, 2 events, 15.0
    assert(streamed().contains((7L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2L, 15.0)))

    // an unrelated user's event advances the watermark past 13:30 and the
    // timeout flushes user 7's final session with NO user-7 event arriving
    input.addData(EventIn(99L, ts("2024-01-02 10:00:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    assert(streamed() == all) // every user-7/8 session emitted; 99 still open
  }

  test("exact-threshold gap MERGES in BOTH the native session_window and the lag form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-05-01 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-05-01 06:00:00"), 2.0),  // exactly 360 min later
      (1L, java.sql.Timestamp.valueOf("2024-05-01 12:00:01"), 3.0)   // 1s past the threshold
    ).toDF("user_id", "ts", "value")
    val native = graft.streaming.Sessionize.sessionsNativeWindow(events, gapMinutes = 360)
      .orderBy(col("session_start")).collect()
    val lagForm = graft.streaming.Sessionize.sessionsBatch(events, gapMinutes = 360)
      .orderBy(col("session_start")).collect()
    // both split strictly-greater: events 1+2 merge, event 3 opens a new session
    for ((got, label) <- Seq((native, "session_window"), (lagForm, "lag"))) {
      assert(got.length == 2, s"$label: expected 2 sessions, got ${got.length}")
      assert(got.head.getAs[Long]("n_events") == 2L, s"$label: exact-gap pair must merge")
    }
    assert(native.map(_.toSeq).toSeq == lagForm.map(_.toSeq).toSeq,
      "the two forms must be row-identical")
  }
}
