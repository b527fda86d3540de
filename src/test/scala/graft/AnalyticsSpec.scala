package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case semantics of the product-analytics queries: the funnel's
  * strictly-increasing-prefix rule and the WAU fan-out's window algebra —
  * places where an off-by-one or a tie would still pass the corpus oracle
  * if the corpus happens not to exercise it.
  */
class AnalyticsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def stageOf(events: Seq[(Long, String, String)]): Map[Long, Int] = {
    import spark.implicits._
    def firstOf(t: String) =
      min(when(col("event_type") === t, unix_micros(col("ts")))).as(s"t_$t")
    events.map { case (u, ty, ts) => (u, ty, java.sql.Timestamp.valueOf(ts)) }
      .toDF("user_id", "event_type", "ts")
      .groupBy(col("user_id"))
      .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
      .withColumn("stage",
        when(col("t_view").isNull, 0)
          .when(col("t_click").isNull || col("t_click") <= col("t_view"), 1)
          .when(col("t_purchase").isNull || col("t_purchase") <= col("t_click"), 2)
          .otherwise(3).cast("int"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage")).toMap
  }

  test("funnel stage is the longest STRICTLY-increasing prefix of first-times") {
    val stages = stageOf(Seq(
      // u1: full ordered funnel → 3
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // u2: purchase BEFORE click → chain breaks at 2
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 11:00:00"),
      (2L, "purchase", "2024-01-01 10:30:00"),
      // u3: click before view (re-ordered funnel) → stalls at 1
      (3L, "click", "2024-01-01 09:00:00"),
      (3L, "view", "2024-01-01 10:00:00"),
      // u4: never viewed → 0
      (4L, "purchase", "2024-01-01 10:00:00"),
      // u5: click TIES view exactly → tie breaks the chain → 1
      (5L, "view", "2024-01-01 10:00:00"),
      (5L, "click", "2024-01-01 10:00:00"),
      // u6: an even-earlier extra view moves FIRST view before the click —
      // first-occurrence semantics repair the chain (08:00 < 09:00) → 2
      (6L, "view", "2024-01-01 10:00:00"),
      (6L, "click", "2024-01-01 09:00:00"),
      (6L, "view", "2024-01-01 08:00:00")))
    assert(stages == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 1, 6L -> 2))
  }

  test("WAU fan-out counts a user once per window it touches, never twice") {
    import spark.implicits._
    // one user active on two days inside the same 7-day window must count
    // once for that window; windows touched by either day still count them
    val df = Seq(
      (7L, "2024-01-10 12:00:00"), (7L, "2024-01-12 12:00:00"),
      (8L, "2024-01-12 06:00:00"))
      .map { case (u, ts) => (u, java.sql.Timestamp.valueOf(ts)) }
      .toDF("user_id", "ts")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
      .select(col("user_id"), col("day"), explode(sequence(lit(0), lit(6))).as("i"))
      .select(col("user_id"), (col("day") - col("i")).as("start_day"))
      .groupBy(col("start_day"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .collect().map(r => r.getAs[Long]("start_day") -> r.getAs[Long]("wau")).toMap
    val day10 = java.time.LocalDate.of(2024, 1, 10).toEpochDay
    val day12 = day10 + 2
    // window [10, 16] covers both of u7's days AND u8 → 2, u7 once
    assert(df(day10) == 2L)
    // window [12, 18] covers u7's second day and u8 → 2
    assert(df(day12) == 2L)
    // window [4, 10] reaches only day 10 → u7 alone
    assert(df(day10 - 6) == 1L)
    // window [8, 14] covers day 10 and day 12 → both users, u7 once
    assert(df(day10 - 2) == 2L)
    // the fan-out emits exactly the windows touching an active day
    assert(df.keys.min == day10 - 6 && df.keys.max == day12)
  }

  test("CUSUM prefix-sum identity equals Page's sequential recurrence (property)") {
    // ts_cusum / streaming CusumState compute S+ = C − runmin(C),
    // S− = runmax(C) − C instead of the stateful fold; the identity must
    // hold for ANY integer series, not just the corpus. 200 seeded
    // pseudo-random series, including negatives and zeros.
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(40)
      val xs = Array.fill(n)(rnd.nextInt(2001) - 500L)
      val mu = xs.sum / xs.length
      // direct recurrence (Page 1954)
      var sp = 0L; var sn = 0L
      val direct = xs.map { x =>
        sp = math.max(0L, sp + (x - mu))
        sn = math.max(0L, sn - (x - mu))
        (sp, sn)
      }
      // prefix-sum identity
      var c = 0L; var mn = 0L; var mx = 0L
      val identity = xs.map { x =>
        c += x - mu
        mn = math.min(mn, c); mx = math.max(mx, c)
        (c - mn, mx - c)
      }
      assert(direct.toSeq == identity.toSeq,
        s"identity diverged for series ${xs.toSeq} (mu=$mu)")
    }
  }
}
