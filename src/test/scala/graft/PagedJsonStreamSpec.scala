package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StateDefaults

/** The paginated source's MICRO-BATCH form: per-trigger admission control
  * (the reference's defensive page cap → a backlog drains as several paged
  * batches), page = partition inside each batch, byte-tailed offsets, and
  * checkpointed exactly-once across restart + append.
  */
class PagedJsonStreamSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def writeLines(path: String, is: Range): Unit = {
    val lines = is.map(i =>
      s"""{"order_id":"o$i","delivery_id":"d$i","courier_id":"c${i % 5}",""" +
        f""""address":"a","delivery_ts":"2024-05-${i % 28 + 1}%02d 10:00:00","rate":${i % 6},"sum":${i * 10}.00,"tip_sum":1.50}""" + "\n")
    Files.write(Paths.get(path), lines.mkString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def drainToParquet(src: String, out: String, ckpt: String,
                             pageSize: Int, maxPages: Int): Long = {
    val q = spark.readStream.format("graft.sources.PagedJsonSource")
      .option("path", src)
      .option("pageSize", pageSize.toString).option("maxPages", maxPages.toString)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    StateDefaults.awaitDrain(q)
    q.recentProgress.count(_.numInputRows > 0)
  }

  test("admission control pages a backlog into capped micro-batches; page = partition") {
    val dir = graft.stages.TempDirs.scratch("graft_pjstream_")
    val src = s"$dir/api.jsonl"
    writeLines(src, 0 until 230)
    // cap = 2 pages x 50 = 100 lines/trigger -> 230 lines need 3 batches
    val batches = drainToParquet(src, s"$dir/out", s"$dir/ckpt", 50, 2)
    assert(batches == 3, s"expected 3 capped micro-batches, got $batches")
    val rows = spark.read.parquet(s"$dir/out")
    assert(rows.count() == 230)
    // every record arrived exactly once
    assert(rows.select("json_response").distinct().count() == 230)
  }

  test("restart from checkpoint ingests ONLY appended records (exactly-once)") {
    val dir = graft.stages.TempDirs.scratch("graft_pjstream_")
    val src = s"$dir/api.jsonl"
    writeLines(src, 0 until 120)
    drainToParquet(src, s"$dir/out", s"$dir/ckpt", 50, 10)
    assert(spark.read.parquet(s"$dir/out").count() == 120)
    // the API accrues 40 more records; the restarted stream tails them
    writeLines(src, 120 until 160)
    val batches2 = drainToParquet(src, s"$dir/out", s"$dir/ckpt", 50, 10)
    assert(batches2 == 1, s"append fits one capped batch, got $batches2")
    val rows = spark.read.parquet(s"$dir/out")
    assert(rows.count() == 160)
    assert(rows.select("json_response").distinct().count() == 160)
    // a third drain with nothing new ingests nothing
    val batches3 = drainToParquet(src, s"$dir/out", s"$dir/ckpt", 50, 10)
    assert(batches3 == 0)
    assert(spark.read.parquet(s"$dir/out").count() == 160)
  }

  test("[from,to) window options filter server-side in the streaming readers") {
    val dir = graft.stages.TempDirs.scratch("graft_pjstream_")
    val src = s"$dir/api.jsonl"
    writeLines(src, 0 until 56) // days 01..28, two records each
    val q = spark.readStream.format("graft.sources.PagedJsonSource")
      .option("path", src)
      .option("from", "2024-05-10 00:00:00").option("to", "2024-05-12 00:00:00")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    StateDefaults.awaitDrain(q)
    val days = spark.read.parquet(s"$dir/out")
      .collect().map(_.getString(1).substring(8, 10)).toSet
    assert(days == Set("10", "11"))
  }
}
