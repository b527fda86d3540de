package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof of the `IncrementalLedger` scaladoc claim that the AvailableNow
  * ledger drain is "checkpointable and restartable": a drain CRASHES
  * after its first micro-batch committed (exception injected in the
  * second batch before any sink write), and a second drain pointed at
  * the SAME checkpoint and SAME target table resumes exactly where the
  * first died — replaying the failed batch, reloading aggregation +
  * dedup state from the checkpoint, never re-applying the committed
  * batch — and the settled ledger equals the all-batch computation.
  * This is the end-to-end exactly-once story: checkpoint offsets ×
  * restored state store × idempotent MergeTable upsert.
  */
class StreamRestartSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("AvailableNow ledger drain resumes from its checkpoint after a mid-drain crash") {
    import graft.streaming.{EventStream, IncrementalLedger, StateDefaults}
    // time-slice sf0.001 events into 3 contiguous files so
    // maxFilesPerTrigger=1 yields 3 micro-batches
    val src = graft.stages.TempDirs.scratch("graft_restart_events_")
    val raw = EventStream.readBatch(spark, "/root/testdata/sf0.001")
      .withColumn("_slice", ntile(3).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"))))
    for (i <- 1 to 3) {
      val tmp = graft.stages.TempDirs.scratch(s"graft_restart_tmp_${i}_")
      raw.filter(col("_slice") === i).drop("_slice")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      val f = try part.filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst().get() finally part.close()
      java.nio.file.Files.move(f, java.nio.file.Paths.get(src, s"events-$i.parquet"))
    }

    val ckpt = graft.stages.TempDirs.scratch("graft_restart_ckpt_")
    val target = graft.stages.MergeTable.scratch(Seq("user_id", "year", "month"))
    val schema = StateDefaults.withNanosRead(spark) {
      IncrementalLedger.monthlyAggStream(spark, src,
        maxFilesPerTrigger = Some(1), glob = "events-*.parquet").schema
    }
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)

    def drain(crashOnSecondBatch: Boolean): Unit = StateDefaults.withNanosRead(spark) {
      val agg = IncrementalLedger.monthlyAggStream(spark, src,
        maxFilesPerTrigger = Some(1), glob = "events-*.parquet")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val seen = new java.util.concurrent.atomic.AtomicLong(0L)
        val q = agg.writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            // crash BEFORE the sink write: the failed batch must not be
            // marked committed, so the restart replays it
            if (crashOnSecondBatch && seen.incrementAndGet() == 2L) {
              crashed.set(true)
              throw new RuntimeException("injected crash")
            }
            target.upsert(batch.toDF())
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination()
        catch {
          case _: org.apache.spark.sql.streaming.StreamingQueryException =>
            assert(crashOnSecondBatch, "only the injected crash may fail the drain")
        } finally if (q.isActive) q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    drain(crashOnSecondBatch = true)
    assert(crashed.get, "the second micro-batch must have been reached and crashed")
    // the crashed drain committed SOMETHING (batch 1) but not everything
    val partial = target.read(spark, schema).count()
    drain(crashOnSecondBatch = false)   // resume: same checkpoint, same target

    val settled = target.read(spark, schema)
      .orderBy("user_id", "year", "month").collect().map(_.toSeq).toSeq
    val expected = EventStream.readBatch(spark, src, "events-*.parquet")
      .dropDuplicates("event_id")
      .groupBy(col("user_id"), year(col("ts")).as("year"), month(col("ts")).as("month"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("user_id", "year", "month").collect().map(_.toSeq).toSeq
    assert(settled == expected,
      s"resumed drain must equal the all-batch ledger (partial had $partial rows)")
    assert(settled.nonEmpty)
  }
}
