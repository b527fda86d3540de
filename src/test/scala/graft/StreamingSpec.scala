package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IncrementalLedger

/** Streaming semantics: cross-batch business-key dedup (the reference's
  * ON CONFLICT idempotence) and streaming==batch agreement on the corpus.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("cross-batch duplicate business keys are dropped (SCD0 idempotence)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val sink = s"dedup_sink_${System.nanoTime()}"
    val q = input.toDF()
      .toDF("event_id", "ts", "user_id", "value")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,2)")).cast("double").as("total"))
      .writeStream.outputMode(OutputMode.Complete).format("memory").queryName(sink).start()
    def ts(s: String) = Timestamp.valueOf(s)
    input.addData((1L, ts("2024-01-01 10:00:00"), 7L, 10.0))
    q.processAllAvailable()
    // second batch re-delivers event 1 (late replay) + a fresh event
    input.addData((1L, ts("2024-01-01 10:00:00"), 7L, 10.0),
                  (2L, ts("2024-01-01 10:30:00"), 7L, 5.0))
    q.processAllAvailable()
    val row = spark.table(sink).collect().head
    q.stop()
    assert(row.getAs[Long]("n") == 2L)          // duplicate NOT double-counted
    assert(row.getAs[Double]("total") == 15.0)
  }

  test("update-mode foreachBatch merge: each batch ships only changed keys, target converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val target = graft.stages.MergeTable.scratch(Seq("user_id", "year", "month"))
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val agg = input.toDF()
      .toDF("event_id", "ts", "user_id", "value")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy($"user_id", year($"ts").as("year"), month($"ts").as("month"))
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // two actions on the same micro-batch (count + merge) — persist per
        // the foreachBatch contract, or the second evaluation re-runs the
        // stateful plan (and RocksDB store instances don't allow a reload
        // while the first evaluation's acquisition is live)
        batch.persist()
        try {
          batchSizes.synchronized { batchSizes += batch.count() }
          target.upsert(batch.toDF())
        } finally batch.unpersist()
      }
      .start()
    def ts(s: String) = Timestamp.valueOf(s)
    input.addData((1L, ts("2024-01-01 10:00:00"), 7L, 10.0),
                  (2L, ts("2024-01-01 11:00:00"), 8L, 20.0))
    q.processAllAvailable()
    // batch 2: touches ONLY user 7 (plus a replay of event 1, which dedup drops)
    input.addData((1L, ts("2024-01-01 10:00:00"), 7L, 10.0),
                  (3L, ts("2024-01-01 10:30:00"), 7L, 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = target.read(spark, agg.schema)
      .orderBy("user_id").collect()
    assert(batchSizes.takeRight(1).head <= 1,
      s"update mode must re-emit only the changed key, emitted: $batchSizes")
    assert(rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
      r.getAs[Double]("total_value"))).toSeq ==
      Seq((7L, 2L, 15.0), (8L, 1L, 20.0)))
  }

  test("stream-stream interval join pairs across micro-batches, bounded by the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val vIn = MemoryStream[(Long, Timestamp, Long)]
    val bIn = MemoryStream[(Long, Timestamp, Long)]
    val views = vIn.toDF().toDF("v_user", "v_ts", "v_event").withWatermark("v_ts", "1 hour")
    val buys = bIn.toDF().toDF("b_user", "b_ts", "b_event").withWatermark("b_ts", "1 hour")
    val sink = s"sjoin_${System.nanoTime()}"
    val q = views.join(buys,
        $"v_user" === $"b_user" && $"b_ts" >= $"v_ts" &&
          $"b_ts" <= $"v_ts" + expr("INTERVAL 30 MINUTES"))
      .select($"v_event", $"b_event")
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName(sink).start()
    vIn.addData((7L, ts("2024-01-01 10:00:00"), 1L))
    q.processAllAvailable()
    // purchase arrives a BATCH LATER: the buffered view must still match;
    // a second purchase outside the 30-minute window must not
    bIn.addData((7L, ts("2024-01-01 10:10:00"), 2L),
                (7L, ts("2024-01-01 11:00:00"), 3L))
    q.processAllAvailable()
    val pairs = spark.table(sink).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(pairs == Set((1L, 2L)))
  }

  test("RocksDB is the streaming default; an explicitly pinned provider is respected") {
    import graft.streaming.StateDefaults
    val wasSet = spark.sessionState.conf.contains(StateDefaults.ProviderKey)
    val prev = if (wasSet) Some(spark.conf.get(StateDefaults.ProviderKey)) else None
    try {
      spark.conf.unset(StateDefaults.ProviderKey)
      StateDefaults.ensureRocksDB(spark)
      assert(spark.conf.get(StateDefaults.ProviderKey) == StateDefaults.RocksDB)
      // a user's explicit choice — even the HDFS-backed provider — wins
      val hdfs = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      spark.conf.set(StateDefaults.ProviderKey, hdfs)
      StateDefaults.ensureRocksDB(spark)
      assert(spark.conf.get(StateDefaults.ProviderKey) == hdfs)
    } finally prev match {
      case Some(v) => spark.conf.set(StateDefaults.ProviderKey, v)
      case None    => spark.conf.unset(StateDefaults.ProviderKey)
    }
  }

  test("HDFS-backed state store provider yields identical results (heap-state opt-out)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    try {
      val hdfs = IncrementalLedger.monthlyUserTotals(spark, "/root/testdata/sf0.001")
        .orderBy("user_id", "year", "month").collect()
      val batch = Tables.events(spark, "/root/testdata/sf0.001")
        .groupBy(col("user_id"), year(col("ts")).as("year"), month(col("ts")).as("month"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy("user_id", "year", "month").collect()
      assert(hdfs.length == batch.length && hdfs.length > 0)
      hdfs.zip(batch).foreach { case (h, b) => assert(h == b) }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("multi-batch drain (maxFilesPerTrigger=1) stays exactly-once across re-deliveries") {
    import spark.implicits._
    // two event FILES so the AvailableNow drain splits into two
    // micro-batches; event 1 is re-delivered in the second file with the
    // batches months apart in event time — the case a short dedup
    // watermark delay would leak (driver ADVICE.md finding)
    val dir = graft.stages.TempDirs.scratch("graft_multibatch_")
    def nanos(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000000L
    def writeEventsFile(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val tmp = graft.stages.TempDirs.scratch("graft_mb_tmp_")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(dir, name))
    }
    writeEventsFile("events1.parquet", Seq(
      (1L, nanos("2024-01-01 10:00:00"), 7L, "view", 10.0, "{}"),
      (2L, nanos("2024-03-05 09:00:00"), 8L, "view", 20.0, "{}")))
    writeEventsFile("events2.parquet", Seq(
      (1L, nanos("2024-01-01 10:00:00"), 7L, "view", 10.0, "{}"),  // re-delivery
      (3L, nanos("2024-03-06 11:00:00"), 7L, "view", 5.0, "{}")))
    val out = IncrementalLedger.monthlyUserTotals(spark, dir,
        maxFilesPerTrigger = Some(1), glob = "events*.parquet")
      .orderBy("user_id", "year", "month").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("year"), r.getAs[Int]("month"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
    assert(out.toSeq == Seq(
      (7L, 2024, 1, 1L, 10.0),   // event 1 counted ONCE despite the replay
      (7L, 2024, 3, 1L, 5.0),
      (8L, 2024, 3, 1L, 20.0)))
  }

  test("transformWithState carries ValueState across micro-batches (maxFilesPerTrigger=1)") {
    import spark.implicits._
    // user 7's events split across two FILES → two micro-batches: the
    // second batch's emission must include the first batch's counts
    // (state survived) and supersede it in the settled result
    val dir = graft.stages.TempDirs.scratch("graft_tws_multibatch_")
    def nanos(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000000L
    def writeEventsFile(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val tmp = graft.stages.TempDirs.scratch("graft_tws_tmp_")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(dir, name))
    }
    writeEventsFile("events1.parquet", Seq(
      (1L, nanos("2024-01-01 10:00:00"), 7L, "view", 10.50, "{}"),
      (2L, nanos("2024-01-02 09:00:00"), 8L, "view", 20.0, "{}")))
    writeEventsFile("events2.parquet", Seq(
      (3L, nanos("2024-02-01 11:00:00"), 7L, "buy", 5.25, "{}")))
    val out = graft.streaming.RunningState.runningTotalsDrain(spark, dir,
        maxFilesPerTrigger = Some(1), glob = "events*.parquet")
      .orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value")))
    assert(out.toSeq == Seq((7L, 2L, 15.75), (8L, 1L, 20.0)))
  }

  test("drain-output read: empty dir is a legitimate empty result, corrupt parquet raises") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("user_id", LongType)))
    // no part files at all (zero-match drain) → empty frame with the schema
    val emptyDir = graft.stages.TempDirs.scratch("graft_drain_empty_")
    val empty = graft.streaming.StreamJoin.readDrainOutput(spark, emptyDir, schema)
    assert(empty.count() == 0 && empty.schema == schema)
    // a corrupt part file must PROPAGATE, not read as empty: an exception
    // here is a real failure, and empty-but-plausible output would defeat
    // the oracle check
    val corruptDir = graft.stages.TempDirs.scratch("graft_drain_corrupt_")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(corruptDir, "part-00000-corrupt.snappy.parquet"),
      "this is not parquet".getBytes("UTF-8"))
    intercept[Exception] {
      graft.streaming.StreamJoin.readDrainOutput(spark, corruptDir, schema)
        .collect()
    }
  }

  test("sliding-window and chained-agg drains equal their batch twins (sentinel flush)") {
    val dir = "/root/testdata/sf0.001"
    val sw = graft.streaming.RunningState.slidingWindowTotalsDrain(spark, dir)
      .orderBy("window_start").collect()
    val swBatch = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "7 days", "1 day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("window_start"),
        col("n_events"), col("total_value"))
      .orderBy("window_start").collect()
    assert(sw.length == swBatch.length && sw.length > 0)
    sw.zip(swBatch).foreach { case (s, b) => assert(s == b) }
    // the sentinel's own windows must NOT leak into the drained result
    val ch = graft.streaming.RunningState.chainedDailyAggDrain(spark, dir)
      .orderBy("day").collect()
    val chBatch = Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("sv"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_types"), sum(col("n")).as("n_events"),
        sum(col("sv")).cast("double").as("total_value"))
      .orderBy("day").collect()
    assert(ch.length == chBatch.length && ch.length > 0)
    ch.zip(chBatch).foreach { case (s, b) => assert(s == b) }
  }

  test("sentinel drains on empty input return empty frames with the query schema") {
    val dir = graft.stages.TempDirs.scratch("graft_drain_noinput_")
    val sw = graft.streaming.RunningState.slidingWindowTotalsDrain(spark, dir)
    assert(sw.count() == 0 &&
      sw.columns.toSeq == Seq("window_start", "n_events", "total_value"))
    val ch = graft.streaming.RunningState.chainedDailyAggDrain(spark, dir)
    assert(ch.count() == 0 &&
      ch.columns.toSeq == Seq("day", "n_types", "n_events", "total_value"))
  }

  test("AvailableNow streaming drain equals batch aggregation on the corpus") {
    val streamed = IncrementalLedger.monthlyUserTotals(spark, "/root/testdata/sf0.001")
      .orderBy("user_id", "year", "month").collect()
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("user_id"), year(col("ts")).as("year"), month(col("ts")).as("month"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("user_id", "year", "month").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }
}
