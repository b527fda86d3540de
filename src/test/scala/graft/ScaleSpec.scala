package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity
import graft.stages.Skew

/** Scale-path equivalences: salted aggregation == direct groupBy, top-k
  * Aggregator == window top-k, bucketed join plans without exchanges.
  */
class ScaleSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("salted two-phase aggregation equals direct groupBy exactly") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("v", col("value").cast("decimal(18,2)"))
    val direct = events.groupBy(col("user_id"))
      .agg(sum(col("v")).as("v"), count(lit(1)).as("n_rows"))
      .collect().map(r => r.getLong(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    val salted = Skew.saltedAggregate(
        events, keys = Seq("user_id"), saltFrom = Seq(col("event_id")),
        salts = 8, sums = Seq("v"))
      .collect().map(r => r.getLong(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("single-pass TopK aggregator returns exactly the window top-k") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val window = Similarity.bruteForceTopK(emb, numQueries = 8, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val agg = Similarity.bruteForceTopKAgg(emb, numQueries = 8, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(agg == window)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // clean leftovers from previous JVM runs (in-memory catalog forgets
    // the tables but their warehouse dirs persist)
    Seq("orders_bucketed", "lineitem_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val o = Tables.orders(spark, "/root/testdata/sf0.001").select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001").select("l_orderkey", "l_quantity")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    val joined = spark.table("orders_bucketed")
      .join(spark.table("lineitem_bucketed"),
        col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides read pre-bucketed on the join key → SortMergeJoin with no
    // ShuffleExchange (broadcast of the small side is also acceptable-free)
    assert(!plan.contains("Exchange hashpartitioning") || plan.contains("BroadcastHashJoin"),
      s"unexpected shuffle in bucketed join plan:\n$plan")
    assert(joined.count() == li.count())
  }

  test("AQE coalesces undersized shuffle partitions at runtime (executed plan)") {
    // the 32-partition static shuffle config is a CEILING: on a small
    // aggregate AQE must collapse the post-shuffle partitions to a
    // handful, which is the mechanism that keeps the same query efficient
    // from sf0.001 to 100 TB without retuning shuffle.partitions
    val agged = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    agged.collect()
    val executed = agged.queryExecution.executedPlan.toString
    assert(executed.contains("AQEShuffleRead") && executed.contains("coalesced"),
      s"expected a runtime-coalesced shuffle read in:\n$executed")
    val parts = agged.rdd.getNumPartitions
    assert(parts < 32, s"AQE should coalesce below the static 32, got $parts")
  }

  test("date-partitioned STG layout prunes partitions at scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"), plan)
    val total = spark.read.parquet(dir).count()
    assert(pruned.count() > 0 && pruned.count() < total)
  }

  test("interval join under batch splits: wide 32-partition drain, one file per micro-batch") {
    import graft.streaming.{IncrementalLedger, StateDefaults, StreamJoin}
    import org.apache.spark.sql.expressions.Window
    // time-slice sf0.01 events into 5 contiguous-ts files, written in
    // slice order (file-name AND mod-time order match event time) — the
    // multi-day arrival pattern a production stream sees
    val src = graft.stages.TempDirs.scratch("graft_split_events_")
    locally {
      // EventStream.readBatch normalizes ts to TimestampType; the slice
      // files are therefore µs-era, which viewPurchasePairsSplit's probe
      // detects on read — the adaptive path under test end to end
      val raw = graft.streaming.EventStream.readBatch(spark, "/root/testdata/sf0.01")
        .withColumn("_slice", ntile(5).over(Window.orderBy(col("ts"))))
      for (i <- 1 to 5) {
        val tmp = graft.stages.TempDirs.scratch(s"graft_split_tmp_${i}_")
        raw.filter(col("_slice") === i).drop("_slice")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        val f = try part.filter(p => p.getFileName.toString.startsWith("part-"))
          .findFirst().get() finally part.close()
        java.nio.file.Files.move(f,
          java.nio.file.Paths.get(src, s"events-$i.parquet"))
      }
    }
    // the wide split drain: 32 shuffle partitions (4 stores × 32 stores
    // total), 5 changelog-checkpointed RocksDB commits; state per side is
    // bounded by window+delay of its watermark regardless of batch count
    val (split, batches) = StreamJoin.viewPurchasePairsSplit(spark, src)
    assert(batches >= 5, s"expected one micro-batch per slice file, got $batches")
    // must equal the single AvailableNow macro-batch drain bit-for-bit
    val single = StreamJoin.viewPurchasePairs(spark, "/root/testdata/sf0.01")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "view_event", "buy_event").collect().map(_.toSeq).toSeq
    val splitRows = rows(split)
    assert(splitRows == rows(single) && splitRows.nonEmpty,
      "cross-batch join state must compose to the macro-batch answer")
  }
}
