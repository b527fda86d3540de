package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, Trigger, ValueState}

import graft.functions.HllAggregator

/** HyperLogLog AS STREAMING STATE — the live distinct-user counter a
  * fleet dashboard holds per event type: 64 registers (a single
  * `ValueState[Array[Int]]`, 64 ints in RocksDB) folded incrementally by
  * each micro-batch, the running estimate emitted in update mode. This is
  * the composition the mergeable-sketch family exists for — the SAME
  * register algebra as the batch aggregate ([[HllAggregator]]: shared
  * `rho`, shared harmonic-sum finish), so the drained stream's final
  * emission per key must equal the batch sketch bit-for-bit and the query
  * SHARES `sketch_hll_distinct`'s oracle verbatim.
  *
  * Scale posture: state is 64 ints per key regardless of user
  * cardinality — the unbounded-distinct problem (a per-user dedup state
  * grows with users; `dropDuplicates` state is corpus-bound) reduced to
  * constant memory per key, the reason HLL is THE streaming cardinality
  * tool. Update mode ships only touched keys per batch.
  */
object SketchState extends Serializable {

  final case class TypedHash(event_type: String, h: Long)

  final case class HllEmit(event_type: String, registers: String,
                           sum_scaled: Long, hll_estimate: Double)

  final class HllProcessor extends StatefulProcessor[String, TypedHash, HllEmit] {
    @transient private var regs: ValueState[Array[Int]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      regs = getHandle.getValueState[Array[Int]]("regs",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]](),
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TypedHash],
                                 timers: TimerValues): Iterator[HllEmit] = {
      val buf = if (regs.exists()) regs.get() else new Array[Int](HllAggregator.M)
      rows.foreach { e =>
        val bucket = (e.h % HllAggregator.M).toInt
        val r = HllAggregator.rho(e.h / HllAggregator.M)
        if (r > buf(bucket)) buf(bucket) = r
      }
      regs.update(buf)
      var sum = 0L
      var i = 0
      while (i < HllAggregator.M) { sum += 1L << (55 - buf(i)); i += 1 }
      val est = 2904.064 * math.pow(2.0, 55) / sum.toDouble
      Iterator.single(HllEmit(key, buf.mkString(","), sum, est))
    }
  }

  /** Drain the events through the HLL state processor (AvailableNow) and
    * return each type's FINAL emission joined with the exact distinct
    * count — the exact output contract of `sketch_hll_distinct`, shared
    * oracle and all.
    */
  def hllStateDrain(spark: SparkSession, sfDir: String): DataFrame =
      StateDefaults.withRocksDB(spark) { StateDefaults.withNanosRead(spark) {
    import spark.implicits._
    val events = EventStream.readStream(spark, sfDir, "events.parquet", Map.empty)
      .select(col("event_type"), expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .as[TypedHash]

    val updates = events
      .groupByKey(_.event_type)
      .transformWithState(new HllProcessor, TimeMode.None(), OutputMode.Update())

    val outDir = graft.stages.TempDirs.scratch("graft_hllst_drain_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = updates.writeStream
        .outputMode(OutputMode.Update)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[HllEmit], id: Long) =>
          batch.withColumn("_batch", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      StateDefaults.awaitDrain(q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    val raw = StreamJoin.readDrainOutput(spark, outDir,
      updates.toDF().withColumn("_batch", lit(0L)).schema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("_batch").desc)
    val sketch = raw.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(col("event_type"), col("registers"), col("sum_scaled"),
        col("hll_estimate"))
    val exact = graft.Tables.events(spark, sfDir).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    sketch.join(exact, Seq("event_type"))
  }}

  // ---- Misra-Gries AS STREAMING STATE: the live per-day heavy-hitter
  // monitor — the fourth sketch-state twin (HLL, CUSUM, bottom-k, now MG).

  final case class DayType(day: Int, event_type: String)
  final case class MgEmit(day: Int, cands: Seq[String])

  /** k-counter Misra-Gries summary per key as a single
    * `ValueState[Map[String, Long]]` (≤ k entries in RocksDB regardless of
    * the type space), the SAME decrement-all reduce as the batch
    * [[graft.functions.MgAggregator]]. The summary depends on arrival
    * order, but the GUARANTEE doesn't: any type with frequency >
    * n_day/(k+1) survives the day's summary — so the prune-then-verify
    * tail (union candidates → exact recount → integer threshold) is
    * deterministic and equals the batch form, oracle shared verbatim.
    */
  final class MgProcessor(k: Int) extends StatefulProcessor[Int, DayType, MgEmit] {
    @transient private var st: ValueState[Map[String, Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Map[String, Long]]("mg",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]](),
        TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[DayType],
                                 timers: TimerValues): Iterator[MgEmit] = {
      var buf = if (st.exists()) st.get() else Map.empty[String, Long]
      rows.foreach { e =>
        buf = buf.get(e.event_type) match {
          case Some(c)              => buf.updated(e.event_type, c + 1L)
          case None if buf.size < k => buf.updated(e.event_type, 1L)
          case None =>
            buf.iterator.map { case (t, c) => t -> (c - 1L) }
              .filter(_._2 > 0L).toMap
        }
      }
      st.update(buf)
      Iterator.single(MgEmit(key, buf.keys.toSeq.sorted))
    }
  }

  /** Drain the events through per-day MG state (AvailableNow), then run
    * the prune-then-verify tail over the FINAL per-day candidate unions —
    * the exact output contract of `sketch_mg_daily_merge`, shared oracle.
    */
  def mgStateDrain(spark: SparkSession, sfDir: String, k: Int = 4): DataFrame =
      StateDefaults.withRocksDB(spark) { StateDefaults.withNanosRead(spark) {
    import spark.implicits._
    val events = EventStream.readStream(spark, sfDir, "events.parquet", Map.empty)
      .select(dayofmonth(col("ts")).as("day"), col("event_type"))
      .as[DayType]

    val updates = events
      .groupByKey(_.day)
      .transformWithState(new MgProcessor(k), TimeMode.None(), OutputMode.Update())

    val outDir = graft.stages.TempDirs.scratch("graft_mgst_drain_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = updates.writeStream
        .outputMode(OutputMode.Update)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[MgEmit], id: Long) =>
          batch.withColumn("_batch", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      StateDefaults.awaitDrain(q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    val raw = StreamJoin.readDrainOutput(spark, outDir,
      updates.toDF().withColumn("_batch", lit(0L)).schema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("_batch").desc)
    val cands = raw.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(explode(col("cands")).as("t")).distinct()
      .collect().map(_.getString(0)).toSeq // bounded: <= k x |days|
    val ev = graft.Tables.events(spark, sfDir).select(col("event_type"))
    val total = ev.count()
    ev.filter(col("event_type").isin(cands: _*))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") * (k + 1) > total)
  }}

  // ---- Bitmap AS STREAMING STATE: the EXACT distinct counter — the
  // fifth sketch-state twin, and the streaming face of the persisted
  // bitmap index (sketch_bitmap_distinct). Where HLL state trades
  // exactness for 64 registers, the bitmap holds one bit per dense user
  // id (|ids|/8 bytes per key in RocksDB, grown on demand) and the
  // running count is exact at every emission. Bit-set union is
  // order-insensitive, so the drained final per key == batch
  // COUNT(DISTINCT) — the oracle is the plain exact aggregate.

  final case class TypedUser(event_type: String, user_id: Long)
  final case class BitmapEmit(event_type: String, n_users: Long)

  object BitmapProcessor {
    /** Dense-id ceiling: 2²⁶ ids bound per-key state at 8 MB. */
    val MaxDenseId: Long = 1L << 26
  }

  final class BitmapProcessor extends StatefulProcessor[String, TypedUser, BitmapEmit] {
    @transient private var bm: ValueState[Array[Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bm = getHandle.getValueState[Array[Long]]("bm",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TypedUser],
                                 timers: TimerValues): Iterator[BitmapEmit] = {
      var buf = if (bm.exists()) bm.get() else new Array[Long](1)
      rows.foreach { e =>
        // the bitmap contract is DENSE NON-NEGATIVE ids: a negative id
        // would index a negative word (AIOOBE mid-stream) and a huge id
        // would allocate id/64 longs of state — fail with a diagnosable
        // message instead. 2²⁶ ids = 8 MB/key ceiling; sparser or wider
        // id spaces belong to the HLL or roaring-style variants.
        require(e.user_id >= 0 && e.user_id < BitmapProcessor.MaxDenseId,
          s"BitmapProcessor: user_id ${e.user_id} outside the dense-id " +
            s"contract [0, ${BitmapProcessor.MaxDenseId}) — use HLL state " +
            "for sparse/wide id spaces")
        val word = (e.user_id >> 6).toInt
        if (word >= buf.length) buf = java.util.Arrays.copyOf(buf, word + 1)
        buf(word) |= 1L << (e.user_id & 63)
      }
      bm.update(buf)
      var n = 0L
      var i = 0
      while (i < buf.length) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
      Iterator.single(BitmapEmit(key, n))
    }
  }

  /** Drain the events through the bitmap state processor (AvailableNow)
    * and return each type's FINAL exact running count — == batch
    * COUNT(DISTINCT user_id) per type (order-insensitive bit union).
    */
  def bitmapStateDrain(spark: SparkSession, sfDir: String): DataFrame =
      StateDefaults.withRocksDB(spark) { StateDefaults.withNanosRead(spark) {
    import spark.implicits._
    val events = EventStream.readStream(spark, sfDir, "events.parquet", Map.empty)
      .select(col("event_type"), col("user_id"))
      .as[TypedUser]

    val updates = events
      .groupByKey(_.event_type)
      .transformWithState(new BitmapProcessor, TimeMode.None(), OutputMode.Update())

    val outDir = graft.stages.TempDirs.scratch("graft_bmst_drain_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = updates.writeStream
        .outputMode(OutputMode.Update)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[BitmapEmit], id: Long) =>
          batch.withColumn("_batch", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      StateDefaults.awaitDrain(q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    val raw = StreamJoin.readDrainOutput(spark, outDir,
      updates.toDF().withColumn("_batch", lit(0L)).schema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("_batch").desc)
    raw.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(col("event_type"), col("n_users"))
  }}
}
