package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, Trigger, ValueState}

/** Bottom-k-by-hash sample AS STREAMING STATE — the third mergeable-sketch
  * state twin beside [[SketchState]] (HLL) and [[CusumState]] (drift): the
  * live distributed order-statistics sample. The KMV property makes it
  * streamable with NO order sensitivity: the k smallest (md5 priority, id)
  * rows of a union are a function of the union only, so folding each
  * micro-batch into a k-row ValueState reaches exactly the batch sample,
  * and the drained final emission SHARES `sketch_sample_quantiles`' oracle
  * verbatim (est median from the state, exact median joined batch-side —
  * the same error-report contract).
  *
  * Scale posture: k rows per key forever — the streaming quantile problem
  * reduced to constant memory, and the same state doubles as the
  * persistable daily sketch (`sketch_bottomk_reaggregated` proves the
  * merge transparency the fold relies on).
  */
object SampleState extends Serializable {

  final case class PriRow(p: Long, id: Long, v: Double)

  final case class PriIn(event_type: String, p: Long, id: Long, v: Double)

  final case class SampleEmit(event_type: String, n_sample: Long,
                              est_median: Double)

  final class BottomKProcessor(k: Int)
      extends StatefulProcessor[String, PriIn, SampleEmit] {
    @transient private var st: ValueState[Seq[PriRow]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Seq[PriRow]]("bk",
        ExpressionEncoder[Seq[PriRow]](), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[PriIn],
                                 timers: TimerValues): Iterator[SampleEmit] = {
      val prev = if (st.exists()) st.get() else Vector.empty[PriRow]
      val buf = (prev ++ rows.map(r => PriRow(r.p, r.id, r.v)))
        .sortBy(r => (r.p, r.id)).take(k)
      st.update(buf)
      val byVal = buf.sortBy(r => (r.v, r.id))
      val median = byVal((math.ceil(byVal.size / 2.0) - 1).toInt)
      Iterator.single(SampleEmit(key, buf.size.toLong, median.v))
    }
  }

  /** Drain the events through the bottom-k state processor (AvailableNow),
    * join the exact corpus median batch-side — the exact output contract
    * of `sketch_sample_quantiles`, shared oracle and all.
    */
  def bottomKStateDrain(spark: SparkSession, sfDir: String,
                        k: Int = 64): DataFrame =
      StateDefaults.withRocksDB(spark) { StateDefaults.withNanosRead(spark) {
    import spark.implicits._
    val events = EventStream.readStream(spark, sfDir, "events.parquet", Map.empty)
      .select(col("event_type"),
        expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("p"),
        col("event_id").as("id"), col("value").as("v"))
      .as[PriIn]

    val updates = events
      .groupByKey(_.event_type)
      .transformWithState(new BottomKProcessor(k), TimeMode.None(),
        OutputMode.Update())

    val outDir = graft.stages.TempDirs.scratch("graft_bkst_drain_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = updates.writeStream
        .outputMode(OutputMode.Update)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[SampleEmit], id: Long) =>
          batch.withColumn("_batch", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      StateDefaults.awaitDrain(q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    val raw = StreamJoin.readDrainOutput(spark, outDir,
      updates.toDF().withColumn("_batch", lit(0L)).schema)
    val wLast = Window.partitionBy(col("event_type")).orderBy(col("_batch").desc)
    val sample = raw.withColumn("_r", row_number().over(wLast))
      .filter(col("_r") === 1)
      .select(col("event_type"), col("n_sample"), col("est_median"))

    val ev = graft.Tables.events(spark, sfDir)
    val wVal = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    val exact = ev.withColumn("_vr", row_number().over(wVal))
      .withColumn("_n", count(lit(1)).over(wAll))
      .filter(col("_vr") === ceil(col("_n") / 2.0))
      .select(col("event_type"), col("value").as("exact_median"),
        col("_n").as("n_total"))
    sample.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_total"), col("n_sample"),
        col("est_median"), col("exact_median"))
  }}
}
