package graft

import java.sql.Timestamp
import graft.stages.Merge
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based SCD2 invariants: for ANY change log and ANY way of
  * splitting it into ordered batches, folding the batches through
  * `Merge.scd2Upsert` equals the single-shot rebuild from the full log —
  * the batch-split transparency the `scd2_user_status` oracle checks once
  * at a fixed cut, here checked across random logs and random cuts. Also
  * pins the structural invariants every SCD2 consumer relies on: per key,
  * intervals chain exactly (`effective_to` = next `effective_from`),
  * exactly one open current version, and no two consecutive versions
  * carry the same attribute tuple.
  *
  * Attributes are a PAIR drawn from {"a", "b", "", NULL} so the generator
  * covers the fingerprint's adversarial tuples: ("a",NULL) vs (NULL,"a"),
  * NULL vs "" — the cases a bare concat_ws collapses (it skips nulls),
  * which would turn real changes into silent no-ops.
  *
  * Logs are generated with strictly distinct (key, ts) pairs — the same
  * uniqueness the event corpus provides — because simultaneous
  * contradictory changes for one key have no defined SCD2 order.
  */
object Scd2Properties extends Properties("Scd2") {

  private lazy val spark = TestSpark.session

  private val scd2Schema = StructType(Seq(
    StructField("k", StringType),
    StructField("attr", StringType),
    StructField("attr2", StringType),
    StructField("effective_from", TimestampType),
    StructField("effective_to", TimestampType),
    StructField("is_current", BooleanType)))

  private val attrGen: Gen[String] = Gen.oneOf("a", "b", "", null)

  private val logGen: Gen[List[(String, String, String, Long)]] = for {
    n <- Gen.choose(1, 40)
    keys <- Gen.listOfN(n, Gen.choose(1, 5).map(i => s"k$i"))
    attrs <- Gen.listOfN(n, attrGen)
    attrs2 <- Gen.listOfN(n, attrGen)
    // distinct minutes per row -> (key, ts) pairs unique by construction
    mins <- Gen.pick(n, 0 until 2000).map(_.toList)
  } yield keys.lazyZip(attrs).lazyZip(attrs2).lazyZip(mins.map(_.toLong)).toList

  private def incomingDf(rows: List[(String, String, String, Long)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("attr", StringType),
      StructField("attr2", StringType), StructField("change_ts", TimestampType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, a, a2, m) =>
        Row(k, a, a2, new Timestamp(1704067200000L + m * 60000L)) }, 2), schema)
  }

  private def emptyScd2: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], scd2Schema)

  private def shape(d: DataFrame): Seq[(String, (String, String), Timestamp, Option[Timestamp], Boolean)] =
    d.collect().map(r => (r.getString(0), (r.getString(1), r.getString(2)),
      r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
      .sortBy(t => (t._1, t._3.getTime)).toSeq

  property("batch-split transparency + interval invariants") =
    Prop.forAllNoShrink(logGen, Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) {
      (log, cutA, cutB) =>
        val sorted = log.sortBy(_._4)
        val Seq(c1, c2) = Seq(cutA, cutB).sorted.map(c => (c * log.size).toInt)
        val (b1, rest) = sorted.splitAt(c1)
        val (b2, b3) = rest.splitAt(c2 - c1)
        val folded = Seq(b1, b2, b3).filter(_.nonEmpty).foldLeft(emptyScd2) {
          (acc, batch) => Merge.scd2Upsert(acc, incomingDf(batch), Seq("k"), Seq("attr", "attr2"))
        }
        val single = Merge.scd2Upsert(emptyScd2, incomingDf(sorted), Seq("k"), Seq("attr", "attr2"))
        val f = shape(folded)
        val equalsSingle = f == shape(single)

        val byKey = f.groupBy(_._1).values
        val chained = byKey.forall { vs =>
          vs.sliding(2).forall {
            case Seq(prev, next) =>
              prev._4.contains(next._3) && !prev._5
            case _ => true
          } && vs.last._4.isEmpty && vs.last._5
        }
        val oneCurrentPerKey = byKey.forall(_.count(_._5) == 1)
        val noConsecutiveDup = byKey.forall(
          _.sliding(2).forall {
            case Seq(prev, next) => prev._2 != next._2
            case _ => true
          })
        equalsSingle && chained && oneCurrentPerKey && noConsecutiveDup
    }
}
