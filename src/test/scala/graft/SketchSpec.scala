package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketch

/** KMV sketch semantics: bounded estimate error, and the mergeability that
  * makes the sketch distributable — the k smallest hashes of a union are
  * computable from each half's k smallest alone.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val k = 32

  private def hashes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("user_id")).distinct()
      .withColumn("_h", expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .orderBy(col("_h")).limit(k)
      .collect().map(_.getAs[Long]("_h")).toSeq

  test("Misra-Gries: candidate set covers every true heavy hitter at any partitioning") {
    import spark.implicits._
    // 12 distinct tokens; "hot" is 40% of the stream, "warm" 20%, the
    // rest split the remainder — with k=4, guarantee covers count > n/5
    val rows = Seq.fill(200)("hot") ++ Seq.fill(100)("warm") ++
      (1 to 10).flatMap(i => Seq.fill(20)(s"cold$i"))
    val n = rows.size
    val exactHeavy = rows.groupBy(identity).collect {
      case (t, occ) if occ.size.toLong * 5 > n => t
    }.toSet
    for (parts <- Seq(1, 7, 32)) {
      val ds = spark.createDataset(rows).repartition(parts).as[String]
      val cands = ds.select(graft.functions.MgAggregator.mg(4).toColumn)
        .collect().head
      assert(cands.size <= 4, s"summary over capacity at $parts partitions")
      assert(exactHeavy.subsetOf(cands.toSet),
        s"guarantee broken at $parts partitions: $exactHeavy vs $cands")
    }
  }

  test("estimate is within 50% of exact on the corpus") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("g", lit(1))
    val row = Sketch.kmvDistinct(ev, Seq("g"), "user_id", k).collect().head
    val exact = row.getAs[Long]("exact").toDouble
    val est = row.getAs[Double]("estimate")
    assert(math.abs(est - exact) / exact < 0.5, s"estimate $est vs exact $exact")
  }

  test("single-pass Aggregator sketch equals the window-form sketch") {
    import spark.implicits._
    import graft.functions.KmvAggregator
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val windowForm = Sketch.kmvDistinct(ev, Seq("event_type"), "user_id", k)
      .collect().map(r => r.getAs[String]("event_type") ->
        (Option(r.getAs[java.lang.Long]("kth_min_hash")).map(_.toLong),
          r.getAs[Double]("estimate"))).toMap
    val aggForm = ev
      .select(col("event_type"), expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(KmvAggregator.kmv(k).toColumn)
      .collect().map { case (t, out) => t -> (out.kth_min_hash, out.estimate) }.toMap
    assert(aggForm == windowForm)
  }

  test("sketches merge: k smallest of the union == merge of each half's k smallest") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val whole = hashes(ev)
    val h1 = hashes(ev.filter(col("event_id") % 2 === 0))
    val h2 = hashes(ev.filter(col("event_id") % 2 =!= 0))
    // driver-side sketch merge: union the two k-bounded summaries, keep k
    val merged = (h1 ++ h2).distinct.sorted.take(k)
    assert(merged == whole,
      "merging per-partition KMV summaries must reproduce the global summary")
  }

  test("CMS estimates are guaranteed overestimates and partition-independent") {
    import spark.implicits._
    import graft.functions.CmsAggregator
    val d = 4; val w = 64
    val xs = (0L until 2000L).map(i => i % 37)     // skewed small key space
    def sketchOf(ds: org.apache.spark.sql.Dataset[Long]): Seq[Long] =
      ds.select(CmsAggregator.cms(d, w).toColumn).collect().head
    val sketch = sketchOf(xs.toDS())
    def est(x: Long): Long =
      (0 until d).map(i => sketch(i * w + CmsAggregator.bucket(i, x, w))).min
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (x, n) =>
      assert(est(x) >= n, s"CMS must never underestimate: key $x est ${est(x)} < $n")
    }
    // at least the heavy keys should be exact-ish with w >> keys
    assert(truth.count { case (x, n) => est(x) == n } > 20)
    // merge correctness: the sketch is partitioning-independent
    assert(sketchOf(xs.toDS().repartition(13)) == sketch)
  }

  test("Bloom prune: zero false negatives, bounded false positives, partition-independent") {
    import spark.implicits._
    import graft.ops.BloomJoin
    val mBits = 1 << 12; val kH = 4
    val buildKeys = (0L until 500L).map(_ * 3) // multiples of 3
    val probeKeys = (0L until 6000L)
    val build = buildKeys.toDF("bk")
    def prunedOf(b: org.apache.spark.sql.DataFrame): Set[Long] =
      BloomJoin.prune(probeKeys.toDF("pk"), "pk", b, "bk", mBits, kH)
        .collect().map(_.getLong(0)).toSet
    val pruned = prunedOf(build)
    // no false negatives: every build key survives the prune
    buildKeys.foreach(k => assert(pruned.contains(k), s"false negative on $k"))
    // bounded false positives: m/n = 4096/500 bits/key, k=4 → fp ~ 5%
    val fps = pruned.size - buildKeys.size
    assert(fps.toDouble / (probeKeys.size - buildKeys.size) < 0.15,
      s"$fps false positives out of ${probeKeys.size - buildKeys.size}")
    // OR-merge correctness: the bitset is partitioning-independent
    assert(prunedOf(build.repartition(7)) == pruned)
  }

  test("HLL: estimate within tolerance, merge is elementwise max, partition-independent") {
    import spark.implicits._
    import graft.functions.HllAggregator
    val md = graft.functions.Md5Hash.newDigest()
    def sketchOf(xs: Seq[Long], parts: Int = 1): (String, Long, Double) = {
      val ds = xs.map(x => graft.functions.Md5Hash.top60(md, x.toString)).toDS()
      val out = ds.repartition(parts)
        .select(HllAggregator.hll().toColumn).collect().head
      (out.registers, out.sum_scaled, out.estimate)
    }
    val n = 5000
    val (regs, _, est) = sketchOf(0L until n.toLong)
    // m=64 → standard error 1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.4, s"estimate $est vs exact $n")
    // partitioning-independence == merge correctness (max is the union law)
    assert(sketchOf(0L until n.toLong, parts = 11)._1 == regs)
    // rho spot checks against the oracle's bin()/lpad/instr formula
    assert(HllAggregator.rho(0L) == 55)
    assert(HllAggregator.rho(1L) == 54)
    assert(HllAggregator.rho(5L) == 52)  // bin(5)=101 → first '1' at 52 of 54
    assert(HllAggregator.rho((1L << 53)) == 1)
  }

  test("KMV set ops: union/Jaccard/intersection estimates near truth, partition-independent") {
    import spark.implicits._
    import graft.ops.Sketch
    // A = 0..999, B = 500..1499: union 1500, intersection 500, J = 1/3
    val rows = (0L until 1000L).map(("a", _)) ++ (500L until 1500L).map(("b", _))
    val df = rows.toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketch.kmvSetOps(d, "g", "v", "a", "b", k = 64).collect().head
    val r = run(df)
    assert(r.getAs[Long]("exact_union") == 1500L)
    assert(r.getAs[Long]("exact_intersection") == 500L)
    // k=64 → ~13% standard error; allow 3 sigma
    assert(math.abs(r.getAs[Double]("est_union") - 1500.0) / 1500.0 < 0.4)
    assert(math.abs(r.getAs[Double]("est_jaccard") - 1.0 / 3.0) < 0.25)
    assert(math.abs(r.getAs[Double]("est_intersection") - 500.0) / 500.0 < 0.75)
    // sketches are merge-law deterministic: partitioning cannot move a bit
    assert(run(df.repartition(17)).toSeq == r.toSeq)
  }

  test("hash-sample quantiles: partition-independent, exact for small groups, sane for big") {
    import spark.implicits._
    import graft.ops.Sketch
    // group 'small' has 9 rows (< k) → sample IS the group, est == exact;
    // group 'big' has 1001 rows of values 0..1000 → exact lower median 500
    val rows = (0 until 9).map(i => ("small", i.toLong, i * 10.0)) ++
      (0 until 1001).map(i => ("big", 100L + i, i.toDouble))
    val df = rows.toDF("g", "id", "value")
    val r = Sketch.hashSampleQuantiles(df, Seq("g"), "value", "id", k = 64)
      .orderBy("g").collect()
      .map(x => (x.getAs[String]("g"), x.getAs[Long]("n_total"),
        x.getAs[Long]("n_sample"), x.getAs[Double]("est_median"),
        x.getAs[Double]("exact_median")))
    val big = r(0); val small = r(1)
    assert(small == ("small", 9L, 9L, 40.0, 40.0))   // 5th of 0,10..80
    assert(big._2 == 1001L && big._3 == 64L && big._5 == 500.0)
    // a uniform 64-sample's median lands well inside the central half
    assert(big._4 > 250.0 && big._4 < 750.0, s"sample median ${big._4} implausible")
    // determinism under partitioning (the mergeable-sample property)
    val r13 = Sketch.hashSampleQuantiles(df.repartition(13), Seq("g"), "value", "id", k = 64)
      .orderBy("g").collect().map(x => (x.getAs[String]("g"), x.getAs[Double]("est_median")))
    assert(r13.toSeq == r.map(x => (x._1, x._4)).toSeq)
  }

  test("bloom FPR census: zero false negatives, saturation reads full-pass") {
    import spark.implicits._
    val a = (1L to 400L).map(i => Tuple1(i * 7)).toDF("k")
    val b = (1L to 400L).map(i => Tuple1(i * 7 + 3)).toDF("k")  // disjoint
    // probing the filter with ITS OWN keys: every key passes (the no-false-
    // negative guarantee), reported as n_false_pass == n_probe here because
    // the census labels every pass on a probe set as a pass
    val self = graft.ops.Sketch.bloomFprCensus(a, a, "k", mBits = 65536, k = 3)
      .collect().head
    assert(self.getAs[Long]("n_false_pass") == self.getAs[Long]("n_probe"))
    assert(self.getAs[Long]("fpr_per_10k") == 10000L)
    // a disjoint probe set at healthy fill: FPR far below fill^k upper noise
    val dis = graft.ops.Sketch.bloomFprCensus(a, b, "k", mBits = 65536, k = 3)
      .collect().head
    assert(dis.getAs[Long]("n_build") == 400L && dis.getAs[Long]("n_probe") == 400L)
    assert(dis.getAs[Long]("fpr_per_10k") < 100L, s"unexpected FPR: $dis")
    // a saturated filter (m tiny) passes EVERYTHING — the failure mode the
    // census exists to surface before a join prune ships
    val sat = graft.ops.Sketch.bloomFprCensus(a, b, "k", mBits = 64, k = 3)
      .collect().head
    assert(sat.getAs[Long]("fpr_per_10k") == 10000L)
    assert(sat.getAs[Long]("fill_per_10k") == 10000L)
  }
}
