package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Curate
import graft.stages.MergeTable

/** End-to-end curation through a STORAGE boundary: the survivor stage is
  * merge-committed to a MergeTable and the census is computed from what
  * storage holds — the production shape — and must equal the in-query
  * cached form the oracle checks.
  */
class CurateSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  private def censusRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("labeled_lang", "predicted_lang").collect()
      .map(r => (r.getAs[String]("labeled_lang"), r.getAs[String]("predicted_lang"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"))).toSeq

  test("curation through a MergeTable equals the in-query cached form") {
    val cached = censusRows(Curate.curateCorpus(docs))
    val table = MergeTable.scratch(Seq("doc_id"))
    val stored = censusRows(Curate.curateCorpusThrough(docs, table))
    assert(stored == cached && stored.nonEmpty)
    // the survivor table is a real committed artifact other jobs can read
    assert(table.currentVersion.contains("v0"))
    assert(table.read(spark, docs.schema).count() > 0)
  }

  test("re-running the curation against the same table converges (idempotent merge)") {
    val table = MergeTable.scratch(Seq("doc_id"))
    val first = censusRows(Curate.curateCorpusThrough(docs, table))
    val survivorCount = table.read(spark, docs.schema).count()
    val second = censusRows(Curate.curateCorpusThrough(docs, table))
    assert(second == first)
    assert(table.read(spark, docs.schema).count() == survivorCount)
    assert(table.currentVersion.contains("v1")) // a new version, same content
  }

  test("a later batch evicts a previously committed survivor it duplicates (cross-batch dedup)") {
    import org.apache.spark.sql.functions.{col, lit}
    val table = MergeTable.scratch(Seq("doc_id"))
    Curate.curateCorpusThrough(docs, table)
    val survivors = table.read(spark, docs.schema)
    val beforeCount = survivors.count()
    // send a new batch carrying a committed survivor's exact text under a
    // LOWER doc_id: the canonical moves to the new doc, so the old
    // survivor must leave the durable table — within-batch-only dedup
    // would keep both forever (driver ADVICE.md finding)
    val victim = survivors.orderBy(col("doc_id").desc).limit(1)
    val victimId = victim.collect().head.getAs[Long]("doc_id")
    val clone = victim.withColumn("doc_id", lit(-1L))
    Curate.curateCorpusThrough(clone, table)
    val after = table.read(spark, docs.schema)
    assert(after.filter(col("doc_id") === victimId).count() == 0,
      "the old twin must be evicted by the new canonical")
    assert(after.filter(col("doc_id") === -1L).count() == 1)
    assert(after.count() == beforeCount) // one evicted, one admitted
  }

  test("batch-vs-index incremental curation equals the recompute form, evictions included") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, slice, split}
    val all = docs
    val b1 = all.filter(col("doc_id") % 2 === 0)
    // recompute path (the oracle-checked semantics)
    val tableR = MergeTable.scratch(Seq("doc_id"))
    Curate.curateCorpusThrough(b1, tableR)
    // incremental path over the same first batch
    val tableI = MergeTable.scratch(Seq("doc_id"))
    val index = MergeTable.scratch(Seq("doc_id"))
    Curate.curateCorpusIncremental(b1, tableI, index)

    // batch 2: the odd docs, PLUS an exact clone of a committed survivor
    // under a lower id (exact eviction) and a near-dup of another survivor
    // under a lower id (LSH eviction through the index)
    val survivors = tableR.read(spark, all.schema).orderBy(col("doc_id").desc)
    val exactVictim = survivors.limit(1)
    val nearVictim = survivors.orderBy(col("doc_id")).limit(1)
    val exactClone = exactVictim.withColumn("doc_id", lit(-1L))
    val nearClone = nearVictim.withColumn("doc_id", lit(-2L))
      .withColumn("text", concat_ws(" ",
        slice(split(col("text"), " "), lit(1),
          org.apache.spark.sql.functions.size(split(col("text"), " ")) - 1)))
    val b2 = all.filter(col("doc_id") % 2 === 1)
      .unionByName(exactClone).unionByName(nearClone)

    val censusR = censusRows(Curate.curateCorpusThrough(b2, tableR))
    val censusI = censusRows(Curate.curateCorpusIncremental(b2, tableI, index))
    assert(censusI == censusR && censusI.nonEmpty)
    // the delta-sized census (index feature columns, zero table text reads)
    // must equal the text-scan census of the committed survivor table
    assert(censusRows(Curate.censusOf(tableI.read(spark, all.schema))) == censusI)
    def ids(t: MergeTable) = t.read(spark, all.schema)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(tableI) == ids(tableR), "survivor sets must be identical")
    // the evictions actually happened (the clones carry the lower ids)
    assert(ids(tableI).contains(-1L) && ids(tableI).contains(-2L))
    assert(!ids(tableI).contains(exactVictim.collect().head.getAs[Long]("doc_id")))
    // the index tracks the table exactly
    val idxIds = index.read(spark, Curate.indexSchema)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(idxIds == ids(tableI))
  }

  test("incremental curation reads the INDEX, not the table's text (poisoned-index proof)") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, slice, split}
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val table = MergeTable.scratch(Seq("doc_id"))
    val index = MergeTable.scratch(Seq("doc_id"))
    Curate.curateCorpusIncremental(b1, table, index)
    val survivors = table.read(spark, docs.schema)
    val victim = survivors.orderBy(col("doc_id")).limit(1)
    val victimId = victim.collect().head.getAs[Long]("doc_id")
    // poison the victim's index entry (no bands, no shingles): if the
    // engine really answers from the index, the near-dup below goes
    // UNDETECTED; a text rescan of the table would still catch it
    val poisoned = index.read(spark, Curate.indexSchema)
      .withColumn("hbase", org.apache.spark.sql.functions.when(
        col("doc_id") === victimId, lit(null)).otherwise(col("hbase")))
      .withColumn("sig", org.apache.spark.sql.functions.when(
        col("doc_id") === victimId, lit(null)).otherwise(col("sig")))
    index.replace(poisoned)
    val nearClone = victim.withColumn("doc_id", lit(-2L))
      .withColumn("text", concat_ws(" ",
        slice(split(col("text"), " "), lit(1),
          org.apache.spark.sql.functions.size(split(col("text"), " ")) - 1)))
    Curate.curateCorpusIncremental(nearClone, table, index)
    val ids = table.read(spark, docs.schema)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(victimId) && ids.contains(-2L),
      "with the index entry poisoned the pair must go undetected — " +
        "proving pair generation reads the index, never the table's text")
  }

  test("incremental curation bootstraps the index from a table it does not track") {
    import org.apache.spark.sql.functions.col
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    // table populated WITHOUT an index — the curateCorpusThrough shape;
    // before the coherence gate this run silently deleted every survivor
    // (empty index ⇒ empty tFinalIdx ⇒ survivors = ∅) — driver ADVICE
    val table = MergeTable.scratch(Seq("doc_id"))
    Curate.curateCorpusThrough(b1, table)
    assert(table.read(spark, docs.schema).count() > 0)
    val index = MergeTable.scratch(Seq("doc_id"))
    // recompute reference over the same batch sequence
    val tableR = MergeTable.scratch(Seq("doc_id"))
    Curate.curateCorpusThrough(b1, tableR)
    val censusR = censusRows(Curate.curateCorpusThrough(b2, tableR))
    val censusI = censusRows(Curate.curateCorpusIncremental(b2, table, index))
    assert(censusI == censusR && censusI.nonEmpty)
    def ids(t: MergeTable) = t.read(spark, docs.schema)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(table) == ids(tableR), "bootstrap must preserve committed survivors")
    // and the rebuilt index now tracks the table exactly
    val idxIds = index.read(spark, Curate.indexSchema)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(idxIds == ids(table))
  }

  test("a desynced index (missing entries) is rebuilt instead of evicting survivors") {
    import org.apache.spark.sql.functions.col
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    val table = MergeTable.scratch(Seq("doc_id"))
    val index = MergeTable.scratch(Seq("doc_id"))
    Curate.curateCorpusIncremental(b1, table, index)
    // crashed-writer shape: the table committed but the index kept only a
    // quarter of its entries
    index.replace(index.read(spark, Curate.indexSchema)
      .filter(col("doc_id") % 4 === 0))
    val tableR = MergeTable.scratch(Seq("doc_id"))
    Curate.curateCorpusThrough(b1, tableR)
    val censusR = censusRows(Curate.curateCorpusThrough(b2, tableR))
    val censusI = censusRows(Curate.curateCorpusIncremental(b2, table, index))
    assert(censusI == censusR && censusI.nonEmpty)
    def ids(t: MergeTable) = t.read(spark, docs.schema)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(table) == ids(tableR))
  }

  test("census from index feature columns equals the text-scan census") {
    val stored = censusRows(Curate.censusOfIndex(Curate.curationIndexOf(docs)))
    val scanned = censusRows(Curate.censusOf(docs))
    assert(stored == scanned && stored.nonEmpty)
  }

  test("manifest-count coherence gate: equal counts skip the scan, desync still rebuilds") {
    import org.apache.spark.sql.functions.col
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val table = MergeTable.scratch(Seq("doc_id"))
    val index = MergeTable.scratch(Seq("doc_id"))
    Curate.curateCorpusIncremental(b1, table, index)
    // healthy lockstep commit: manifest counts agree and are real counts
    val nT = table.manifestRowCount(table.currentVersion.get)
    val nI = index.manifestRowCount(index.currentVersion.get)
    assert(nT.isDefined && nT == nI && nT.get > 0L)
    // crashed-writer shape: index a generation behind with a different
    // count — the manifest gate alone must flag it (counts diverge)
    index.replace(index.read(spark, Curate.indexSchema)
      .filter(col("doc_id") % 4 === 0))
    val nI2 = index.manifestRowCount(index.currentVersion.get)
    assert(nI2.isDefined && nI2 != nT)
  }

  test("domain cap census: per-source keep counts honor the cap, totals reconcile") {
    import spark.implicits._
    val tiny = (0L until 30L).map(i =>
      (i, if (i < 25) "hot.example" else "cold.example", 100L + i))
      .toDF("doc_id", "source", "n_chars")
    val census = Curate.domainCapCensus(tiny, cap = 10).orderBy("source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("max_kept_chars")))
    // hot source is capped at 10 and keeps its LONGEST docs; cold keeps all
    assert(census.toSeq == Seq(
      ("cold.example", 5L, 5L, 129L),
      ("hot.example", 25L, 10L, 124L)))
  }

  test("repetitionFlags (pushdown-safe aggregate form) == repetitionStats flags") {
    val a = graft.ops.TextAnalysis.repetitionStats(docs)
      .select("doc_id", "is_repetitive").orderBy("doc_id").collect().toSeq
    val b = graft.ops.TextAnalysis.repetitionFlags(docs)
      .orderBy("doc_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("release pipeline replay: same corpus, same table -> identical report, converged release") {
    def reportRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("stage", "shard").collect()
        .map(r => (r.getAs[String]("stage"), r.getAs[Int]("shard"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("checksum"))).toSeq
    val table = MergeTable.scratch(Seq("doc_id"))
    val first = reportRows(Curate.releaseCorpus(docs, table))
    assert(first.exists { case (s, _, n, _, _) => s == "0_raw" && n > 0 },
      "raw funnel row must count the corpus")
    // the funnel is monotone: each stage keeps at most the previous stage's docs
    val funnel = first.filter(_._1 != "6_shard").map(t => (t._1, t._3)).sortBy(_._1)
    assert(funnel.sliding(2).forall {
      case Seq((_, a), (_, b)) => b <= a; case _ => true },
      s"funnel must be monotone non-increasing: $funnel")
    // shard rows reconcile with the released (post-mixture) funnel row
    val released = first.find(_._1 == "5_mixture").get
    val shards = first.filter(_._1 == "6_shard")
    assert(shards.map(_._3).sum == released._3 && shards.map(_._4).sum == released._4,
      "shard manifest must tile the released corpus exactly")
    val second = reportRows(Curate.releaseCorpus(docs, table))
    assert(second == first, "replay must converge to the identical report")
    assert(table.currentVersion.contains("v1"), "replay commits a new version, same content")
  }

  test("incremental release: batch replay is idempotent and equals the one-batch release") {
    import org.apache.spark.sql.functions.col
    def reportRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("stage", "shard").collect()
        .map(r => (r.getAs[String]("stage"), r.getAs[Int]("shard"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("checksum"))).toSeq
    def tables() = (MergeTable.scratch(Seq("doc_id")),
      MergeTable.scratch(Seq("doc_id")), MergeTable.scratch(Seq("doc_a", "doc_b")))

    // two batches, then the SECOND batch replayed: the funnel and all
    // three committed tables must converge to the pre-replay state
    val (arch, idx, prs) = tables()
    Curate.releaseIncremental(docs.filter(col("doc_id") % 2 === 0), arch, idx, prs)
    val afterTwo = reportRows(
      Curate.releaseIncremental(docs.filter(col("doc_id") % 2 === 1), arch, idx, prs))
    val replay = reportRows(
      Curate.releaseIncremental(docs.filter(col("doc_id") % 2 === 1), arch, idx, prs))
    assert(replay == afterTwo, "batch replay must reproduce the identical funnel")
    // and the whole incremental chain equals the single-batch from-scratch run
    val (a2, i2, p2) = tables()
    val oneShot = reportRows(Curate.releaseIncremental(docs, a2, i2, p2))
    assert(afterTwo == oneShot,
      "two-batch incremental release must equal the one-batch release")
    // archive convergence: same survivor ids both ways
    val incrIds = arch.read(spark, docs.schema)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val oneIds = a2.read(spark, docs.schema)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(incrIds == oneIds, "archive tables must hold the same canonical ids")
  }

  test("incremental release: a desynced index is rebuilt from the archive (coherence gate)") {
    import org.apache.spark.sql.functions.col
    def reportRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("stage", "shard").collect()
        .map(r => (r.getAs[String]("stage"), r.getAs[Int]("shard"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("checksum"))).toSeq
    val arch = MergeTable.scratch(Seq("doc_id"))
    val idx = MergeTable.scratch(Seq("doc_id"))
    val prs = MergeTable.scratch(Seq("doc_a", "doc_b"))
    Curate.releaseIncremental(docs.filter(col("doc_id") % 2 === 0), arch, idx, prs)
    // sabotage: lose half the index rows (the crash-between-commits shape)
    idx.replace(idx.read(spark, Curate.indexSchema).filter(col("doc_id") % 4 === 0))
    val healed = reportRows(
      Curate.releaseIncremental(docs.filter(col("doc_id") % 2 === 1), arch, idx, prs))
    val a2 = MergeTable.scratch(Seq("doc_id"))
    val i2 = MergeTable.scratch(Seq("doc_id"))
    val p2 = MergeTable.scratch(Seq("doc_a", "doc_b"))
    Curate.releaseIncremental(docs.filter(col("doc_id") % 2 === 0), a2, i2, p2)
    val clean = reportRows(
      Curate.releaseIncremental(docs.filter(col("doc_id") % 2 === 1), a2, i2, p2))
    assert(healed == clean,
      "the coherence gate must rebuild the index from the archive and converge")
  }
}
