package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-contract tripwire (judge r8, item 4).
  *
  * Round 8 lost 20 queries because the driver regenerated `/root/testdata`
  * between runs (INT64-nanos → naive `timestamp[us]`), and no local spec
  * read the LIVE corpus's schema — the builder's green and the driver's red
  * were both true. These tests pin the ingestion contract against the real
  * testdata so the next physical-encoding flip fails `sbt test` loudly
  * instead of shipping a silently stale green:
  *
  *   1. `Tables.load` must normalize every event-time column to
  *      session-TZ `TimestampType` regardless of the file's encoding.
  *   2. Every registered query must at least ANALYZE against the live
  *      sf0.001 corpus (unresolved columns / type mismatches — the r8
  *      failure modes — die at analysis). Queries whose builder RUNS a
  *      bounded streaming drain are exercised by `StreamingSpec` /
  *      `SessionizeSpec` against the same corpus and are skipped here to
  *      keep the tripwire cheap.
  */
class CorpusContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("event-time columns are normalized to TimestampType from the live corpus") {
    assert(Tables.events(spark, sfDir).schema("ts").dataType == TimestampType)
    assert(Tables.orders(spark, sfDir).schema("o_orderdate").dataType == TimestampType)
    assert(Tables.lineitem(spark, sfDir).schema("l_shipdate").dataType == TimestampType)
  }

  test("streaming event reads are normalized to TimestampType from the live corpus") {
    assert(graft.streaming.EventStream.readBatch(spark, sfDir)
      .schema("ts").dataType == TimestampType)
    assert(graft.streaming.EventStream.readStream(spark, sfDir)
      .schema("ts").dataType == TimestampType)
  }

  // Builders that execute a full bounded drain (covered on the live corpus
  // by StreamingSpec/SessionizeSpec); everything else must analyze here.
  // Note: "analyze" is the MINIMUM this exercises — several builders run
  // real driver-side actions while constructing their plan (watermark
  // state writes in s3/o9, the MG sketch's collect+recount, scd2/IVF/lake
  // scratch MergeTables, the s2 JSONL fixture write), so those execute
  // small sf0.001 jobs here, not just analysis. That is deliberate: the
  // tripwire's job is to fail on the NEXT corpus-encoding flip, and the
  // action-heavy builders are exactly the ones that read the corpus
  // through the most machinery. Keep them included; if the registry grows
  // enough that this test stops being cheap, exclude action-heavy
  // builders the way drain-backed ones are and list them explicitly.
  private val drainBacked = Set(
    "streaming_ledger", "streaming_lake_merge", "streaming_static_join",
    "streaming_sliding_window", "streaming_chained_aggs",
    "streaming_interval_join", "streaming_outer_join", "streaming_semi_join",
    "streaming_anti_join", "streaming_full_outer_join",
    "streaming_tws_running_totals", "sessionization_streaming",
    "streaming_paged_source", "streaming_paged_windowed",
    "streaming_dedup_redelivery", "streaming_scd2_cdc")

  test("every registered query analyzes against the live corpus") {
    val failures = QueryRegistry.all
      .filterNot(q => drainBacked.contains(q.name))
      .flatMap { q =>
        try { q.run(spark, sfDir).queryExecution.analyzed; None }
        catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
      }
    assert(failures.isEmpty,
      s"queries failing analysis against the live corpus:\n${failures.mkString("\n")}")
  }
}
