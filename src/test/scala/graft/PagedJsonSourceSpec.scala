package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.stages.StgToDds

/** The DSv2 paginated source: page partitioning, the defensive page cap,
  * the [from, to) window, and composition with the STG→DDS parse.
  */
class PagedJsonSourceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def record(i: Int, dts: String): String =
    s"""{"order_id":"o$i","order_ts":"$dts","delivery_id":"d$i","courier_id":"c${i % 5}",""" +
      s""""address":"a","delivery_ts":"$dts","rate":${i % 6},"sum":${i * 10}.00,"tip_sum":1.50}"""

  private def writeApiFile(n: Int): String = {
    val f = Files.createTempFile("graft-api", ".jsonl")
    val lines = (0 until n).map(i => record(i, f"2024-05-${i % 28 + 1}%02d 10:00:00"))
    Files.write(f, String.join("\n", lines: _*).getBytes)
    f.toString
  }

  private def read(path: String, opts: (String, String)*) = {
    val r = spark.read.format("graft.sources.PagedJsonSource").option("path", path)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("pages become partitions; all records round-trip") {
    val path = writeApiFile(120)
    val df = read(path, "pageSize" -> "50")
    assert(df.rdd.getNumPartitions == 3)       // ceil(120/50) pages
    assert(df.count() == 120)
  }

  test("defensive page cap bounds the scan (reference: 200 pages)") {
    val path = writeApiFile(120)
    val df = read(path, "pageSize" -> "50", "maxPages" -> "2")
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 100)                  // 2 pages × 50
  }

  test("[from, to) window filters like the API's query params") {
    val path = writeApiFile(56)                // days 01..28, two records each
    val df = read(path, "from" -> "2024-05-10 00:00:00", "to" -> "2024-05-12 00:00:00")
    val days = df.collect().map(_.getString(1).substring(8, 10)).toSet
    assert(days == Set("10", "11"))
  }

  test("Spark filters on delivery_ts push into the source's API window") {
    import org.apache.spark.sql.functions.col
    val path = writeApiFile(56)
    val filtered = read(path)
      .filter(col("delivery_ts") >= "2024-05-10 00:00:00" &&
        col("delivery_ts") < "2024-05-12 00:00:00")
    // same rows as passing the window through options
    val viaOptions = read(path,
      "from" -> "2024-05-10 00:00:00", "to" -> "2024-05-12 00:00:00")
    assert(filtered.collect().map(_.getString(0)).sorted.toSeq ==
      viaOptions.collect().map(_.getString(0)).sorted.toSeq)
    assert(filtered.count() == 4)              // days 10, 11 × two records
    // the bounds reached the source (visible as PushedFilters in the plan)
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(delivery_ts"),
      s"window not pushed:\n$plan")
    // a non-window predicate stays a residual Spark filter and still applies
    val residual = read(path).filter(col("delivery_ts") >= "2024-05-10 00:00:00" &&
      col("json_response").contains("\"rate\":5"))
    assert(residual.collect().forall(_.getString(0).contains("\"rate\":5")))
  }

  test("column pruning: a delivery_ts-only projection never materializes the payload") {
    val path = writeApiFile(20)
    val df = read(path).select("delivery_ts")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("ReadSchema: [delivery_ts]"), s"not pruned:\n$plan")
    assert(df.collect().map(_.getString(0)).forall(_.startsWith("2024-05-")))
  }

  test("reports real statistics (no defaultSizeInBytes sentinel); capped by maxPages") {
    val path = writeApiFile(120)
    val fileLen = new java.io.File(path).length()
    val stats = read(path, "pageSize" -> "50").queryExecution.optimizedPlan.stats
    // full scan: size == the file bytes, never the Long.MaxValue sentinel
    assert(stats.sizeInBytes == BigInt(fileLen), s"got ${stats.sizeInBytes}")
    assert(stats.rowCount.contains(BigInt(120)))
    // page cap: only the first 2 pages' bytes are planned
    val capped = read(path, "pageSize" -> "50", "maxPages" -> "2")
      .queryExecution.optimizedPlan.stats
    assert(capped.sizeInBytes > 0 && capped.sizeInBytes < BigInt(fileLen))
    assert(capped.rowCount.contains(BigInt(100)))
    // consequence: a deliberate broadcast of this source is now an
    // INFORMED decision (stats known), not a stats-unknown escape hatch
  }

  test("composes with StgToDds.parseDeliveries into typed rows") {
    val path = writeApiFile(10)
    val stg = read(path).withColumn("delivery_ts",
      org.apache.spark.sql.functions.col("delivery_ts").cast("timestamp"))
    val parsed = StgToDds.parseDeliveries(stg)
    assert(parsed.count() == 10)
    val d3 = parsed.filter("delivery_key = 'd3'").collect().head
    assert(d3.getAs[String]("courier_key") == "c3")
    assert(d3.getAs[java.math.BigDecimal]("order_sum").doubleValue() == 30.0)
  }
}
