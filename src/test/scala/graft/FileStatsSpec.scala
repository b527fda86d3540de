package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.FileStats
import graft.lake.FileStats.{ColStats, FileStat}

/** The footer-stats pruning evaluator: every answer must err on "might
  * match" — these tests pin the cases where a naive evaluator would
  * prune wrongly (nulls, absent columns, string ordering, unreadable
  * footers) alongside the cases that must prune to be useful.
  */
class FileStatsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def statOf(df: org.apache.spark.sql.DataFrame): FileStat = {
    val dir = Files.createTempDirectory("graft_filestats_")
    dir.toFile.deleteOnExit()
    df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val s = Files.list(dir)
    val file = try s.filter(p => p.getFileName.toString.startsWith("part-"))
      .findFirst().get() finally s.close()
    FileStats.read(file, spark.sessionState.newHadoopConf())
  }

  test("real footer: numeric and string bounds drive range pruning") {
    import spark.implicits._
    val st = statOf(Seq((10L, "banana", 1.5), (20L, "cherry", 2.5), (15L, "apple", -0.5))
      .toDF("k", "s", "d"))
    assert(st.rowCount == 3)
    // k ∈ [10, 20]
    assert(FileStats.mightMatch(st, Seq(EqualTo("k", 15L))))
    assert(!FileStats.mightMatch(st, Seq(EqualTo("k", 21L))))
    assert(!FileStats.mightMatch(st, Seq(GreaterThan("k", 20L))))
    assert(FileStats.mightMatch(st, Seq(GreaterThanOrEqual("k", 20L))))
    assert(!FileStats.mightMatch(st, Seq(LessThan("k", 10L))))
    assert(FileStats.mightMatch(st, Seq(In("k", Array(1L, 99L, 12L)))))
    assert(!FileStats.mightMatch(st, Seq(In("k", Array(1L, 99L)))))
    // conjunction prunes when any conjunct proves impossible
    assert(!FileStats.mightMatch(st, Seq(GreaterThan("k", 12L), LessThan("k", 8L))))
    // s ∈ ["apple", "cherry"]
    assert(FileStats.mightMatch(st, Seq(EqualTo("s", "beet"))))
    assert(!FileStats.mightMatch(st, Seq(EqualTo("s", "zebra"))))
    assert(FileStats.mightMatch(st, Seq(StringStartsWith("s", "ba"))))
    assert(!FileStats.mightMatch(st, Seq(StringStartsWith("s", "z"))))
    // d ∈ [-0.5, 2.5]
    assert(!FileStats.mightMatch(st, Seq(LessThan("d", -0.5))))
    assert(FileStats.mightMatch(st, Seq(LessThanOrEqual("d", -0.5))))
    // unknown column names and unevaluated filter shapes never prune
    assert(FileStats.mightMatch(st, Seq(EqualTo("nested.field", 1L))))
    assert(FileStats.mightMatch(st, Seq(StringContains("s", "zzz"))))
  }

  test("real footer: null accounting and a column of only nulls") {
    val df = spark.sql(
      "SELECT id AS k, CAST(NULL AS STRING) AS dead, " +
        "IF(id = 1, CAST(NULL AS BIGINT), id) AS holey FROM range(3)")
    val st = statOf(df)
    assert(!FileStats.mightMatch(st, Seq(IsNull("k"))))
    assert(FileStats.mightMatch(st, Seq(IsNotNull("k"))))
    assert(FileStats.mightMatch(st, Seq(IsNull("dead"))))
    assert(!FileStats.mightMatch(st, Seq(IsNotNull("dead"))),
      "an all-null column can never satisfy IS NOT NULL")
    assert(!FileStats.mightMatch(st, Seq(EqualTo("dead", "x"))),
      "equality on an all-null column can never match")
    assert(FileStats.mightMatch(st, Seq(IsNull("holey"))))
    assert(FileStats.mightMatch(st, Seq(IsNotNull("holey"))))
    // a column the file does not carry at all behaves as all-null
    assert(!FileStats.mightMatch(st, Seq(EqualTo("added_later", "x"))))
    assert(FileStats.mightMatch(st, Seq(IsNull("added_later"))))
  }

  test("real footer: dates and decimals evaluate; timestamps prune iff written as INT64 micros") {
    val sqlText =
      "SELECT DATE'2024-03-10' + CAST(id AS INT) AS d, " +
        "CAST(id AS DECIMAL(12,2)) / 4 AS m, " +
        "TIMESTAMP'2024-03-10 12:00:00' + make_interval(0,0,0,0,0,0,id) AS ts " +
        "FROM range(10)"
    val st = statOf(spark.sql(sqlText))
    assert(FileStats.mightMatch(st, Seq(EqualTo("d", java.sql.Date.valueOf("2024-03-15")))))
    assert(!FileStats.mightMatch(st, Seq(EqualTo("d", java.sql.Date.valueOf("2024-04-01")))))
    assert(!FileStats.mightMatch(st, Seq(EqualTo("d", java.time.LocalDate.parse("2024-03-09")))))
    assert(FileStats.mightMatch(st, Seq(GreaterThan("m", new java.math.BigDecimal("2.0")))))
    assert(!FileStats.mightMatch(st, Seq(GreaterThan("m", new java.math.BigDecimal("2.25")))))
    // Spark's default outputTimestampType is INT96, whose footer stats are
    // deprecated/unusable — the evaluator must stay conservative there
    assert(FileStats.mightMatch(st,
      Seq(GreaterThan("ts", java.sql.Timestamp.valueOf("2024-03-10 12:00:09")))))
    // written as INT64 micros, timestamp bounds evaluate and prune
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val stMicros = try statOf(spark.sql(sqlText))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    assert(FileStats.mightMatch(stMicros,
      Seq(EqualTo("ts", java.sql.Timestamp.valueOf("2024-03-10 12:00:05")))))
    assert(!FileStats.mightMatch(stMicros,
      Seq(GreaterThan("ts", java.sql.Timestamp.valueOf("2024-03-10 12:00:09")))))
  }

  test("string comparison uses code-point order, matching parquet's UTF-8 byte order") {
    // U+FF01 (ＢMP, 3 UTF-8 bytes, one UTF-16 unit 0xFF01) vs
    // U+10400 (supplementary, 4 UTF-8 bytes, surrogate pair starting 0xD801):
    // UTF-16 code-unit order sorts U+10400 BEFORE U+FF01; byte order (and
    // code-point order) sorts it AFTER. A file whose max is U+10400 must
    // not be pruned for a probe at U+FF01.
    val hi = new String(Character.toChars(0x10400))
    val cs = ColStats(Some("a"), Some(hi), mayHaveNulls = false, mayHaveNonNull = true)
    val st = FileStat("f", 2, Set("s"), Map("s" -> cs))
    assert(FileStats.mightMatch(st, Seq(EqualTo("s", "！"))),
      "code-point order puts U+FF01 inside [a, U+10400]")
    assert(!FileStats.mightMatch(st, Seq(GreaterThan("s", hi))))
  }

  test("an unreadable footer answers unknown everywhere and prunes nothing") {
    val dir = Files.createTempDirectory("graft_filestats_bad_")
    dir.toFile.deleteOnExit()
    val bogus: Path = dir.resolve("part-corrupt.parquet")
    Files.write(bogus, "not parquet at all".getBytes)
    val st = FileStats.read(bogus, spark.sessionState.newHadoopConf())
    assert(st.unreadable)
    assert(FileStats.mightMatch(st, Seq(EqualTo("k", 1L))))
    assert(FileStats.mightMatch(st, Seq(IsNull("whatever"))))
    assert(FileStats.mightMatch(st, Seq(IsNotNull("whatever"))))
  }

  test("NaN bounds disable float pruning instead of mis-pruning") {
    val cs = ColStats(None, None, mayHaveNulls = false, mayHaveNonNull = true)
    val st = FileStat("f", 2, Set("d"), Map("d" -> cs))
    assert(FileStats.mightMatch(st, Seq(EqualTo("d", 1.0))),
      "bounds withheld (e.g. NaN present) must never prune")
  }

  test("manifest round-trip: persisted stats answer exactly like the footers") {
    import graft.lake.StatsManifest
    // every bound domain the normalizer produces: Long, Double, String
    // (incl. a supplementary code point), BigDecimal, nulls, an all-null
    // column — written as real parquet so the footer is the ground truth
    val df = spark.sql(
      "SELECT id AS k, CAST(id AS DOUBLE) / 4 AS d, " +
        "concat('s', id, IF(id = 3, char(128512), '')) AS s, " +
        "CAST(id AS DECIMAL(12,2)) / 8 AS m, " +
        "IF(id = 1, CAST(NULL AS BIGINT), id) AS holey, " +
        "CAST(NULL AS STRING) AS dead FROM range(5)")
    val dir = Files.createTempDirectory("graft_manifest_rt_")
    dir.toFile.deleteOnExit()
    df.coalesce(2).write.mode("overwrite").parquet(dir.toString)
    val conf = spark.sessionState.newHadoopConf()
    val s = Files.list(dir)
    val files = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.getFileName.toString.startsWith("part-")).toSeq
    } finally s.close()
    val fromFooters = files.map(f => FileStats.read(f, conf))
    StatsManifest.write(dir, fromFooters)
    val manifest = StatsManifest.read(dir).get
    assert(manifest.keySet == fromFooters.map(_.fileName).toSet)
    // FileStat is a case class over exactly-round-tripping bound types, so
    // structural equality IS the proof the manifest == the footers
    fromFooters.foreach(st => assert(manifest(st.fileName) == st,
      s"manifest entry for ${st.fileName} diverged from its footer"))
    // and the answers agree on a probe battery including prune-positive,
    // prune-negative, null, and absent-column cases
    val probes: Seq[Seq[Filter]] = Seq(
      Seq(EqualTo("k", 2L)), Seq(EqualTo("k", 99L)),
      Seq(GreaterThan("d", 0.5)), Seq(LessThan("d", 0.0)),
      Seq(EqualTo("s", "s3😀")), Seq(StringStartsWith("s", "z")),
      Seq(GreaterThan("m", new java.math.BigDecimal("0.25"))),
      Seq(IsNull("holey")), Seq(IsNotNull("dead")), Seq(EqualTo("added_later", 1L)))
    for (st <- fromFooters; p <- probes) {
      assert(FileStats.mightMatch(manifest(st.fileName), p) == FileStats.mightMatch(st, p))
      assert(FileStats.mustMatchAll(manifest(st.fileName), p) == FileStats.mustMatchAll(st, p))
    }
    // statsFor prefers the manifest but footer-reads files it misses
    StatsManifest.write(dir, fromFooters.tail)
    val mixed = StatsManifest.statsFor(dir, files, conf)
    fromFooters.foreach(st => assert(mixed(st.fileName) == st))
    // unparsable manifest degrades to pure footer reads, never an error
    Files.write(dir.resolve(StatsManifest.FileName), "{broken".getBytes)
    val fallback = StatsManifest.statsFor(dir, files, conf)
    fromFooters.foreach(st => assert(fallback(st.fileName) == st))
  }

  test("MergeTable commits persist the manifest; carried files reuse entries byte-for-byte") {
    import graft.lake.StatsManifest
    import graft.stages.MergeTable
    import spark.implicits._
    val mt = MergeTable.scratch(Seq("k"))
    mt.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val v0 = java.nio.file.Paths.get(mt.root, mt.currentVersion.get)
    val m0 = StatsManifest.read(v0)
    assert(m0.isDefined, "a DataFrame commit must stage a _STATS manifest")
    assert(m0.get.nonEmpty && m0.get.keySet == mt.dataFiles(mt.currentVersion.get)
      .map(_.getFileName.toString).toSet)
    // file-level commit with carry-forward: the carried file's entry must
    // be reused (same stats under the same name), the new file's added
    val staged = java.nio.file.Files.createTempDirectory("graft_manifest_stage_")
    Seq((3L, "c")).toDF("k", "v").coalesce(1).write.mode("overwrite")
      .parquet(staged.toString)
    java.nio.file.Files.deleteIfExists(staged.resolve("_SUCCESS"))
    val stagedReal = java.nio.file.Files.createTempDirectory("graft_manifest_stage2_")
    val ls = java.nio.file.Files.list(staged)
    try ls.forEach(p => java.nio.file.Files.move(p, stagedReal.resolve(p.getFileName)))
    finally ls.close()
    val v1name = mt.commitStagedFiles(stagedReal, carryForward = true)
    val m1 = StatsManifest.read(java.nio.file.Paths.get(mt.root, v1name)).get
    assert(m1.keySet == mt.dataFiles(v1name).map(_.getFileName.toString).toSet)
    for ((name, st) <- m0.get) assert(m1(name) == st,
      s"carried file $name must reuse its base manifest entry")
  }

  test("executor-side commit stats equal the driver-side footer pass entry-for-entry") {
    import graft.lake.StatsManifest
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_stats_dist_")
    dir.toFile.deleteOnExit()
    spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") % 7).as("m"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("s"), col("id")).as("s"))
      .repartition(8).write.mode("overwrite").parquet(dir.toString)
    val ls = Files.list(dir)
    val names = try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("part-")).toSeq.sorted
    } finally ls.close()
    assert(names.size == 8)
    val conf = spark.sessionState.newHadoopConf()
    val driver = StatsManifest.buildForCommit(dir, names, Map.empty, conf)
    val dist = StatsManifest.buildForCommit(dir, names, Map.empty, conf,
      spark = Some(spark), distributeAt = 1)
    assert(dist.sortBy(_.fileName) == driver.sortBy(_.fileName),
      "the Spark-job footer pass must produce identical manifest entries")
    // carried entries are reused verbatim in the distributed path too —
    // only genuinely new files reach the footer reader
    val carried = driver.map(s => s.fileName -> s.copy(rowCount = 12345L)).toMap
    val reused = StatsManifest.buildForCommit(dir, names, carried, conf,
      spark = Some(spark), distributeAt = 1)
    assert(reused.forall(_.rowCount == 12345L))
  }
}
