package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.lake.FileStats.{ColStats, FileStat}

/** Persisted per-file column statistics — the manifest a lakehouse format
  * keeps (Iceberg manifests, Delta's per-file stats in the log), written
  * into each version directory at COMMIT time as `_STATS`.
  *
  * This replaces the driver-side parquet-footer re-read that every
  * row-level operation / metadata-only DELETE previously paid per
  * statement (`FileStats.read` over O(table files)): footers are now read
  * exactly once per data file — when the file first enters a version — and
  * carried-forward files (hard links, name-stable) reuse their existing
  * manifest entry verbatim. At 100 TB that is the difference between an
  * O(table) metadata pass per statement and an O(new files) pass per
  * commit.
  *
  * Format: one JSON object, `{"v":1,"files":[...]}`. Bounds are
  * type-tagged (`L`ong / `D`ouble / `S`tring / `B`igDecimal) and carried
  * as strings — `Long.toString`, `Double.toString` and
  * `BigDecimal.toString` all round-trip exactly, so a manifest entry
  * answers every [[FileStats]] question identically to the footer it
  * summarizes (spec-pinned in `FileStatsSpec`).
  *
  * Every reader degrades conservatively: a missing or unparsable manifest
  * (a version committed by an older writer, a hand-edited file) falls back
  * to the footer read it replaced — pruning never turns a manifest problem
  * into a wrong answer.
  */
object StatsManifest {

  val FileName = "_STATS"

  // ---- serialization ------------------------------------------------------

  private def boundJson(v: Any): JValue = v match {
    case l: Long       => JObject("t" -> JString("L"), "v" -> JString(l.toString))
    case d: Double     => JObject("t" -> JString("D"), "v" -> JString(d.toString))
    case s: String     => JObject("t" -> JString("S"), "v" -> JString(s))
    case b: BigDecimal => JObject("t" -> JString("B"), "v" -> JString(b.toString))
    case other => throw new IllegalArgumentException(
      s"unexpected bound type ${other.getClass.getName} — FileStats normalizes to Long/Double/String/BigDecimal")
  }

  private def boundFrom(j: JValue): Option[Any] = j match {
    case JObject(fields) =>
      val m = fields.toMap
      (m.get("t"), m.get("v")) match {
        case (Some(JString(t)), Some(JString(v))) => t match {
          case "L" => Some(v.toLong)
          case "D" => Some(v.toDouble)
          case "S" => Some(v)
          case "B" => Some(BigDecimal(v))
          case _   => None
        }
        case _ => None
      }
    case _ => None
  }

  private def colJson(c: ColStats): JObject = JObject(List(
    c.loBound.map(b => "lo" -> boundJson(b)),
    c.hiBound.map(b => "hi" -> boundJson(b)),
    Some("nulls" -> (JBool(c.mayHaveNulls): JValue)),
    Some("nonnull" -> (JBool(c.mayHaveNonNull): JValue))).flatten)

  private def colFrom(j: JValue): Option[ColStats] = j match {
    case JObject(fields) =>
      val m = fields.toMap
      def bool(k: String): Option[Boolean] = m.get(k) match {
        case Some(JBool(b)) => Some(b)
        case _ => None
      }
      for { nulls <- bool("nulls"); nonNull <- bool("nonnull") } yield
        ColStats(m.get("lo").flatMap(boundFrom), m.get("hi").flatMap(boundFrom),
          nulls, nonNull)
    case _ => None
  }

  private def fileJson(s: FileStat): JObject = JObject(
    "name" -> JString(s.fileName),
    "rows" -> JLong(s.rowCount),
    "present" -> JArray(s.present.toList.sorted.map(JString(_))),
    "unreadable" -> JBool(s.unreadable),
    "cols" -> JObject(s.cols.toList.sortBy(_._1).map { case (k, v) => k -> (colJson(v): JValue) }))

  private def fileFrom(j: JValue): Option[FileStat] = j match {
    case JObject(fields) =>
      val m = fields.toMap
      for {
        name <- m.get("name").collect { case JString(s) => s }
        rows <- m.get("rows").collect { case JLong(n) => n; case JInt(n) => n.toLong }
        present <- m.get("present").collect {
          case JArray(xs) => xs.collect { case JString(s) => s }.toSet }
        unreadable <- m.get("unreadable").collect { case JBool(b) => b }
        cols <- m.get("cols").collect { case JObject(cs) => cs }
          .map(_.flatMap { case (k, v) => colFrom(v).map(k -> _) }.toMap)
      } yield FileStat(name, rows, present, cols, unreadable)
    case _ => None
  }

  // ---- manifest I/O -------------------------------------------------------

  /** Write the manifest into `versionDir` (staging dir before the commit's
    * atomic move — the move then carries it into the version, so a visible
    * version is born WITH its manifest and stays immutable).
    */
  def write(versionDir: Path, stats: Seq[FileStat]): Unit = {
    val json = JObject("v" -> JInt(1),
      "files" -> JArray(stats.sortBy(_.fileName).map(fileJson(_): JValue).toList))
    Files.write(versionDir.resolve(FileName),
      JsonMethods.compact(JsonMethods.render(json)).getBytes(StandardCharsets.UTF_8))
  }

  /** The manifest of a version directory, or None when absent/unparsable
    * (then callers fall back to footer reads).
    */
  def read(versionDir: Path): Option[Map[String, FileStat]] =
    try {
      val p = versionDir.resolve(FileName)
      if (!Files.exists(p)) None
      else JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)) match {
        case JObject(fields) =>
          fields.toMap.get("files").collect { case JArray(xs) =>
            xs.flatMap(fileFrom).map(s => s.fileName -> s).toMap
          }
        case _ => None
      }
    } catch { case NonFatal(_) => None }

  /** Stats for `files` of one version: manifest entries where present,
    * footer reads for the rest (older versions, entries a parse dropped).
    * THE read path for row-level planning — the footer pass only survives
    * as the fallback.
    */
  def statsFor(versionDir: Path, files: Seq[Path], conf: => Configuration)
      : Map[String, FileStat] = {
    val manifest = read(versionDir).getOrElse(Map.empty)
    lazy val hadoopConf = conf
    files.map { f =>
      val name = f.getFileName.toString
      name -> manifest.getOrElse(name, FileStats.read(f, hadoopConf))
    }.toMap
  }

  /** Build the manifest entries for a staged commit: `carried` entries are
    * reused verbatim under their (possibly collision-renamed) staged name;
    * every other data file — the commit's genuinely new bytes — gets one
    * footer read.
    *
    * The footer reads run EXECUTOR-side when the commit is large enough
    * (one Spark task per footer, the driver receives finished entries) —
    * the posture a real format has at 100 TB, where a commit can stage
    * thousands of files and the driver must not serialize O(increment)
    * metadata I/O through itself; Delta/Iceberg go one step further and
    * collect stats inside the write tasks themselves. Commits below
    * `distributeAt` stay on the driver's `.par` pool: scheduling a job
    * costs more than a handful of local footer reads, and the driver path
    * doubles as the no-active-session fallback. Both paths produce
    * identical entries (spec-pinned in `FileStatsSpec`).
    *
    * @param stagedNames data-file names in the staging directory
    * @param carried     staged name -> manifest entry reused from the base
    */
  def buildForCommit(stagedDir: Path, stagedNames: Seq[String],
                     carried: Map[String, FileStat],
                     conf: Configuration,
                     spark: Option[org.apache.spark.sql.SparkSession] = None,
                     distributeAt: Int = 64): Seq[FileStat] = {
    val carriedStats = stagedNames.flatMap(n => carried.get(n).map(_.copy(fileName = n)))
    val newNames = stagedNames.filterNot(carried.contains)
    val fresh = spark match {
      case Some(s) if newNames.size >= distributeAt =>
        val dir = stagedDir.toString
        val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
        s.sparkContext
          .parallelize(newNames, math.max(1,
            math.min(newNames.size, s.sparkContext.defaultParallelism)))
          .map(n => FileStats.read(java.nio.file.Paths.get(dir, n), serConf.value))
          .collect().toSeq
      case _ =>
        import scala.collection.parallel.CollectionConverters._
        newNames.par.map(n => FileStats.read(stagedDir.resolve(n), conf)).seq
    }
    carriedStats ++ fresh
  }
}
