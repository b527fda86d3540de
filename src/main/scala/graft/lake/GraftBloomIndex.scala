package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.util.Try
import scala.util.control.NonFatal

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{DataType, IntegerType}

import graft.stages.MergeTable

/** Per-file Bloom-filter index — the point-lookup pruning layer footer
  * min/max cannot provide. On a table UNCLUSTERED in a key (the common
  * case for append streams), every file's footer range spans essentially
  * the whole key domain, so [[FileStats]] pruning keeps everything; a
  * per-file bloom of the key narrows a point MERGE/UPDATE/DELETE to the
  * files that actually contain the key — Delta's bloom filter index, as
  * an explicit maintenance artifact.
  *
  * Layout: `<table root>/_BLOOM/<col>.json`, one JSON object mapping data
  * FILE NAME → hex-encoded bitset (+ the m/k parameters). Keying by file
  * name is what makes the index survive table evolution for free: carried
  * files keep their names across versions (MergeTable hard links), so an
  * append or a group rewrite invalidates NOTHING — new/rewritten files
  * are simply absent from the index and answer "might contain"
  * (conservative), until the next [[build]] refreshes them. At 100 TB the
  * same bitsets would be computed by the writer at commit time (as Delta
  * does) instead of by a maintenance scan; the probe contract is
  * identical.
  *
  * Hash contract: the BUILD side sets bits with the engine expression
  * `pmod(xxhash64(i, col), mBits)` ([[graft.ops.BloomJoin.positionsSql]],
  * partial-aggregated per file map-side); the PROBE side evaluates the
  * SAME Catalyst `XxHash64` expression driver-side over the filter
  * literal cast to the column's exact type — agreement by construction,
  * and a literal that cannot be represented in the column type simply
  * declines to prune. No false negatives ever: a bloom miss PROVES the
  * file holds no matching row.
  */
object GraftBloomIndex {

  final case class ColIndex(mBits: Int, kHashes: Int, files: Map[String, Array[Long]])

  private def indexDir(root: String): Path = Paths.get(root, "_BLOOM")

  private def indexPath(root: String, col: String): Path =
    indexDir(root).resolve(s"${col.toLowerCase(java.util.Locale.ROOT)}.json")

  /** Scan `version`'s data files once and (re)write the bloom sidecar for
    * each column. One distributed pass per column: explode the k salted
    * positions, OR bitsets per file map-side ([[graft.functions
    * .BloomAggregator]] merge law), collect one row per file.
    */
  def build(spark: SparkSession, mt: MergeTable, version: String, cols: Seq[String],
            mBits: Int = 1 << 17, kHashes: Int = 4): Unit = {
    import spark.implicits._
    val files = mt.dataFiles(version)
    if (files.isEmpty) return
    val df = spark.read.parquet(files.map(_.toString): _*)
    Files.createDirectories(indexDir(mt.root))
    cols.foreach { col0 =>
      val positions = graft.ops.BloomJoin.positionsSql(s"`$col0`", mBits, kHashes)
      val perFile = df
        .select(input_file_name().as("_f"), expr(positions).as("_ps"))
        .select(col("_f"), explode(col("_ps")).as("p"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(graft.functions.BloomAggregator.bloom(mBits).toColumn)
        .collect()   // one (file, bitset) row per data file — bounded
      val entries = perFile.map { case (path, bits) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        name -> (JString(bits.map(java.lang.Long.toHexString).mkString(",")): JValue)
      }
      // structural JSON (shared json4s discipline with StatsManifest): a
      // file name is data, not syntax — quotes/backslashes get escaped
      val json = JObject("mBits" -> JInt(mBits), "kHashes" -> JInt(kHashes),
        "files" -> JObject(entries.toList))
      Files.write(indexPath(mt.root, col0),
        JsonMethods.compact(JsonMethods.render(json)).getBytes(StandardCharsets.UTF_8))
    }
  }

  /** Load a column's sidecar; any parse problem degrades to "no index"
    * (pruning is an optimization, never a correctness dependency).
    */
  def load(root: String, col: String): Option[ColIndex] = {
    val p = indexPath(root, col)
    if (!Files.exists(p)) return None
    try {
      val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      def int(j: JValue): Option[Int] = j match {
        case JInt(n)  => Some(n.toInt)
        case JLong(n) => Some(n.toInt)
        case _        => None
      }
      JsonMethods.parse(text) match {
        case JObject(fields) =>
          val fm = fields.toMap
          for {
            m <- fm.get("mBits").flatMap(int)
            k <- fm.get("kHashes").flatMap(int)
            files <- fm.get("files").collect { case JObject(fs) =>
              fs.flatMap { case (name, JString(hex)) =>
                // per-entry Try: one malformed hex word loses ONE file's
                // pruning (conservative "might match"), not the whole
                // sidecar — the outer catch stays for structural damage
                Try(hex.split(',').filter(_.nonEmpty)
                  .map(java.lang.Long.parseUnsignedLong(_, 16))).toOption
                  .map(name -> _)
              case _ => None
              // an entry whose bitset length disagrees with the header's
              // mBits (truncated/hand-edited sidecar) is DROPPED, not
              // trusted: a probe into it would either crash or answer from
              // garbage — absent entries answer the conservative "might
              // match" instead
              }.filter(_._2.length == m / 64).toMap
            }
          } yield ColIndex(m, k, files)
        case _ => None
      }
    } catch { case NonFatal(_) => None }
  }

  /** Driver-side twin of the build expression: the k salted bit positions
    * of `value` under the column's exact Catalyst type. None when the
    * literal cannot be represented in that type (then nothing prunes).
    */
  private def positionsOf(value: Any, colType: DataType,
                          mBits: Int, kHashes: Int): Option[Seq[Int]] =
    Try {
      (0 until kHashes).map { i =>
        val h = new XxHash64(Seq(Literal(i, IntegerType), Literal.create(value, colType)))
          .eval(null).asInstanceOf[Long]
        (((h % mBits) + mBits) % mBits).toInt
      }
    }.toOption

  private def testBits(bits: Array[Long], ps: Seq[Int]): Boolean =
    // defense in depth behind load()'s length validation: an out-of-range
    // position answers "might match" rather than throwing mid-statement
    ps.forall(p => (p >>> 6) >= bits.length ||
      ((bits(p >>> 6) >>> (p & 63)) & 1L) == 1L)

  /** Conservative per-file answer for ONE filter: false only when the
    * index PROVES no row of `fileName` can satisfy it. Handles the two
    * point shapes that reach group pruning — the statement's own
    * `EqualTo` and the runtime group filter's `In` (file prunable only if
    * EVERY candidate value misses).
    */
  def mightMatch(index: Map[String, ColIndex], schema: org.apache.spark.sql.types.StructType,
                 fileName: String, filter: Filter): Boolean = {
    def colType(attr: String): Option[DataType] =
      schema.fields.find(_.name.equalsIgnoreCase(attr)).map(_.dataType)
    def probe(attr: String, v: Any): Boolean = {
      if (v == null) return true
      (index.get(attr.toLowerCase(java.util.Locale.ROOT)), colType(attr)) match {
        case (Some(ci), Some(t)) => ci.files.get(fileName) match {
          case Some(bits) =>
            positionsOf(v, t, ci.mBits, ci.kHashes).forall(testBits(bits, _))
          case None => true   // file not indexed (new since last build)
        }
        case _ => true
      }
    }
    filter match {
      case EqualTo(a, v) => probe(a, v)
      case In(a, vs)     => vs.isEmpty || vs.exists(v => probe(a, v))
      case org.apache.spark.sql.sources.And(l, r) =>
        mightMatch(index, schema, fileName, l) && mightMatch(index, schema, fileName, r)
      case _ => true
    }
  }
}
