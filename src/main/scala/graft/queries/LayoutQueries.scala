package graft.queries

import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.ops.Layout

/** Data-layout clustering over `events` (user_id × event time) — the
  * census proves the z-order math end to end: scaling, Morton
  * interleave, and fixed-width range buckets are all integer-exact in
  * both engines.
  */
object LayoutQueries {

  private def mortonSql(a: String, b: String, bits: Int): String =
    s"""CAST(list_sum(list_transform(range(0, $bits),
          i -> ((($a >> i) & 1) << (2 * i)) + ((($b >> i) & 1) << (2 * i + 1)))) AS BIGINT)"""

  val all: Seq[GQuery] = Seq(

    GQuery("layout_zorder_census",
      (s, dir) => Layout.zorderCensus(
          Tables.events(s, dir).select(col("user_id"), unix_micros(col("ts")).as("tsu")),
          "user_id", "tsu", bits = 8, buckets = 16)
        .orderBy(col("bucket")),
      Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
                    s AS (SELECT min(user_id) AS ua, max(user_id) AS uh,
                                 min(tsu) AS ta, max(tsu) AS th FROM e),
                    sc AS (SELECT
                             (user_id - ua) // (((uh - ua) // 256) + 1) AS a_scaled,
                             (tsu - ta) // (((th - ta) // 256) + 1) AS b_scaled
                           FROM e, s),
                    z AS (SELECT a_scaled, b_scaled,
                                 ${mortonSql("a_scaled", "b_scaled", 8)} AS zv
                          FROM sc)
               SELECT CAST((zv * 16) // 65536 AS INT) AS bucket,
                      count(*) AS n_rows,
                      min(a_scaled) AS a_min, max(a_scaled) AS a_max,
                      min(b_scaled) AS b_min, max(b_scaled) AS b_max
               FROM z GROUP BY 1 ORDER BY bucket"""),
      doc = "Morton z-value clustering census (OPTIMIZE ZORDER BY shape): per-z-range " +
        "bounding boxes over user x time, all integer-exact cross-engine"),

    // ---- Hilbert-curve clustering census — the locality upgrade over
    // Morton (every Hilbert step is spatially adjacent; Morton jumps
    // across quadrant seams), same scaled coordinates and range buckets
    // so the two censuses read side by side. The curve is the classic
    // per-bit fold (quadrant digit (3·rx)⊕ry + reflect/swap rotation),
    // exact integer bit math replayed by DuckDB's list_reduce with the
    // [v,0,0] list-accumulator trick (acc type must equal element type).
    GQuery("layout_hilbert_census",
      (s, dir) => Layout.hilbertCensus(
          Tables.events(s, dir).select(col("user_id"), unix_micros(col("ts")).as("tsu")),
          "user_id", "tsu", bits = 8, buckets = 16)
        .orderBy(col("bucket")),
      Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
              |s AS (SELECT min(user_id) AS ua, max(user_id) AS uh,
              |             min(tsu) AS ta, max(tsu) AS th FROM e),
              |sc AS (SELECT
              |         (user_id - ua) // (((uh - ua) // 256) + 1) AS a_scaled,
              |         (tsu - ta) // (((th - ta) // 256) + 1) AS b_scaled
              |       FROM e, s),
              |h AS (SELECT a_scaled, b_scaled,
              |             ${hilbertSql("a_scaled", "b_scaled", 8)} AS hv
              |      FROM sc)
              |SELECT CAST((hv * 16) // 65536 AS INT) AS bucket,
              |       count(*) AS n_rows,
              |       min(a_scaled) AS a_min, max(a_scaled) AS a_max,
              |       min(b_scaled) AS b_min, max(b_scaled) AS b_max
              |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin),
      doc = "Hilbert-curve clustering census: per-curve-range bounding boxes " +
        "over user x time — the locality upgrade over Morton, exact integer " +
        "bit math cross-engine")
  )

  /** DuckDB mirror of [[Layout.hilbertExpr]]: list_reduce over
    * [side-bit, 0, 0] elements with the [x, y, d] list accumulator
    * (DuckDB's reduce requires acc type == element type), 1-indexed.
    */
  private def hilbertSql(x: String, y: String, bits: Int): String = {
    val n1 = (1L << bits) - 1
    val side = "(CAST(1 AS BIGINT) << CAST(e[1] AS INT))"
    s"""list_reduce(
       |  list_prepend([CAST($x AS BIGINT), CAST($y AS BIGINT), CAST(0 AS BIGINT)],
       |    list_transform(range(0, $bits),
       |      k -> [CAST(${bits - 1} AS BIGINT) - k, CAST(0 AS BIGINT), CAST(0 AS BIGINT)])),
       |  (acc, e) -> CASE
       |    WHEN (acc[2] & $side) = 0 AND (acc[1] & $side) = 0 THEN
       |      [acc[2], acc[1], acc[3]]
       |    WHEN (acc[2] & $side) = 0 THEN
       |      [$n1 - acc[2], $n1 - acc[1], acc[3] + $side * $side * 3]
       |    WHEN (acc[1] & $side) = 0 THEN
       |      [acc[1], acc[2], acc[3] + $side * $side]
       |    ELSE
       |      [acc[1], acc[2], acc[3] + $side * $side * 2]
       |  END)[3]""".stripMargin
  }
}
