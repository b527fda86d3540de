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
        "bounding boxes over user x time, all integer-exact cross-engine")
  )
}
