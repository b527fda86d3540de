package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan over the testdata tables and,
  * when SQL-expressible, the ANSI SQL a DuckDB oracle runs over the same
  * parquet to hash-compare results. Column names AND row order must agree
  * between the two (the driver sorts columns by name; we additionally pin a
  * total row order on both sides so the value hash is order-independent-safe).
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Central inventory backing [[SparkEntry.queries]] / [[SparkEntry.oracleSql]].
  * Grouped by SURVEY.md §2 area; names carry the §2 operator ids they cover.
  */
object QueryRegistry {
  def all: Seq[GQuery] =
    queries.LedgerQueries.all ++
    queries.RelationalQueries.all ++
    queries.PipelineQueries.all ++
    queries.DedupQueries.all ++
    queries.StreamingQueries.all ++
    queries.SimilarityQueries.all ++
    queries.TextQueries.all ++
    queries.TrainPrepQueries.all ++
    queries.LakeQueries.all ++
    queries.LayoutQueries.all ++
    queries.ScaleOpsQueries.all ++
    queries.ReleaseQueries.all

  def byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap
}
