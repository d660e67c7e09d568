package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented
  * operator from SURVEY.md §2 plus the training-data-pipeline ops);
  * `oracleSql` holds the equivalent DuckDB SQL for every
  * SQL-expressible query (same column names/types — the driver's
  * compare hashes values after sorting columns by name).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.Relational.queries, graft.queries.Relational.oracle),
      (graft.queries.Relational2.queries, graft.queries.Relational2.oracle),
      (graft.queries.Relational3.queries, graft.queries.Relational3.oracle),
      (graft.queries.Relational4.queries, graft.queries.Relational4.oracle),
      (graft.queries.Relational5.queries, graft.queries.Relational5.oracle),
      (graft.queries.Events.queries, graft.queries.Events.oracle),
      (graft.queries.CdcTypes.queries, graft.queries.CdcTypes.oracle),
      (graft.queries.CdcPipeline.queries, graft.queries.CdcPipeline.oracle),
      (graft.queries.Text.queries, graft.queries.Text.oracle),
      (graft.queries.DedupQueries.queries, graft.queries.DedupQueries.oracle),
      (graft.queries.SimilarityQueries.queries, graft.queries.SimilarityQueries.oracle),
      (graft.queries.MultimodalQueries.queries, graft.queries.MultimodalQueries.oracle),
      (graft.queries.Pipeline.queries, graft.queries.Pipeline.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q01 (pricing summary) rather than the 5-way join: at sf0.001 the
    * supplier-nation correlation leaves the join only ~1 row, too close
    * to the smoke threshold. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
