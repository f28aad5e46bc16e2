package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-area query maps; every entry with an oracle is verified
  * against DuckDB on the same parquet tables by the driver.
  */
object SparkEntry {

  private def all = Seq(
    _root_.graft.queries.VectorQueries.queries,
    _root_.graft.queries.SbqQueries.queries,
    _root_.graft.queries.AnnQueries.queries,
    _root_.graft.queries.PipelineQueries.queries,
    _root_.graft.queries.RelationalQueries.queries,
    _root_.graft.queries.WarcQueries.queries,
  )
  private def allOracles = Seq(
    _root_.graft.queries.VectorQueries.oracleSql,
    _root_.graft.queries.SbqQueries.oracleSql,
    _root_.graft.queries.AnnQueries.oracleSql,
    _root_.graft.queries.PipelineQueries.oracleSql,
    _root_.graft.queries.RelationalQueries.oracleSql,
    _root_.graft.queries.WarcQueries.oracleSql,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_exact_cosine")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOracles.reduce(_ ++ _)
}
