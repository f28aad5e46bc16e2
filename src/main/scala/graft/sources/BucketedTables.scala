package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed (pre-partitioned, co-located) tables: the shuffle-elimination
 * lever for repeated joins at 100 TB.
 *
 * A corpus that is joined on the same key again and again — dedup keep-best
 * joining winners back to rows, split assignment semi-joining picked ids,
 * embeddings joining documents on doc_id — pays a full shuffle of the big
 * side on EVERY join if it is stored as plain parquet. Writing it once with
 * `bucketBy(n, key)` hash-partitions the files by the join key, so every
 * later equi-join (or aggregation) on that key consumes the stored
 * partitioning: Catalyst sees the bucketed scan's `HashPartitioning(key, n)`
 * satisfies the join's distribution requirement and plans a sort-merge join
 * with ZERO Exchange on the bucketed side. At 1000 executors that is the
 * difference between re-shuffling 100 TB per join and reading files in
 * place.
 *
 * Rules of engagement (all asserted in BucketedTablesSpec):
 *  - both sides bucketed on the join key with the SAME bucket count →
 *    shuffle-free sort-merge join;
 *  - `sortBy` the same key: the join-side Sort then runs over presorted
 *    single-file buckets (cheap), and disappears entirely under
 *    `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (since
 *    SPARK-32859 the scan no longer REPORTS its ordering by default);
 *  - bucket count is a real knob: pick ≈ (corpus size / 1 GB) so a bucket
 *    fits an executor; too few buckets caps parallelism.
 *
 * The table is written EXTERNAL (explicit `path`) — the catalog entry only
 * carries the bucketing metadata; data lives where the pipeline puts it.
 */
object BucketedTables {

  /** Write `df` as an external bucketed+sorted parquet table registered as
    * `tableName`. Overwrites both data and catalog entry.
    *
    * The pre-write `repartition(nBuckets, key)` matters twice: without it
    * EVERY write task opens a file in EVERY bucket (nTasks×nBuckets small
    * files — a real 100 TB foot-gun), and Spark only trusts the stored
    * per-bucket `sortBy` order when a bucket is a SINGLE file, so this is
    * also what lets later sort-merge joins skip the Sort, not just the
    * Exchange. */
  def writeBucketed(df: DataFrame, tableName: String, keyCol: String,
      nBuckets: Int, path: String): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Read a bucketed table back (the catalog carries the bucket spec — a
    * plain `read.parquet(path)` would LOSE the partitioning and re-shuffle). */
  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
