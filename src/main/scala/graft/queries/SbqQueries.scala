package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Sbq, VectorFunctions}

/** SBQ quantizer-training queries (SURVEY.md §2.4 A1/A2, D8). */
object SbqQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: per-dimension Welford stats (the quantizer training pass), as rows.
    "sbq_dim_stats" -> ((s, d) => {
      Sbq.dimStats(emb(s, d), "embedding")
        .select(col("dim"), col("cnt"),
          round(col("mean"), 6).as("mean"),
          round(col("variance"), 6).as("variance"))
        .orderBy(col("dim"))
    }),

    // A2 + D8: asymmetric quantized search — encode corpus + query with the
    // trained model, rank by Hamming distance (popcount of XOR) with id
    // tie-break. Not SQL-expressible in DuckDB (bit packing) → covered by
    // SbqSpec instead of an oracle.
    "sbq_hamming_topk" -> ((s, d) => {
      VectorFunctions.register(s)
      val e = emb(s, d)
      val model = Sbq.train(e, "embedding")
      val enc = Sbq.encodeUdf(s, model)
      val coded = e.select(col("vec_id"), enc(col("embedding")).as("code"))
      val q = coded.filter(col("vec_id") === 0).select(col("code").as("qcode"))
      coded.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          VectorFunctions.hamming_dist(col("code"), col("qcode")).as("hdist"))
        .orderBy(col("hdist"), col("vec_id"))
        .limit(20)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "sbq_dim_stats" ->
      """SELECT t.i AS dim, count(*) AS cnt,
        |       round(avg(CAST(embedding[t.i + 1] AS DOUBLE)), 6) AS mean,
        |       round(var_pop(CAST(embedding[t.i + 1] AS DOUBLE)), 6) AS variance
        |FROM embeddings, range(0, 64) t(i)
        |GROUP BY t.i ORDER BY dim""".stripMargin,
  )
}
