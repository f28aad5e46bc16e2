package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Sbq, VectorFunctions}

/** SBQ quantizer-training queries (SURVEY.md §2.4 A1/A2, D8). */
object SbqQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    graft.sources.TableResolver.parquet(spark, s"$dir/embeddings.parquet")

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
    // tie-break. Oracle-checkable despite the bit packing: SBQ codes are
    // UNARY per dimension, so packed-XOR popcount == sum over dims of
    // |onesA - onesB|, and the per-dim ones-count is plain SQL over the
    // recomputed mean/variance (integer distances make the compare immune to
    // the ~1e-12 fp difference between Welford-merge and avg/var_pop).
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

    // 2-bit SBQ (64 dims < 900): ones = 0 if z-index < 1 else min(floor,2)
    // with z-index = ((v-mean)/std + 2) / (4/3); unary codes make the packed
    // Hamming distance equal sum(|ones_row - ones_query|)
    "sbq_hamming_topk" ->
      """WITH s AS (SELECT CAST(t.i AS INT) AS dim,
        |             avg(CAST(embedding[t.i + 1] AS DOUBLE)) AS mean,
        |             var_pop(CAST(embedding[t.i + 1] AS DOUBLE)) AS variance
        |           FROM embeddings, range(0, 64) t(i) GROUP BY 1),
        |o AS (SELECT e.vec_id, s.dim,
        |        CASE WHEN ((CAST(e.embedding[s.dim + 1] AS DOUBLE) - s.mean) / sqrt(s.variance) + 2.0) / (4.0 / 3) >= 1.0
        |             THEN least(CAST(floor(((CAST(e.embedding[s.dim + 1] AS DOUBLE) - s.mean) / sqrt(s.variance) + 2.0) / (4.0 / 3)) AS INT), 2)
        |             ELSE 0 END AS ones
        |      FROM embeddings e CROSS JOIN s),
        |q AS (SELECT dim, ones FROM o WHERE vec_id = 0),
        |h AS (SELECT o.vec_id, CAST(sum(abs(o.ones - q.ones)) AS BIGINT) AS hdist
        |      FROM o JOIN q USING (dim) WHERE o.vec_id <> 0 GROUP BY 1)
        |SELECT vec_id, hdist FROM h ORDER BY hdist, vec_id LIMIT 20""".stripMargin,
  )
}
