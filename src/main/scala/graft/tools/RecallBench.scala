package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.index.{DiskannIndex, DiskannParams}

/**
 * Recall harness (the reference's own quality gate, measured: recall@10 vs
 * exact ground truth must be >= 0.9 — filtering_tests.rs:1005-1020). Runs at
 * an sf dir (default sf0.1, arg 1 overrides) over ~50 deterministic query
 * points and reports one JSON line:
 *
 *   {"metric":"recall10","configs":{"<name>":r,...},"k":10,"nq":N,"sf":dir}
 *
 * Configs: reference query GUC defaults (L=100, rescore=50), the widened
 * uniform-random setting the bench queries use (L=200, rescore=150), and
 * IVF routing at nProbe=2 of 8 shards.
 */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorFunctions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")

    def ensure(name: String, params: DiskannParams): String = {
      val path = s"/tmp/graft_recall/$tag/$name"
      if (!new java.io.File(s"$path/_meta/_SUCCESS").exists())
        DiskannIndex.build(e, "vec_id", "embedding", None, path, params)
      path
    }
    val cosPath = ensure("cos", DiskannParams(metric = "cosine"))
    val l2Path = ensure("l2", DiskannParams(metric = "l2"))
    val ipPath = ensure("ip", DiskannParams(metric = "ip"))
    val plainPath = ensure("plain", DiskannParams(metric = "cosine", storage = "plain"))
    // two IVF trainers, measured side by side: ivfSeed=None -> Lloyd
    // k-means (trainIvf), ivfSeed set -> md5-deterministic centroid pick
    // (trainIvfDeterministic, the oracle-replayable weaker quantizer)
    val ivfPath = ensure("ivf", DiskannParams(metric = "cosine",
      partitioner = "ivf", shardTargetRows =
        math.max(1L, e.count() / 8)))
    val ivfDetPath = ensure("ivf_det", DiskannParams(metric = "cosine",
      partitioner = "ivf", shardTargetRows =
        math.max(1L, e.count() / 8), ivfSeed = Some("recall")))

    val k = 10
    val queries = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val nq = queries.count()

    // exact ground truth per metric: brute-force per-query top-k
    def exactFor(dist: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): Map[Long, Set[Long]] =
      e.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"),
          dist(col("embedding"), col("qvec")).as("d"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d"), col("vec_id"))))
        .filter(col("rnk") <= k)
        .select(col("qid"), col("vec_id"))
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exactByMetric: Map[String, Map[Long, Set[Long]]] = Map(
      "cosine" -> exactFor(VectorFunctions.vec_cosine_dist),
      "l2" -> exactFor(VectorFunctions.vec_l2sq),
      "ip" -> exactFor(VectorFunctions.vec_neg_dot))
    val exact = exactByMetric("cosine")

    def recallVs(truthMap: Map[Long, Set[Long]])(res: DataFrame): Double = {
      val got = res.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = truthMap.map { case (qid, truth) =>
        got.get(qid).map(g => g.intersect(truth).size.toDouble / k).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    def recallOf(res: DataFrame): Double = recallVs(exact)(res)

    // reference query GUC defaults (L=100, rescore=50) tracked PER METRIC
    // each round (VERDICT r4 #4), plus the widened settings the bench
    // queries use and IVF routing
    val configs = Seq(
      ("guc_defaults_L100_r50", cosPath, "cosine", 100, 50, 0),
      ("guc_defaults_l2_L100_r50", l2Path, "l2", 100, 50, 0),
      ("guc_defaults_ip_L100_r50", ipPath, "ip", 100, 50, 0),
      ("plain_L100_r50", plainPath, "cosine", 100, 50, 0),
      ("widened_L200_r150", cosPath, "cosine", 200, 150, 0),
      ("wide_L400_r300", cosPath, "cosine", 400, 300, 0),
      ("wide_L800_r600", cosPath, "cosine", 800, 600, 0),
      ("ivf_lloyd_nprobe2_L200_r150", ivfPath, "cosine", 200, 150, 2),
      ("ivf_lloyd_nprobe4_L400_r300", ivfPath, "cosine", 400, 300, 4),
      ("ivf_det_nprobe2_L200_r150", ivfDetPath, "cosine", 200, 150, 2),
      ("ivf_det_nprobe4_L400_r300", ivfDetPath, "cosine", 400, 300, 4))
    val annResults = configs.map { case (name, path, m, l, r, np) =>
      name -> recallVs(exactByMetric(m))(
        DiskannIndex.search(spark, path, queries, k, l, r, nProbe = np))
    }

    // JL-projection envelope: 64-d -> 16-d randomProject, candidates ranked
    // by projected-space cosine, with and without an exact full-precision
    // rescore of a 3x candidate pool (the pipeline shape: 4x less candidate
    // bandwidth, exactness restored on the short list)
    import graft.operators.Similarity
    def toF(c: org.apache.spark.sql.Column) = transform(c, x => x.cast("float"))
    def jlConfigs(outDim: Int): Seq[(String, Double)] = {
      val projCorpus = Similarity.randomProject(e, "vec_id", "embedding", 64, outDim)
        .select(col("id").as("vec_id"), toF(col("proj")).as("pvec"))
      val projQ = Similarity.randomProject(
        queries.select(col("qid"), col("qvec").as("embedding")), "qid", "embedding", 64, outDim)
        .select(col("id").as("qid"), toF(col("proj")).as("pqvec"))
      // persisted: the ranked crossJoin (the heaviest stage) feeds BOTH the
      // direct top-10 and the rescore pool
      val projRanked = projCorpus.crossJoin(broadcast(projQ))
        .select(col("qid"), col("vec_id"),
          VectorFunctions.vec_cosine_dist(col("pvec"), col("pqvec")).as("d"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d"), col("vec_id"))))
        .transform(graft.CacheScope.persist)
      val projTop10 = projRanked.filter(col("rnk") <= k).select(col("qid"), col("vec_id"))
      val rescored = projRanked.filter(col("rnk") <= 3 * k)
        .select(col("qid"), col("vec_id"))
        .join(e, "vec_id").join(broadcast(queries), "qid")
        .select(col("qid"), col("vec_id"),
          VectorFunctions.vec_cosine_dist(col("embedding"), col("qvec")).as("d"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d"), col("vec_id"))))
        .filter(col("rnk") <= k).select(col("qid"), col("vec_id"))
      val out = Seq(s"jl${outDim}_top10_norescore" -> recallOf(projTop10),
        s"jl${outDim}_cand30_rescored" -> recallOf(rescored))
      graft.CacheScope.releaseAll()
      out
    }
    val results = annResults ++ jlConfigs(16) ++ jlConfigs(32)
    val js = results.map { case (n, v) => "\"" + n + f"""\":$v%.4f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"recall10","configs":$js,"k":$k,"nq":$nq,"sf":"$sfDir"}""")
    spark.stop()
  }
}
