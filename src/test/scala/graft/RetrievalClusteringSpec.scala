package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Dedup, Similarity, TextAnalysis}

/** BM25 retrieval scoring and the deterministic Lloyd refinement step. */
class RetrievalClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry"),
    (4L, "plum plum plum plum")).toDF("doc_id", "text")

  test("bm25 matches the closed-form score and ranks rare terms higher") {
    val got = TextAnalysis.bm25(corpus, "doc_id", "text", Seq("apple", "cherry"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent hand computation of the same BM25 definition
    val n = 4.0; val avgdl = (3 + 2 + 3 + 4) / 4.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def term(tf: Double, dl: Double, df: Double) =
      if (tf == 0) 0.0
      else idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def score(tfA: Double, tfC: Double, dl: Double) =
      term(tfA, dl, 1.0) + term(tfC, dl, 2.0)

    assert(math.abs(got(1L) - score(2, 0, 3)) < 1e-12)
    assert(math.abs(got(2L) - score(0, 1, 2)) < 1e-12)
    assert(math.abs(got(3L) - score(0, 3, 3)) < 1e-12)
    assert(got(4L) == 0.0)
    // "apple" (df=1) outscores "cherry" (df=2) at comparable tf/dl
    assert(got(1L) > got(3L))
  }

  test("kmeansRefineDeterministic: partition-order-invariant fixed-point means") {
    val vecs = (0L until 40L)
      .map(i => (i, Array(i.toFloat / 7f, 1f - i.toFloat / 11f, 0.25f)))
    val df = vecs.toDF("vec_id", "embedding")
    val a = Similarity.kmeansRefineDeterministic(
      df.repartition(1), "vec_id", "embedding", nCentroids = 3, seed = "t1")
      .orderBy("cluster").collect()
    val b = Similarity.kmeansRefineDeterministic(
      df.repartition(7), "vec_id", "embedding", nCentroids = 3, seed = "t1")
      .orderBy("cluster").collect()
    // long accumulation is associative: bit-identical under any partitioning
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.getLong(1)).sum == 40L)
    assert(a.forall(r => r.getDouble(2) > 0 && r.getDouble(3) >= 0))
  }

  test("kmeansRefineDeterministic with one centroid equals the global mean") {
    val vecs = Seq((0L, Array(1.0f, 3.0f)), (1L, Array(2.0f, 5.0f)),
      (2L, Array(6.0f, 1.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val row = Similarity.kmeansRefineDeterministic(
      df, "vec_id", "embedding", nCentroids = 1, seed = "g").head()
    val mean = Array((1.0 + 2.0 + 6.0) / 3.0, (3.0 + 5.0 + 1.0) / 3.0)
    val norm = math.sqrt(mean(0) * mean(0) + mean(1) * mean(1))
    assert(row.getLong(1) == 3L)
    // fixed-point (2^-20) quantization error is far below this tolerance
    assert(math.abs(row.getDouble(2) - norm) < 1e-5)
  }

  test("sparseDotTopK equals brute-force thresholded dot; no-overlap rows absent") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, 0.0f, 0.3f, 0.0f)),
      (2L, Array(0.0f, 0.9f, 0.0f, 0.0f)),   // shares no active dim with q
      (3L, Array(0.4f, 0.0f, 0.0f, 0.6f)),
      (4L, Array(0.1f, 0.1f, 0.1f, 0.1f)))   // all below threshold
    val q = Array(0.8f, 0.0f, 0.2f, 0.7f)
    val got = graft.operators.Similarity
      .sparseDotTopK(vecs.toDF("id", "vec"), "id", "vec", q,
        threshold = 0.15, k = 10, roundDecimals = Some(6))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // active q dims: 0 (0.8), 2 (0.2), 3 (0.7). doc1: 0.5*0.8 + 0.3*0.2;
    // doc3: 0.4*0.8 + 0.6*0.7; doc2/doc4 share no active dims → absent
    def d(x: Float, y: Float) = x.toDouble * y.toDouble
    val exp1 = BigDecimal(d(0.5f, 0.8f) + d(0.3f, 0.2f))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp3 = BigDecimal(d(0.4f, 0.8f) + d(0.6f, 0.7f))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((3L, exp3), (1L, exp1)))
  }

  test("posting index: partition-pruned scan, same results as direct sparse top-k") {
    import spark.implicits._
    val path = "/tmp/graft_test_index/postings"
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).toArray
    val corpus = e.filter($"vec_id" =!= 0)
    graft.operators.Similarity.buildPostingIndex(
      corpus, "vec_id", "embedding", path, threshold = 0.15)
    val viaIndex = graft.operators.Similarity.sparseSearchIndexed(
      spark, path, q, threshold = 0.15, k = 10, roundDecimals = Some(6))
    // the scan must read ONLY the active dims' partitions
    // sparkPlan, not executedPlan: AQE wraps the executed tree in
    // AdaptiveSparkPlanExec whose children are invisible to collect
    val scans = viaIndex.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "posting scan lost its partition filter")
    val nActive = q.count(_ > 0.15f)
    assert(scans.map(_.selectedPartitions.partitionCount).sum == nActive,
      s"expected $nActive pruned partitions")
    val direct = graft.operators.Similarity.sparseDotTopK(
      corpus, "vec_id", "embedding", q, threshold = 0.15, k = 10,
      roundDecimals = Some(6))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = viaIndex.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == direct)
  }

  test("keep-best composition keeps the higher-quality member of a dup pair") {
    val base = "the cat sat on the mat and then the dog sat too"
    val docs = Seq(
      (10L, base),
      (11L, base + " 9999999999999999999999"), // digits depress quality
      (12L, "totally unrelated text about volcano geology formations")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .select(col("id_a"), col("id_b"))
    val clusters = Curation.connectedComponents(pairs)
    val quality = TextAnalysis.quality(docs, "doc_id", "text")
      .select(col("doc_id"), col("quality_score"))
    val kept = clusters.join(quality, clusters("id") === quality("doc_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
          .orderBy(col("quality_score").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id")).collect()
    assert(kept.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 10L)))
  }

  test("maxsimTopK: per-query max over the doc bag, then sum; hand-checked") {
    val e1 = Array(1f, 0f, 0f); val e2 = Array(0f, 1f, 0f)
    val e3 = Array(0f, 0f, 1f)
    val mix = Array(math.sqrt(0.5).toFloat, 0f, math.sqrt(0.5).toFloat) // (e1+e3)/√2
    val corpus = Seq((0L, e1), (0L, e2), (1L, e3), (1L, mix)).toDF("doc", "vec")
    val queries = Seq((0, e1), (1, e3)).toDF("q_ix", "qvec")
    val got = Similarity.maxsimTopK(corpus, queries, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // doc0: max(1, 0) + max(0, 0) = 1.0
    // doc1: max(0, √.5) + max(1, √.5) = 1.707107
    assert(got.head == (1L -> 1.707107))
    assert(got(1) == (0L -> 1.0))
  }

  test("knnClassify: majority vote wins; vote ties break on closest rank") {
    // corpus on a line: 3 label-0 points near x=0, 2 label-1 near x=10;
    // query at x=1 with k=5 sees all -> label 0 by 3-2 majority
    def v(x: Double) = Array(x.toFloat, 1f)
    val corpus = Seq(
      (1L, v(0.0), 0), (2L, v(0.4), 0), (3L, v(0.8), 0),
      (4L, v(10.0), 1), (5L, v(10.5), 1)).toDF("id", "vec", "label")
    val queries = Seq((100L, v(1.0))).toDF("qid", "qvec")
    val dist = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      round(graft.functions.VectorFunctions.vec_cosine_dist(a, b), 6)
    val got = Similarity.knnClassify(corpus, queries, k = 5, dist).collect()
    assert(got.length == 1)
    assert(got.head.getInt(1) == 0 && got.head.getLong(2) == 3L)

    // 2-2 tie at k=4: the label holding the single closest neighbor wins
    val tied = Similarity.knnClassify(
      corpus.filter(col("id") =!= 3L), queries, k = 4, dist).collect()
    assert(tied.head.getInt(1) == 0 && tied.head.getLong(2) == 2L)
  }

  test("covarianceAudit: known covariance recovered; partition-order-invariant") {
    // perfectly correlated pair of dims: cov = var = 1.25, corr = 1
    val vs = Seq(0f, 1f, 2f, 3f).map(x => Tuple1(Array(x, x)))
    val df = vs.toDF("embedding")
    val got = Similarity.covarianceAudit(df, "embedding", dims = 2)
      .orderBy(col("dim_i"), col("dim_j")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 0L, 1.25, 1.0), (0L, 1L, 1.25, 1.0),
      (1L, 1L, 1.25, 1.0)))
    // fixed-point sums commute: any partitioning gives byte-identical output
    val rep = Similarity.covarianceAudit(df.repartition(7), "embedding", dims = 2)
      .orderBy(col("dim_i"), col("dim_j")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rep.toSeq == got.toSeq)
  }

  test("hardNegatives: nearest same-label rows are excluded, k nearest others kept") {
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val corpus = Seq(
      (1L, v(1, 0.01), 0),  // same label as query — nearest, must be excluded
      (2L, v(1, 0.2), 1),
      (3L, v(1, 0.5), 1),
      (4L, v(0, 1), 2)).toDF("id", "vec", "label")
    val queries = Seq((9L, v(1, 0.0), 0)).toDF("qid", "qvec", "qlabel")
    val dist = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      round(graft.functions.VectorFunctions.vec_cosine_dist(a, b), 6)
    val got = Similarity.hardNegatives(corpus, queries, k = 2, dist)
      .orderBy(col("rnk")).collect().map(_.getLong(1))
    assert(got.toSeq == Seq(2L, 3L)) // 1 filtered by label, 4 beyond k
  }

  test("contrastiveTriplets: nearest same-label positive joined with hard negatives") {
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val corpus = Seq(
      (1L, v(1, 0.01), 0), (2L, v(1, 0.2), 1),
      (3L, v(1, 0.5), 1), (4L, v(0, 1), 2)).toDF("id", "vec", "label")
    val queries = Seq((9L, v(1, 0.0), 0)).toDF("qid", "qvec", "qlabel")
    val dist = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      round(graft.functions.VectorFunctions.vec_cosine_dist(a, b), 6)
    val got = Similarity.contrastiveTriplets(corpus, queries, kNeg = 2, dist)
      .orderBy(col("neg_rnk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq((9L, 1L, 2L, 1), (9L, 1L, 3L, 2)))
  }

  test("centroidShift: identical cohorts -> 0, orthogonal centroids -> 1") {
    val old = Seq((0, Array(1f, 0f)), (0, Array(1f, 0f)),
      (1, Array(0f, 2f))).toDF("label", "embedding")
    val neu = Seq((0, Array(1f, 0f)), (1, Array(3f, 0f)))
      .toDF("label", "embedding")
    val got = Similarity.centroidShift(old, neu, "label", "embedding", dim = 2)
      .orderBy(col("label")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0, 2L, 1L, 0.0), (1, 1L, 1L, 1.0)))
  }

  test("heapsLaw: cumulative tokens and first-occurrence vocab per checkpoint") {
    val docs = Seq(
      (0L, "a b a"), (1L, "b c"),     // bucket 0: 5 toks, vocab {a,b,c}
      (2L, "c d"), (3L, "d e e")      // bucket 1: +5 toks, vocab +{d,e}
    ).toDF("doc_id", "text")
    val got = TextAnalysis.heapsLaw(docs, "doc_id", "text", bucketDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 5L, 3L), (1L, 10L, 5L)))
  }

  test("hubnessAudit: in-degree histogram counts zero-degree vectors; mass = queries*k") {
    def ang(deg: Double) = {
      val r = math.toRadians(deg); Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // 1->2, 2->1 (tie 1 vs 3 breaks on id), 3->2, 4->3
    val pts = Seq((1L, ang(0)), (2L, ang(1)), (3L, ang(2)), (4L, ang(90)))
    val corpus = pts.toDF("id", "vec")
    val queries = pts.toDF("qid", "qvec")
    val dist = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      round(graft.functions.VectorFunctions.vec_cosine_dist(a, b), 6)
    val got = Similarity.hubnessAudit(corpus, queries, k = 1, dist)
      .orderBy(col("in_degree")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toSeq == Seq(0L -> 1L, 1L -> 2L, 2L -> 1L))
    // histogram covers every vector; total edge mass = #queries * k
    assert(got.map(_._2).sum == 4)
    assert(got.map(p => p._1 * p._2).sum == 4)
  }

  test("mmrRerank: a near-duplicate of the top pick is deferred behind a diverse candidate") {
    val a = Array(1f, 0f, 0f)
    val b = Array(0.9998f, 0.02f, 0f) // near-dup of a
    val c = Array(0f, 1f, 0f)         // orthogonal
    val cand = Seq(
      (0L, 1L, 0.99, a), (0L, 2L, 0.98, b), (0L, 3L, 0.90, c))
      .toDF("qid", "id", "rel", "vec")
    val got = Similarity.mmrRerank(cand, selectK = 3, lambda = 0.7)
      .orderBy(col("rnk")).collect().map(_.getLong(2))
    // rank1 = highest rel (1); rank2: b scores .7*.98-.3*sim(a,b)≈.386,
    // c scores .7*.9-.3*0=.63 -> the diverse c jumps ahead of the near-dup
    assert(got.toSeq == Seq(1L, 3L, 2L))
  }
}
