package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-analysis operators over edge lists: PageRank-style centrality for
 * corpus curation (web-graph quality weighting a la the original
 * Brin & Page / Common-Crawl harmonic-centrality ranking) and for
 * kNN-graph health auditing (a hub score that complements
 * [[Similarity.hubnessAudit]]'s in-degree counts).
 *
 * Shape at 100 TB: each iteration is ONE shuffle join (ranks onto the edge
 * list's src key) plus ONE aggregation (contributions onto dst) — the
 * textbook distributed PageRank. Pre-partition `edges` by `src` (bucketing)
 * and the per-iteration join reuses that partitioning; ranks are a narrow
 * (id, r) table. Iteration count is a fixed small constant (curation wants
 * a coarse quality signal, not convergence to 1e-12), so the whole
 * computation is `nIter` shuffles end-to-end.
 *
 * Determinism: floating-point sums over incoming edges are partition-order
 * dependent, so contributions are quantized to fixed-point longs
 * (floor(x * 2^40 + 0.5)) BEFORE the aggregation — long addition commutes,
 * making every iteration's ranks independent of partitioning and exactly
 * replayable by any engine that evaluates the same IEEE-double expression
 * tree (the DuckDB oracle replays all iterations from the same edge list).
 * Per-node sums are bounded by rank mass ≤ 1, i.e. ≤ 2^40 — no overflow at
 * any corpus size.
 */
object GraphOps {

  /** Fixed-point scale for order-independent contribution sums. */
  val RankScale: Double = 1099511627776.0 // 2^40

  /**
   * PageRank over a directed edge list `(src: long, dst: long)` for a fixed
   * `nIter` iterations with damping `d`:
   *
   *   r'(v) = (1-d)/N + d * sum_{u->v} r(u)/outdeg(u) + d * dangling/N
   *
   * where `dangling` is the rank mass parked on nodes with no out-edges
   * (redistributed uniformly, the standard correction). Returns
   * `(id, rank)` for every node that appears as a src or dst.
   */
  def pageRank(edges: DataFrame, nIter: Int = 3,
      damping: Double = 0.85, driverSolveMaxEdges: Int = 1000000): DataFrame = {
    require(nIter >= 1 && nIter <= 50, s"pageRank: nIter out of range: $nIter")
    // ranks feed three consumers per iteration (contributions, dangling
    // mass, next iteration) — without persists the edge subtree would
    // recompute exponentially in nIter. CacheScope so Verify/Bench release
    // the blocks after the consuming action. Persisted BEFORE the fast-
    // path probe so the probe's materialization is reused either way.
    val e = graft.CacheScope.persist(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")))
    // adaptive fast path (the connectedComponents precedent): a kNN graph
    // of a broadcast-sized corpus is a few thousand edges — the iterative
    // DataFrame loop's per-stage overhead dwarfs the arithmetic. Bounded
    // probe: a count capped at N+1 decides (only a count crosses to the
    // driver); the full collect happens only once the graph is known
    // small, and reads the just-persisted blocks. Both paths compute the
    // IDENTICAL fixed-point arithmetic (asserted equal in GraphOpsSpec),
    // so the choice is invisible to results.
    if (driverSolveMaxEdges > 0 &&
        e.limit(driverSolveMaxEdges + 1).count() <= driverSolveMaxEdges) {
      return driverPageRank(e.sparkSession,
        e.collect().map(r => (r.getLong(0), r.getLong(1))), nIter, damping)
    }
    val nodes = graft.CacheScope.persist(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    val deg = graft.CacheScope.persist(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    // N is the one driver scalar (a count, not a collect of rows); the same
    // 1.0/N double reaches both engines through the identical expression.
    val n = nodes.count().toDouble

    var ranks = nodes.select(col("id"), (lit(1.0) / n).as("r"))
    for (_ <- 1 to nIter) {
      // ranks appear twice in the next iteration's plan (contributions +
      // dangling), so the logical plan doubles per iteration — truncate the
      // lineage, don't just cache, or explain strings and optimizer time
      // grow 2^nIter (OOMs around 10 iterations)
      ranks = ranks.localCheckpoint(true)
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"),
          floor(col("r") * RankScale / col("outdeg") + 0.5)
            .cast("long").as("q"))
        .groupBy(col("id")).agg(sum(col("q")).as("insum"))
      // dangling mass: one tiny aggregate, broadcast into the update
      val dangling = ranks
        .join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
        .agg(coalesce(sum(floor(col("r") * RankScale + 0.5).cast("long")),
          lit(0L)).as("dq"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("insum"), lit(0L)).cast("double") /
              RankScale) +
            lit(damping) * (col("dq").cast("double") / RankScale) / n)
            .as("r"))
    }
    ranks
  }

  /**
   * Semi-supervised label propagation over a directed edge list: seeded
   * nodes keep their label forever; every other node takes, per round, the
   * MAJORITY label among its out-neighbors' current labels (unlabeled
   * neighbors don't vote; ties break toward the smallest label; a node
   * with no labeled neighbor stays unlabeled). `nIter` fixed rounds — the
   * auto-labeling pass that turns a small seed set plus a kNN graph
   * ([[Similarity.knnGraph]] or the ANN index's out-edges at scale) into
   * corpus-wide weak labels.
   *
   * Shape at 100 TB: each round is ONE join (labels onto the edge list's
   * dst key) + ONE aggregation (votes per (src, label)) + the
   * deterministic arg-max — the PageRank cost class, no pairwise work.
   * The vote arg-max uses max(struct(cnt, -label)) instead of a window
   * sort, so only per-(src,label) partials cross the shuffle.
   *
   * Everything is integer counts — exactly replayable by any SQL engine.
   * Returns (id, label, src_kind) with label NULL when never reached and
   * src_kind 'seed'/'propagated'/'unlabeled'.
   */
  def labelPropagate(edges: DataFrame, seeds: DataFrame, nIter: Int = 2,
      driverSolveMaxEdges: Int = 1000000): DataFrame = {
    require(nIter >= 1 && nIter <= 20,
      s"labelPropagate: nIter out of range: $nIter")
    val e = graft.CacheScope.persist(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")))
    // normalize seeds ONCE for both paths: null labels can't seed, and a
    // duplicated seed id resolves to its smallest label — otherwise the
    // distributed left-join would multiply rows while the driver map kept
    // an arbitrary winner, and the answer would flip with the edge count
    val seedNorm = graft.CacheScope.persist(
      seeds.select(col("id").cast("long").as("id"),
          col("label").cast("long").as("__seed"))
        .filter(col("__seed").isNotNull)
        .groupBy(col("id")).agg(min(col("__seed")).as("__seed")))
    // adaptive fast path, same probe discipline as pageRank: pure integer
    // majority logic, so driver and distributed agree exactly (asserted in
    // GraphOpsSpec). Seeds are bounded by construction (a seed SET).
    if (driverSolveMaxEdges > 0 &&
        e.limit(driverSolveMaxEdges + 1).count() <= driverSolveMaxEdges) {
      return driverLabelPropagate(e.sparkSession,
        e.collect().map(r => (r.getLong(0), r.getLong(1))),
        seedNorm.collect().map(r => (r.getLong(0), r.getLong(1))),
        nIter)
    }
    val nodes = graft.CacheScope.persist(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    val seed = seedNorm

    var labels = nodes.join(seed, Seq("id"), "left")
      .select(col("id"), col("__seed").as("label"))
    for (_ <- 1 to nIter) {
      labels = labels.localCheckpoint(true) // lineage doubles per round
      val votes = e
        .join(labels.select(col("id").as("dst"), col("label").as("__nl")), "dst")
        .filter(col("__nl").isNotNull)
        .groupBy(col("src"), col("__nl")).agg(count(lit(1)).as("__c"))
        .groupBy(col("src"))
        .agg(max(struct(col("__c"), (-col("__nl")).as("__neg"))).as("__best"))
        .select(col("src").as("id"), (-col("__best.__neg")).as("__vote"))
      labels = nodes.join(seed, Seq("id"), "left")
        .join(votes, Seq("id"), "left")
        .select(col("id"), coalesce(col("__seed"), col("__vote")).as("label"))
    }
    labels.join(seed, Seq("id"), "left")
      .select(col("id"), col("label"),
        when(col("__seed").isNotNull, "seed")
          .when(col("label").isNotNull, "propagated")
          .otherwise("unlabeled").as("src_kind"))
  }

  /** The same majority-vote rounds in one driver loop — pure integer
    * logic, so exactly the distributed result (seeds win; per round the
    * arg-max over (votes, -label); unlabeled neighbors don't vote). */
  private def driverLabelPropagate(spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Long, Long)], seeds: Array[(Long, Long)],
      nIter: Int): DataFrame = {
    import spark.implicits._
    val ids = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val seedMap = seeds.toMap
    // out-adjacency as index arrays
    val srcI = edges.map(t => idx(t._1))
    val dstI = edges.map(t => idx(t._2))
    var labels: Array[Option[Long]] =
      ids.map(id => seedMap.get(id))
    for (_ <- 1 to nIter) {
      val votes = Array.fill(ids.length)(
        scala.collection.mutable.Map.empty[Long, Long])
      var k = 0
      while (k < edges.length) {
        labels(dstI(k)).foreach { l =>
          val m = votes(srcI(k))
          m.update(l, m.getOrElse(l, 0L) + 1L)
        }
        k += 1
      }
      labels = Array.tabulate(ids.length) { i =>
        seedMap.get(ids(i)).orElse {
          if (votes(i).isEmpty) None
          else Some(votes(i).toSeq.maxBy { case (l, c) => (c, -l) }._1)
        }
      }
    }
    ids.zip(labels).toSeq.map { case (id, l) =>
      val kind =
        if (seedMap.contains(id)) "seed"
        else if (l.isDefined) "propagated"
        else "unlabeled"
      (id, l, kind)
    }.toDF("id", "label", "src_kind")
  }

  /** The same fixed-point iteration in one driver loop — every double op in
    * the same order as the distributed expressions, so results are
    * bit-identical, not just close. */
  private def driverPageRank(spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Long, Long)], nIter: Int, damping: Double): DataFrame = {
    import spark.implicits._
    val ids = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length.toDouble
    val srcI = edges.map(e => idx(e._1))
    val dstI = edges.map(e => idx(e._2))
    val outdeg = new Array[Long](ids.length)
    srcI.foreach(i => outdeg(i) += 1)
    var r = Array.fill(ids.length)(1.0 / n)
    val base = (1.0 - damping) / n
    for (_ <- 1 to nIter) {
      val insum = new Array[Long](ids.length)
      var k = 0
      while (k < edges.length) {
        val s = srcI(k)
        insum(dstI(k)) += math.floor(r(s) * RankScale / outdeg(s) + 0.5).toLong
        k += 1
      }
      var dq = 0L
      var i = 0
      while (i < ids.length) {
        if (outdeg(i) == 0) dq += math.floor(r(i) * RankScale + 0.5).toLong
        i += 1
      }
      r = Array.tabulate(ids.length)(i =>
        base + damping * (insum(i).toDouble / RankScale) +
          damping * (dq.toDouble / RankScale) / n)
    }
    ids.zip(r).toSeq.toDF("id", "r")
  }
}
