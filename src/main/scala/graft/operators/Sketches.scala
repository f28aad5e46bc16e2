package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Mergeable distinct-count sketches for corpus-scale set statistics.
 *
 * KMV (k minimum values): keep the k smallest DISTINCT hash values of a set;
 * the k-th smallest, normalized to [0,1), estimates the set's density, so
 * |S| ≈ (k-1)/θ_k. Properties that matter at 100 TB:
 *
 *  - O(k) memory per group, map-side partial aggregation: per-source
 *    distinct-token statistics cost ONE shuffle of ≤ nPartitions×k tiny
 *    buffers — no corpus-wide `distinct()` (which shuffles every distinct
 *    token) and no per-group sort.
 *  - Mergeable across sets: K(A ∪ B) = k smallest of K(A) ∪ K(B), and every
 *    kept hash is below BOTH input thresholds, so membership flags against
 *    the input sketches are exact → unbiased Jaccard / union / intersection
 *    estimates from two k-row sketches (Beyer et al., "On Synopses for
 *    Distinct-Value Estimation Under Multiset Operations", SIGMOD'07).
 *  - Deterministic and engine-replayable: the hash is the library's md5
 *    low-60 idiom ([[Curation.md5Low60]]), so DuckDB replays the exact
 *    sketch — the estimates hash-match the oracle, unlike engine-native
 *    HLL (`approx_count_distinct`) whose registers are implementation-
 *    private.
 *
 * This is the 100 TB shape of `vocab_overlap`: the exact query's
 * token-keyed self-join is bounded by nSources² rows per shared token,
 * fine for tens of sources; the sketch path is O(nSources·k) after one
 * scan regardless of vocabulary size.
 */
object Sketches {

  /** Buffer of [[KmvAgg]]: ≤k smallest distinct hashes seen, sorted
    * ascending. */
  case class KmvState(hs: Array[Long])

  /** Bounded mergeable KMV aggregator over pre-hashed Long values.
    * Feeding it raw (non-distinct) occurrences is the point: dedup happens
    * inside the O(k) buffer, so no distinct-shuffle precedes it. */
  class KmvAgg(k: Int) extends Aggregator[Long, KmvState, Seq[Long]] {
    require(k >= 2, s"KMV needs k >= 2: $k")
    private def insert(s: KmvState, h: Long): KmvState = {
      val n = s.hs.length
      if (n == k && h >= s.hs(n - 1)) return s
      var p = 0
      while (p < n && s.hs(p) < h) p += 1
      if (p < n && s.hs(p) == h) return s // already present
      val m = math.min(n + 1, k)
      val hs = new Array[Long](m)
      System.arraycopy(s.hs, 0, hs, 0, p)
      hs(p) = h
      System.arraycopy(s.hs, p, hs, p + 1, m - p - 1)
      KmvState(hs)
    }
    override def zero: KmvState = KmvState(Array.emptyLongArray)
    override def reduce(b: KmvState, a: Long): KmvState = insert(b, a)
    override def merge(x: KmvState, y: KmvState): KmvState = {
      var s = x; var i = 0
      while (i < y.hs.length) { s = insert(s, y.hs(i)); i += 1 }
      s
    }
    override def finish(s: KmvState): Seq[Long] = s.hs.toSeq
    override def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** 2^60 as a double — the md5-low-60 hash domain size. Written as the
    * same literal in the oracle SQL so both engines divide by the exact
    * same double. */
  val HashDomain = 1.152921504606846976e18

  /** Per-group KMV sketches: one row per group, `sketch` = the k smallest
    * distinct `hashCol` values, ascending. One shuffle of O(k) partials. */
  def kmvSketches(df: DataFrame, groupCol: String, hashCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new KmvAgg(k)
    df.select(col(groupCol).cast(StringType).as("_1"),
        col(hashCol).cast(LongType).as("_2"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("sketch"))
      .toDF(groupCol, "sketch")
  }

  /** Column-level merge of two stored KMV sketch columns: the k smallest
    * of the union — all codegen'd built-ins, so sketches persisted per
    * shard/day/source merge in later jobs WITHOUT rescanning data (union
    * across days = one merge of two k-row arrays per group). Identical to
    * what [[KmvAgg.merge]] would produce over the combined input. */
  def kmvMergeCols(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Distinct-count estimate from a KMV sketch column: exact when the
    * sketch is exhaustive (|set| < k), else (k-1)·2^60/h_k. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast(DoubleType))
      .otherwise(lit((k - 1).toDouble) * lit(HashDomain) /
        element_at(sketch, k).cast(DoubleType))

  /**
   * Per-group distinct-count estimates with the exact count alongside as
   * the audit harness (the exact side is the sf-scale check — at corpus
   * scale one runs only the sketch side). Returns
   * (group, n_exact, n_est, rel_err).
   */
  def kmvDistinctAudit(df: DataFrame, groupCol: String, hashCol: String,
      k: Int): DataFrame = {
    val sk = kmvSketches(df, groupCol, hashCol, k)
      .select(col(groupCol), round(kmvEstimate(col("sketch"), k), 3).as("n_est"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(hashCol)).as("n_exact"))
    exact.join(broadcast(sk), groupCol)
      .select(col(groupCol), col("n_exact"), col("n_est"),
        round(abs(col("n_est") - col("n_exact")) / col("n_exact"), 4)
          .as("rel_err"))
  }

  /**
   * Pairwise set-overlap estimates between groups from their KMV sketches:
   * for each unordered group pair, the union sketch is the k smallest of
   * the two sketch sets; every kept hash is below both input thresholds, so
   * `jac_est` = fraction of kept hashes present in both sketches is the
   * unbiased Jaccard estimator, and `union_est`/`inter_est` follow. All
   * post-sketch work is bounded by nPairs×2k rows — the rank window runs
   * over ≤2k rows per pair, never over data.
   */
  def kmvOverlap(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    val ex = sketches.select(col(groupCol).as("__g"),
      explode(col("sketch")).as("h"))
    val pairs = sketches.select(col(groupCol).as("ga")).crossJoin(
        sketches.select(col(groupCol).as("gb")))
      .filter(col("ga") < col("gb"))
    // nPairs × ≤2k rows: membership flags per hash, then per-pair top-k
    val pe = pairs.join(ex, col("__g") === col("ga") || col("__g") === col("gb"))
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("__g") === col("ga")).as("in_a"),
        max(col("__g") === col("gb")).as("in_b"))
    val ranked = pe.withColumn("rn", row_number().over(
      Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))))
    ranked.filter(col("rn") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_kept"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("n_both"),
        max(when(col("rn") === k, col("h"))).as("hk"))
      .select(col("ga"), col("gb"),
        round(col("n_both").cast(DoubleType) / col("n_kept"), 6).as("jac_est"),
        round(when(col("n_kept") < k, col("n_kept").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble) * lit(HashDomain) /
            col("hk").cast(DoubleType)), 3).as("union_est"))
      .withColumn("inter_est",
        round(col("jac_est") * col("union_est"), 3))
  }
}
