package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Corpus-curation operators for large-scale training-data pipelines:
 * deterministic stratified sampling, vocabulary statistics, PII scrubbing,
 * benchmark decontamination, and duplicate-cluster assignment (connected
 * components over a near-dup pair graph). Everything is built from codegen'd
 * Catalyst built-ins; the only iteration (connected components) converges in
 * O(cluster diameter) rounds of one shuffle each.
 */
object Curation {

  /** Low 60 bits of md5 as a non-negative BIGINT — THE engine-replay hash
    * idiom of this library (DuckDB: `('0x' || substr(md5(x), 18, 15))
    * ::UBIGINT`). One definition so the (18, 15) hex window can never
    * drift between operators and their oracles. */
  def md5Low60(c: Column): Column =
    conv(substring(md5(c), 18, 15), 16, 10).cast(LongType)

  /** Uniform [0,1) derived from md5 of `seed:id` (low 60 bits / 2^60).
    * Deterministic and engine-independent — any SQL engine with md5() can
    * recompute the exact same sample, which makes sampled pipelines
    * reproducible and auditable (no engine RNG, no partition-order
    * dependence). */
  def md5Uniform(seed: String, id: Column): Column =
    md5Low60(concat_ws(":", lit(seed), id))
      .cast(DoubleType) / 1.152921504606846976e18

  /**
   * URL canonicalization — the crawl pipeline's pre-text dedup key (two
   * fetches of one page differ in case, default ports, fragments, tracking
   * params and param order; deduping on the RAW url misses most of them).
   * Pure Column pipeline (codegen'd, map-side, composes with the scan):
   *
   *  - scheme and authority lowercase (RFC 3986 §6.2.2.1); path/query keep
   *    their case (they are case-sensitive)
   *  - default ports dropped (`:80` for http, `:443` for https)
   *  - the fragment dropped (never sent to the server)
   *  - tracking params removed (`utm_*`, `gclid`, `fbclid`, `msclkid`)
   *  - remaining query params SORTED (split → array_sort → rejoin), empty
   *    query dropped
   *  - a bare root path normalizes away (`http://x.com/` == `http://x.com`)
   *
   * Heuristic-grade by design (full RFC 3986 percent-encoding
   * normalization needs a real parser); deterministic, so the key is
   * replayable across engines. Non-URL strings pass through best-effort.
   */
  def urlNormalize(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(path0 === "/", "").otherwise(path0)
    val query0 = regexp_extract(rest, "\\?(.*)$", 1)
    // drop tracking params, then sort what survives for an order-free key
    val kept = filter(split(query0, "&"), p =>
      !(p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)=") || p === ""))
    val query = array_join(array_sort(kept), "&")
    val canon = concat(scheme, lit("://"), auth, path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
    // not a scheme://... string at all — pass through trimmed
    when(scheme === "", u).otherwise(canon)
  }

  /**
   * Deterministic stratified sampling: keep a row iff md5-uniform(seed, id)
   * < rate(stratum). Pure map-side (no shuffle, no state); at 100 TB this
   * composes with the parquet scan and costs one md5 per row. Strata missing
   * from `rates` use `defaultRate`.
   */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      seed: String = "graft-sample"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(md5Uniform(seed, col(idCol)) < rate)
  }

  /**
   * Deterministic train/val/test split: assign each row to the first split
   * whose cumulative weight exceeds md5-uniform(seed, id). Pure map-side (no
   * shuffle, no state), stable under reruns and backfills — a late-arriving
   * row lands in the same split it always would have, and any engine with
   * md5() reproduces the assignment exactly (the auditability property eval
   * holdouts need: the test set is a pure function of ids, not of a
   * partitioning-dependent RNG).
   */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      seed: String = "graft-split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $splits")
    val u = md5Uniform(seed, col(idCol))
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assigned = splits.zip(cum).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), c), acc) => when(u < lit(c), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** The md5 shard route shared by [[shardPlan]] and [[writeShards]] — one
    * definition so the plan and the writer cannot disagree. */
  def shardBucket(idCol: String, nShards: Int, seed: String): Column =
    pmod(md5Low60(concat_ws(":", lit(seed), col(idCol))), lit(nShards.toLong))

  /**
   * Deterministic training-shard plan: every row lands in shard
   * `md5_low60(seed:id) mod nShards`, and the result is the per-shard
   * manifest (row count + payload size) a shard-writing job would feed to
   * `df.write.partitionBy`/bucketed output. md5 assignment means (a) the
   * plan is a pure function of ids — backfills and reruns route a row to
   * the same shard, so shards can be rewritten independently — and (b) any
   * engine replays it. Sizes concentrate tightly around mean/nShards
   * (binomial), so shards are balanced without a sort or a greedy packer.
   * One map-side md5 per row plus one combined aggregation — no skew, no
   * driver state.
   */
  def shardPlan(df: DataFrame, idCol: String, weightCol: Column,
      nShards: Int, seed: String = "graft-shard"): DataFrame = {
    require(nShards > 0, s"shardPlan: nShards must be positive: $nShards")
    df.select(shardBucket(idCol, nShards, seed).as("shard"),
        weightCol.cast(LongType).as("__w"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("total_weight"))
  }

  /**
   * Training-shard EXPORT — [[shardPlan]]'s writer: routes every row to its
   * md5 shard and writes `shard=K/` parquet partitions plus a
   * `_manifest.json` recording per-shard row counts (counted from the
   * FILES just written, so the manifest describes what is actually on
   * disk). Because the route is a pure function of ids, a backfill rewrite
   * of one shard touches only that shard's directory, and any engine can
   * verify the routing. Returns the per-shard manifest rows.
   */
  def writeShards(df: DataFrame, path: String, idCol: String, nShards: Int,
      seed: String = "graft-shard"): DataFrame = {
    require(nShards > 0, s"writeShards: nShards must be positive: $nShards")
    val spark = df.sparkSession
    df.withColumn("shard", shardBucket(idCol, nShards, seed))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val manifest = spark.read.parquet(path)
      .groupBy(col("shard").cast(LongType).as("shard"))
      .agg(count(lit(1)).as("n_rows"))
    val entries = manifest.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val json = entries
      .map { case (s, n) => s"""{"shard": $s, "n_rows": $n}""" }
      .mkString("[", ", ", "]")
    val p = new org.apache.hadoop.fs.Path(path, "_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    manifest
  }

  /** Buffer of [[MinKByHashAgg]]: the ≤k smallest (hash, id) pairs seen so
    * far, kept sorted ascending by (hash, then id). */
  case class MinKState(hs: Array[String], ids: Array[Long])

  /** Bounded mergeable min-k-by-hash aggregator: keeps the k rows with the
    * smallest (md5-hash, id) pair per group in O(k) memory. This is the
    * corpus-scale replacement for a per-stratum rank window — a stratum that
    * is 80% of a 100 TB corpus would otherwise sort billions of rows in one
    * partition, while here map-side partials each hold ≤k entries and only
    * nPartitions×k tiny buffers cross the shuffle. Ordering matches the rank
    * window exactly: ascending hex hash (fixed-length, so lexicographic ==
    * numeric), ties broken by id. */
  class MinKByHashAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, Long), MinKState, Seq[Long]] {
    private def lt(h1: String, i1: Long, h2: String, i2: Long): Boolean = {
      val c = h1.compareTo(h2); c < 0 || (c == 0 && i1 < i2)
    }
    private def insert(s: MinKState, h: String, id: Long): MinKState = {
      val n = s.hs.length
      if (n == k && !lt(h, id, s.hs(n - 1), s.ids(n - 1))) return s
      var p = 0
      while (p < n && lt(s.hs(p), s.ids(p), h, id)) p += 1
      if (p < n && s.hs(p) == h && s.ids(p) == id) return s // dedupe
      val m = math.min(n + 1, k)
      val hs = new Array[String](m); val ids = new Array[Long](m)
      System.arraycopy(s.hs, 0, hs, 0, p); System.arraycopy(s.ids, 0, ids, 0, p)
      hs(p) = h; ids(p) = id
      System.arraycopy(s.hs, p, hs, p + 1, m - p - 1)
      System.arraycopy(s.ids, p, ids, p + 1, m - p - 1)
      MinKState(hs, ids)
    }
    override def zero: MinKState =
      MinKState(Array.empty[String], Array.emptyLongArray)
    override def reduce(b: MinKState, a: (String, Long)): MinKState =
      insert(b, a._1, a._2)
    override def merge(x: MinKState, y: MinKState): MinKState = {
      var s = x; var i = 0
      while (i < y.hs.length) { s = insert(s, y.hs(i), y.ids(i)); i += 1 }
      s
    }
    override def finish(s: MinKState): Seq[Long] = s.ids.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[MinKState] =
      org.apache.spark.sql.Encoders.product[MinKState]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /**
   * Deterministic EXACT-k per-stratum sample: the k rows of each stratum
   * with the smallest md5(seed:id) — "give me exactly 1000 docs per
   * language for the eval set", as a pure function of ids (backfill-
   * stable, engine-replayable), where the rate-based
   * [[stratifiedSample]] can only hit k in expectation. Corpus-scale plan:
   * the bounded mergeable [[MinKByHashAgg]] picks each stratum's k ids with
   * map-side partial aggregation (no per-stratum sort, O(k) state), and the
   * ≤ nStrata×k winner ids broadcast into a map-side left-semi join against
   * the corpus. `idCol` must be integral and globally unique (it is the
   * sample's identity). Bit-identical to the rank-window formulation — the
   * windowed variant is kept package-private for the equality test.
   */
  def exactKPerStratum(df: DataFrame, idCol: String, strataCol: String,
      k: Int, seed: String = "graft-exactk"): DataFrame = {
    require(k > 0, s"exactKPerStratum: k must be positive: $k")
    // fail fast on the integral-id precondition: cast(string-ish id) would
    // yield null ids, an all-null pick list, and a silently EMPTY sample
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"exactKPerStratum: idCol '$idCol' must be integral (got $idType); " +
        "hash string ids to a BIGINT surrogate first (md5Low60)")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(strataCol).cast(StringType).as("_1"),
        md5(concat_ws(":", lit(seed), col(idCol))).as("_2"),
        col(idCol).cast(LongType).as("_3"))
      .as[(String, String, Long)]
    val agg = new MinKByHashAgg(k)
    val picked = keyed.groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(agg.toColumn.name("ids")).toDF("__s", "__ids")
      .select(explode(col("__ids")).as("__pick"))
    df.join(broadcast(picked), col(idCol).cast(LongType) === col("__pick"),
      "left_semi")
  }

  /** Rank-window formulation of [[exactKPerStratum]] — correct but sorts
    * each stratum's partition; kept only as the equality-test witness. */
  private[graft] def exactKPerStratumWindowed(df: DataFrame, idCol: String,
      strataCol: String, k: Int, seed: String = "graft-exactk"): DataFrame =
    df.withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
          .orderBy(md5(concat_ws(":", lit(seed), col(idCol))), col(idCol))))
      .filter(col("__r") <= k).drop("__r")

  /** Top-k vocabulary by document frequency-weighted token count: the classic
    * wordcount shape — explode is map-side, the groupBy gets a partial
    * (map-side combine) aggregate for free, and only per-token partials cross
    * the shuffle. Deterministic tie-break on the token string. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(TextAnalysis.tokens(col(textCol)).as("__w"))
      .select(explode_outer(col("__w")).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)

  /** Conservative PII patterns (RE2-compatible: no lookaround, so the same
    * pattern runs identically in Spark, DuckDB, Trino, ...). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}-\\d{4}"

  /**
   * PII scrub: count and redact email addresses and phone-like digit groups.
   * One regex pass per pattern per row, no shuffle. Returns the original
   * columns with `textCol` replaced by the redacted text plus per-row match
   * counts (`n_emails`, `n_phones`) for audit/reporting aggregation.
   */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", size(regexp_extract_all(t, lit(EmailRe), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PhoneRe), lit(0))))
      .withColumn(textCol,
        regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"))
  }

  /**
   * Benchmark decontamination: pairs (train doc, eval doc) sharing at least
   * `minShared` distinct word n-gram shingles. The eval side (benchmarks) is
   * small by construction, so its exploded shingles broadcast; the train side
   * is map-side explode + one shuffle on (train_id, eval_id) — the only
   * scalable shape at 100 TB (an all-pairs Jaccard join is quadratic).
   * Shingles are distinct per doc ([[Dedup.shinglesFromTokens]]), so the
   * join-count equals the distinct-shared-shingle count.
   */
  def contaminationPairs(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3, minShared: Long = 2): DataFrame = {
    // repartition before shingling: tokenize/shingle are interpreted HOFs and
    // the input is often a handful of parquet files — without this the whole
    // pass serializes onto one task per file. Join on a 64-bit shingle hash,
    // not the string: shingles are distinct per doc so counts are preserved
    // (collisions need ~2^32 shingles per doc pair), and the probe side
    // compares 8-byte keys instead of ~20-char strings.
    // explode_outer + isNotNull instead of explode: a plain explode makes
    // InferFiltersFromGenerate synthesize `size(sh)>0 AND isnotnull(sh)` and
    // push it below the repartition Exchange, re-inlining the whole staged
    // shingle pipeline into the (single-task) scan stage — interpreted HOFs
    // with no CSE re-tokenize per sub-term, turning the filter quadratic.
    // The outer generate infers nothing, and the null filter sits above the
    // Generate where it cannot be pushed.
    val par = train.sparkSession.sparkContext.defaultParallelism
    val tr = Dedup.shingled(train.repartition(par), idCol, textCol, shingleSize)
      .select(col("id").as("train_id"), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("train_id"), xxhash64(col("s")).as("h"))
    val ev = Dedup.shingled(eval_.repartition(par), idCol, textCol, shingleSize)
      .select(col("id").as("eval_id"), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("eval_id"), xxhash64(col("s")).as("h"))
    tr.join(broadcast(ev), "h")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /**
   * Contamination by COVERAGE FRACTION — the thresholding real decontam
   * passes use: a (train, eval) pair is contaminated when the shared
   * distinct shingles cover at least `minFrac` of the EVAL document's
   * shingles (absolute counts over-flag long documents and under-flag short
   * ones). Same broadcast shape as [[contaminationPairs]] plus one tiny
   * eval-side size table joined back (broadcast — it is eval-row-bounded).
   */
  def contaminationByFraction(train: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3,
      minFrac: Double = 0.5): DataFrame = {
    val par = train.sparkSession.sparkContext.defaultParallelism
    val evalSh = Dedup.shingled(eval_.repartition(par), idCol, textCol, shingleSize)
      .transform(graft.CacheScope.persist)
    val evSizes = evalSh.select(col("id").as("eval_id"),
      size(col("sh")).cast(LongType).as("__ev_n"))
    val ev = evalSh.select(col("id").as("eval_id"), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("eval_id"), xxhash64(col("s")).as("h"))
    val tr = Dedup.shingled(train.repartition(par), idCol, textCol, shingleSize)
      .select(col("id").as("train_id"), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("train_id"), xxhash64(col("s")).as("h"))
    tr.join(broadcast(ev), "h")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(evSizes), Seq("eval_id"))
      // threshold on the TRUE ratio; rounding is presentation-only (the
      // oracle mirrors this order, so borderline pairs agree too)
      .filter(col("n_shared").cast(DoubleType) / col("__ev_n") >= minFrac)
      .withColumn("frac", round(col("n_shared").cast(DoubleType) / col("__ev_n"), 6))
      .select(col("train_id"), col("eval_id"), col("n_shared"), col("frac"))
  }

  /**
   * Bloom-filter decontamination — the CONSTANT-SIZE approximate
   * pre-filter in front of [[contaminationPairs]]: the eval suite's
   * shingles fold into one m-bit Bloom filter (kHashes md5-derived hash
   * functions), and the train side is scanned map-side against the
   * broadcast filter — per train doc, how many of its shingles the filter
   * claims to have seen.
   *
   * Why it earns its place next to the exact path: the exact path
   * broadcasts the eval shingle table, whose size grows with the eval
   * suite; the Bloom filter is mBits/8 bytes NO MATTER WHAT (1 MiB here
   * covers benchmarks of any length), membership is O(k) with no join at
   * all, and the price is a quantified false-positive rate
   * (≈ (1-e^(-kn/m))^k). The standard web-scale shape: Bloom pre-filter
   * map-side over 100 TB, exact verification only on the tiny flagged
   * slice.
   *
   * Deterministic by construction — position_j(s) = low-60-bit
   * md5("j:" ++ s) mod mBits — so an independent engine rebuilds the
   * filter and replays every verdict exactly, false positives included.
   */
  /** SQL form of the Bloom position rule: low-60-bit md5("j:" ++ shingle)
    * mod mBits. [[bloomPosJvm]] is the byte-identical JVM twin (tested
    * equal) for row-local membership checks where the SQL form can't reach
    * (streaming gates). */
  private def bloomPosSql(j: Int, s: Column, mBits: Int): Column =
    conv(substring(md5(concat(lit(s"$j:"), s)), 18, 15), 16, 10)
      .cast(LongType) % mBits

  private[graft] def bloomPosJvm(j: Int, s: String, mBits: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$s".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(17, 32), 16) % mBits
  }

  /** Build the decontamination Bloom filter (mBits/64 longs) from the eval
    * suite — the broadcastable artifact behind [[bloomDecontam]] and the
    * streaming curation gate. Positions -> 64-bit words via bit_or
    * partials; the whole filter arrives on the driver as ONE bounded
    * collect (1 MiB at the default mBits). */
  def bloomFilterWords(eval_ : DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, mBits: Int = 1 << 23,
      kHashes: Int = 4): Array[Long] = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      "mBits must be a power of two >= 64")
    require(kHashes >= 1 && kHashes <= 16, "kHashes must be in [1, 16]")
    val par = eval_.sparkSession.sparkContext.defaultParallelism
    val evPos = Dedup.shingled(eval_.repartition(par), idCol, textCol, shingleSize)
      .select(explode_outer(col("sh")).as("s")).filter(col("s").isNotNull)
      .select(explode(array((0 until kHashes).map(j =>
        bloomPosSql(j, col("s"), mBits)): _*)).as("p"))
    val words = evPos
      .select(shiftright(col("p"), 6).cast(IntegerType).as("w"),
        expr("shiftleft(1L, cast(p % 64 as int))").as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
      .collect()
    val filter = new Array[Long](mBits / 64)
    words.foreach(r => filter(r.getInt(0)) = r.getLong(1))
    filter
  }

  /** Row-local Bloom verdict: the fraction of a row's shingles the
    * broadcast filter claims to have seen — [[bloomDecontam]]'s signal as a
    * STATELESS column function (no join, no aggregation), which is what a
    * streaming pipeline can host. Membership uses [[bloomPosJvm]], the
    * byte-identical JVM twin of the SQL position rule (pinned by test), so
    * batch and streaming verdicts agree exactly. */
  def bloomHitFrac(filter: org.apache.spark.broadcast.Broadcast[Array[Long]],
      mBits: Int = 1 << 23, kHashes: Int = 4)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((shs: scala.collection.mutable.Seq[String]) =>
      if (shs == null || shs.isEmpty) 0.0
      else shs.count { s =>
        (0 until kHashes).forall { j =>
          val p = bloomPosJvm(j, s, mBits)
          (filter.value((p >>> 6).toInt) & (1L << (p & 63))) != 0L
        }
      }.toDouble / shs.size)

  def bloomDecontam(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3, mBits: Int = 1 << 23,
      kHashes: Int = 4): DataFrame = {
    val spark = train.sparkSession
    def pos(j: Int, s: Column): Column = bloomPosSql(j, s, mBits)
    val par = spark.sparkContext.defaultParallelism
    val fBc = spark.sparkContext.broadcast(
      bloomFilterWords(eval_, idCol, textCol, shingleSize, mBits, kHashes))
    val bloomHit = udf((ps: scala.collection.mutable.Seq[Long]) => ps.forall(p =>
      (fBc.value((p >>> 6).toInt) & (1L << (p & 63))) != 0L))
    // train side: positions are plain SQL md5 expressions (replayable); the
    // UDF only tests bits against the broadcast words. The repartition
    // exists ONLY to parallelize interpreted shingling when the input is a
    // handful of files (the signatureTable rationale) — at corpus scale
    // there are already more splits than cores, and shuffling the 100 TB
    // text would negate the operator's whole map-side advantage, so it is
    // GATED on the incoming partition count.
    // partition count from the PHYSICAL PLAN, not train.rdd — .rdd on a
    // wide plan forces a full RDD conversion (row encoders and all) just to
    // ask a number the planned tree already knows
    val trainParts =
      train.queryExecution.executedPlan.outputPartitioning.numPartitions
    val trainPar =
      if (trainParts < par) train.repartition(par) else train
    Dedup.shingled(trainPar, idCol, textCol, shingleSize)
      .select(col("id"), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("__ps",
        array((0 until kHashes).map(j => pos(j, col("s"))): _*))
      .select(col("id"), bloomHit(col("__ps")).as("__hit"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_bloom_hits"))
      .withColumn("bloom_frac",
        round(col("n_bloom_hits").cast(DoubleType) / col("n_shingles"), 6))
  }

  /**
   * DSIR importance weights (Xie et al. 2023, "Data Selection for Language
   * Models via Importance Resampling"): score every document by how much
   * more likely its tokens are under a TARGET slice's hashed bag-of-words
   * LM than under the raw corpus LM —
   * `w(doc) = Σ_tok [ log p̂_target(b(tok)) − log p̂_raw(b(tok)) ]` with
   * add-one smoothing over `buckets` hash buckets. High-weight docs "look
   * like" the target distribution; resampling by these weights is the
   * paper's data-selection step (compose with [[stratifiedSample]] /
   * [[temperatureSample]] downstream).
   *
   * The hashing is the paper's own scaling lever and the reason this is
   * 100 TB-safe: the LM-count table is exactly `buckets` rows no matter the
   * corpus (one partial-aggregated shuffle to build, broadcast back), and
   * the per-doc score is explode → broadcast-join → one groupBy(doc) — the
   * vocabulary never exists as a join key. Bucket = low-32-bit md5 of the
   * token mod `buckets`, and each per-bucket log-ratio is fixed-pointed to
   * 1e-9 before the per-doc sum (the [[TextAnalysis.lmScore]] discipline),
   * so the weights are order-independent and exactly replayable by any
   * engine with md5() and ln().
   */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, "dsirWeights needs at least 2 hash buckets")
    val tok = df
      .select(col(idCol), isTarget.cast(BooleanType).as("__t"),
        explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .select(col(idCol), col("__t"),
        (conv(substring(md5(col("__w")), 1, 8), 16, 10).cast(LongType)
          % buckets).as("__b"))
      .transform(graft.CacheScope.persist)
    // the whole LM fits in `buckets` rows: totals ride along as one
    // grand-total row produced by the same aggregation (grouping sets), so
    // building both LMs plus their normalizers is ONE pass over the tokens
    val counts = tok.groupBy(col("__b"))
      .agg(count(lit(1)).as("__cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
      .transform(graft.CacheScope.persist)
    val totals = counts.agg(sum(col("__cr")).as("__tr"), sum(col("__ct")).as("__tt"))
    val term =
      log((col("__ct").cast(DoubleType) + 1.0) /
          (col("__tt").cast(DoubleType) + buckets)) -
      log((col("__cr").cast(DoubleType) + 1.0) /
          (col("__tr").cast(DoubleType) + buckets))
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("__b"), floor(term * 1e9 + 0.5).cast(LongType).as("__lr"))
    // ratios is `buckets` rows by construction — unconditionally broadcast
    tok.join(broadcast(ratios), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__lr")).cast(DoubleType) / 1e9, 6).as("dsir_weight"))
  }

  /**
   * DSIR selection step: Gumbel top-k over the [[dsirWeights]] importance
   * weights — sampling WITHOUT replacement from the softmax of
   * `weight / temperature` is exactly "add independent Gumbel noise and
   * take the top k" (the Gumbel-max trick, as used by the DSIR paper for
   * its resampling stage). Noise is md5-derived ([[md5Uniform]]) so the
   * selection is engine-replayable like every other sampler here; the
   * top-k is a partial per-partition TakeOrderedAndProject, never a global
   * sort of the corpus.
   */
  def dsirResample(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096, temperature: Double = 1.0,
      k: Int = 100, seed: String = "dsir"): DataFrame = {
    require(temperature > 0, "temperature must be > 0")
    val u = md5Uniform(seed, col(idCol))
    val gumbel = -log(-log(u))
    dsirWeights(df, idCol, textCol, isTarget, buckets)
      .select(col(idCol),
        round(col("dsir_weight") / temperature + gumbel, 6).as("sel_score"))
      .orderBy(col("sel_score").desc, col(idCol))
      .limit(k)
  }

  /**
   * Per-stratum adaptive quality gate (the FineWeb/RefinedWeb move): keep a
   * document iff its quality score clears its OWN stratum's `pctl`-quantile
   * — the cutoff adapts to each feed's score distribution instead of one
   * global constant that over-prunes clean feeds and under-prunes noisy
   * ones. Thresholds are ONE tiny aggregation (strata are sources/domains —
   * small by definition) broadcast back; the keep decision is map-side.
   * Score and threshold are both 6-decimal-rounded before the comparison so
   * the gate's verdicts replay exactly in any engine with the same quantile
   * definition (linear interpolation — Spark `percentile` == DuckDB
   * `quantile_cont`).
   */
  def adaptiveQualityGate(df: DataFrame, strataCol: String, scoreCol: String,
      pctl: Double = 0.25): DataFrame = {
    require(pctl > 0 && pctl < 1, "pctl must be in (0, 1)")
    val th = df.groupBy(col(strataCol))
      .agg(round(expr(s"percentile($scoreCol, $pctl)"), 6).as("threshold"))
    df.join(broadcast(th), Seq(strataCol))
      .filter(round(col(scoreCol), 6) > col("threshold"))
  }

  /**
   * Epoch-factor resampling: replicate or thin each stratum to a target
   * epoch count — epochs(s) = 2.5 keeps ⌊2.5⌋ = 2 copies of every row plus
   * a third with probability 0.5; epochs(s) = 0.5 keeps the row at all with
   * probability 0.5. This is the multi-epoch upsampling step of a training
   * mixture (high-quality sources repeat, bulk crawl thins) expressed as
   * one map-side generator: `explode(sequence(...))` per row, no shuffle,
   * no state. The fractional keep uses [[md5Uniform]], so the exact copy
   * multiset is engine-replayable.
   */
  def epochUpsample(df: DataFrame, idCol: String, strataCol: String,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      seed: String = "epochs"): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(_ >= 0),
      "epoch factors must be >= 0")
    val e = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val n = floor(e).cast(LongType) +
      when(md5Uniform(seed, col(idCol)) < e - floor(e), 1L).otherwise(0L)
    df.withColumn("__n", n)
      .filter(col("__n") > 0)
      .withColumn("copy_ix", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /**
   * Token-budget mixture sampling: downsample each stratum (source/domain/
   * language) so its EXPECTED token count meets a per-stratum budget — the
   * data-mixing step that turns a raw crawl into a training mixture with
   * chosen domain proportions. rate(s) = min(1, budget(s) / Σtokens(s)); a
   * row survives iff md5-uniform(seed, id) < rate(stratum).
   *
   * Shape at 100 TB: per-stratum token totals are ONE partial-aggregated
   * shuffle of O(#strata) rows (strata are domains/languages — small by
   * definition), broadcast-joined back; the keep decision is then pure
   * map-side. Nothing is collected to the driver, and the md5-derived
   * uniform makes the sample reproducible by any engine with md5().
   */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: Column, budgets: Map[String, Long], defaultBudget: Long,
      seed: String = "graft-mix"): DataFrame = {
    // reverse-sorted fold => the when-chain tests keys in sorted order;
    // deterministic plan for any Map iteration order
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget.toDouble)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v.toDouble)).otherwise(acc)
    }
    val rates = df.groupBy(col(strataCol))
      .agg(sum(tokensCol).cast(LongType).as("__sum_tokens"))
      .select(col(strataCol).as("__stratum"),
        least(lit(1.0), budgetCol / col("__sum_tokens").cast(DoubleType)).as("__rate"))
    // null-safe join: a NULL stratum (merged crawls routinely carry
    // source=NULL rows) groups and samples at defaultBudget like any other —
    // an equi-join would silently drop every NULL-stratum row
    df.join(broadcast(rates), col(strataCol) <=> col("__stratum"))
      .filter(md5Uniform(seed, col(idCol)) < col("__rate"))
      .drop("__rate", "__stratum")
  }

  /**
   * Temperature-scaled stratum sampling — the XLM-R / mT5 alpha-sampling
   * rule for multilingual mixtures: a stratum with natural token share p_s
   * is drawn with probability ∝ p_s^alpha (alpha < 1 flattens the
   * distribution toward low-resource strata). Realized as per-row keep
   * rates rate_s = p_s^(alpha-1) / max_t p_t^(alpha-1): proportional to
   * the required q_s/p_s rescaling, normalized so the most up-weighted
   * (smallest) stratum keeps everything and every other stratum
   * down-samples relative to it. alpha = 1 degenerates to "keep all".
   *
   * Shape at 100 TB: identical to [[mixtureSample]] — one O(#strata)
   * partial-aggregated shuffle for the token totals, rates broadcast back,
   * keep decision pure map-side md5-uniform. Rates are rounded to 9
   * decimals so the pow() is engine-replayable (libm last-ulp differences
   * vanish under the rounding; the md5 uniform has ~18 digits).
   */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: Column, alpha: Double,
      seed: String = "graft-temp"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "temperatureSample: alpha in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    val rates = df.groupBy(col(strataCol))
      .agg(sum(tokensCol).cast(LongType).as("__toks"))
      .withColumn("__p",
        col("__toks").cast(DoubleType) / sum(col("__toks")).over(w).cast(DoubleType))
      // zero-token strata: pow(0, alpha-1) is +Infinity, which would poison
      // max(__w) and zero every healthy stratum's rate. Their rows cost no
      // tokens, so the alpha-rescaling limit (share -> 0 => maximal
      // up-weight) says KEEP ALL: rate 1, excluded from the max.
      .withColumn("__w",
        when(col("__toks") > 0, pow(col("__p"), alpha - 1)))
      .withColumn("__rate",
        when(col("__toks") === 0, lit(1.0))
          .otherwise(round(col("__w") / max(col("__w")).over(w), 9)))
      .select(col(strataCol).as("__stratum"), col("__rate"))
    df.join(broadcast(rates), col(strataCol) <=> col("__stratum"))
      .filter(md5Uniform(seed, col(idCol)) < col("__rate"))
      .drop("__rate", "__stratum")
  }

  /**
   * Greedy sequence packing: assign documents to fixed-token-budget training
   * sequences (the pre-tokenization packing step of an LLM data pipeline).
   * Documents are hashed into `nBuckets` independent buckets (md5, so the
   * bucketing is engine-reproducible), ordered by id within a bucket, and
   * packed first-fit-in-order: a document opens a new sequence iff adding it
   * would overflow `budget` (a document longer than the budget gets a
   * sequence of its own). Output: one row per document with its `bucket`,
   * `n_tokens`, and `seq_id` (sequence ordinal within the bucket).
   *
   * Packing is inherently sequential, so the parallelism unit is the bucket:
   * one shuffle on `bucket`, a partition-local sorted sweep (secondary sort —
   * state resets on bucket change, nothing is materialized per group), and
   * `nBuckets` scales with the corpus. Cross-bucket packing loses nothing:
   * waste is bounded by one underfull sequence per bucket.
   */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
      budget: Long, nBuckets: Int, seed: String = "graft-pack"): DataFrame = {
    require(budget > 0, "packSequences budget must be positive")
    require(nBuckets > 0, "packSequences nBuckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(
      col(idCol).cast(LongType).as("doc_id"),
      (conv(substring(md5(concat_ws(":", lit(seed), col(idCol).cast(LongType))), 18, 15),
        16, 10).cast(LongType) % nBuckets).as("bucket"),
      tokensCol.cast(LongType).as("n_tokens"))
    base
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // streaming sweep: a partition holds whole buckets in sorted order,
        // so per-bucket packing state resets on bucket change
        var curBucket = -1L
        var seqId = 0L
        var running = 0L
        var seenAny = false
        it.map { case (docId, bucket, n) =>
          if (!seenAny || bucket != curBucket) {
            curBucket = bucket; seqId = 0L; running = n; seenAny = true
          } else if (running + n > budget) {
            seqId += 1L; running = n
          } else {
            running += n
          }
          (docId, bucket, n, seqId)
        }
      }
      .toDF("doc_id", "bucket", "n_tokens", "seq_id")
  }

  /**
   * Connected components over an undirected pair graph (`id_a`, `id_b`):
   * every vertex gets `cluster_id` = the minimum vertex id in its component.
   * This turns near-dup PAIRS (MinHash/SimHash/LSH output) into duplicate
   * CLUSTERS so a pipeline can keep one canonical doc per cluster — pairwise
   * keep-the-smaller rules drop too much when dups chain (a~b, b~c: keeping
   * min-per-pair would drop both b and c even if a~c is false).
   *
   * Algorithm: iterative min-label propagation — each round every vertex
   * adopts the minimum label among itself and its neighbors (one join + one
   * groupBy shuffle per round), until a fixpoint. Rounds = component
   * diameter, which for dedup graphs is small (dup clusters are dense);
   * `localCheckpoint` truncates the growing plan so round N+1 doesn't
   * re-analyze round N's lineage. For adversarially long path graphs swap in
   * star-contraction (large-star/small-star) — same per-round shape,
   * O(log n) rounds.
   */
  /**
   * `driverSolveMaxEdges`: adaptive small-graph fast path. A near-dup pair
   * graph is usually a vanishing fraction of the corpus (dups are the
   * exception, not the rule), so `take(N+1)` probes the edge set with a
   * BOUNDED collect — if every edge fits, a driver union-find produces the
   * identical (component-min) labeling in one job instead of one
   * join+groupBy round trip per iteration; otherwise nothing was
   * materialized beyond the probe and the distributed rounds run untouched.
   * Pass 0 to force the distributed path (tests do).
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30,
      algorithm: String = "label",
      driverSolveMaxEdges: Int = 100000): DataFrame = {
    // validate up front: an unknown algorithm must fail regardless of whether
    // the small-graph fast path would have made the name moot
    if (algorithm != "label" && algorithm != "star")
      throw new IllegalArgumentException(
        s"unknown connected-components algorithm '$algorithm' (label | star)")
    // persist around the probe: on the large-graph path the probe's partial
    // take would otherwise evaluate the (often expensive — LSH candidate
    // join) edge pipeline once more than the distributed rounds already do.
    // Safe to release in finally: every path below materializes its result
    // (driver collect / eager localCheckpoint) before returning.
    val e = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (driverSolveMaxEdges > 0) {
        val probe = e
          .select(col("id_a").cast(LongType), col("id_b").cast(LongType))
          .take(driverSolveMaxEdges + 1)
        if (probe.length <= driverSolveMaxEdges)
          return driverUnionFind(e.sparkSession,
            probe.map(r => (r.getLong(0), r.getLong(1))))
      }
      algorithm match {
        case "label" => connectedComponentsLabel(e, maxIter)
        case "star" => connectedComponentsStar(e, maxIter)
        case other => throw new IllegalArgumentException(
          s"unknown connected-components algorithm '$other' (label | star)")
      }
    } finally e.unpersist()
  }

  /** Union-find over a collected edge list; output labeling (id -> component
    * minimum) is identical to the distributed algorithms and independent of
    * edge order. */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Long, Long)]): DataFrame = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        parent(x) = parent.getOrElse(p, p) // path halving
        x = parent(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
    }
    // roots are already component minima because unions always point the
    // larger root at the smaller one
    val rows = parent.keys.toArray.sorted.map(v => org.apache.spark.sql.Row(v, find(v)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("cluster_id", LongType, nullable = false))))
  }

  private def connectedComponentsLabel(edges: DataFrame, maxIter: Int): DataFrame = {
    val sym = edges
      .select(col("id_a").cast(LongType).as("src"), col("id_b").cast(LongType).as("dst"))
      .union(edges.select(col("id_b").cast(LongType).as("src"),
        col("id_a").cast(LongType).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("cluster_id")).as("nbr_min"))
      // carry a per-row changed flag so convergence is a cheap scan of the
      // checkpointed result instead of an extra join with the previous round
      val updated = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"),
          least(labels("cluster_id"), coalesce(col("nbr_min"), labels("cluster_id")))
            .as("cluster_id"),
          (coalesce(col("nbr_min"), labels("cluster_id")) < labels("cluster_id"))
            .as("changed"))
        .localCheckpoint(true)
      converged = updated.filter(col("changed")).limit(1).count() == 0L
      labels = updated.select(col("id"), col("cluster_id"))
      iter += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /**
   * Star-contraction connected components (alternating large-star /
   * small-star, Kiveris et al., "Connected Components in MapReduce and
   * Beyond"): converges in O(log n) rounds regardless of component diameter,
   * with the SAME per-round shuffle shape as min-label propagation (one
   * aggregation + one join). The scale path for adversarial chain-shaped
   * components; dense dedup clusters converge in a round or two either way,
   * which is why `label` stays the default.
   *
   *  - large-star: symmetrize; per vertex u with m = min(N(u) ∪ {u}), emit
   *    (v, m) for every neighbor v > u
   *  - small-star: on smaller-pointing edges, per u with smaller neighbors S
   *    and m = min(S ∪ {u}), emit (v, m) for v ∈ S ∪ {u}, v ≠ m
   *
   * At the fixpoint every component is a star centered on its minimum vertex.
   */
  private def connectedComponentsStar(edges: DataFrame, maxIter: Int): DataFrame = {
    val spark = edges.sparkSession
    // canonical big->small direction; self-loops dropped
    var e = edges
      .select(
        greatest(col("id_a").cast(LongType), col("id_b").cast(LongType)).as("u"),
        least(col("id_a").cast(LongType), col("id_b").cast(LongType)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    // vertex universe: output must cover every vertex in the input pair graph
    val vertices = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .distinct().localCheckpoint(true)

    def checksum(df: DataFrame): (Long, Long) = {
      // xor-fold never overflows (sum would, under ANSI); order-insensitive
      val r = df.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var prev = checksum(e)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star: m over ALL neighbors (symmetrized) and self
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val afterLarge = sym.filter(col("v") > col("u"))
        .join(lsMin, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star: edges already point big->small
      val ssMin = afterLarge.groupBy(col("u")).agg(min(col("v")).as("m"))
      val afterSmall = afterLarge.join(ssMin, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)
      val cur = checksum(afterSmall)
      converged = cur == prev
      prev = cur
      e = afterSmall
      iter += 1
    }
    require(converged, s"connectedComponentsStar did not converge in $maxIter rounds")
    // fixpoint: e = (node, componentMin) for every non-root node
    vertices.join(e, vertices("id") === e("u"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("cluster_id"))
  }
}
