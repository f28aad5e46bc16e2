package graft.index

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable
import graft.functions.{Sbq, VectorKernels}
import graft.functions.Sbq.SbqModel

/** Build/search parameters (defaults = reference defaults, BASELINE.md). */
case class DiskannParams(
    metric: String = "cosine",
    numNeighbors: Int = 50, // R
    searchListSize: Int = 100, // L (build)
    maxAlpha: Double = 1.2,
    bitsPerDim: Option[Int] = None,
    storage: String = "sbq", // "sbq" | "plain"
    /** Matryoshka truncation (SURVEY.md §4.1): build the graph + codes on a
      * prefix slice of the vector; rescoring always uses full vectors. */
    numDimsToIndex: Option[Int] = None,
    /** target rows per shard; shard graphs must fit executor heap. At 100 TB
      * this yields thousands of independent shards built in parallel. */
    shardTargetRows: Long = 1L << 20,
    /** "hash": shards are random; every query searches every shard (recall ==
      * single-graph recall, cost O(numShards) per query). "ivf": shard =
      * nearest of numShards k-means centroids; queries may then probe only
      * the `nProbe` nearest shards — the scale path that keeps per-query cost
      * O(nProbe) when numShards is in the thousands. */
    partitioner: String = "hash",
    /** When set (with partitioner="ivf"), centroids are md5-rank-picked rows
      * ([[graft.operators.Similarity.trainIvfDeterministic]]) instead of
      * k-means: weaker coarse quantization, but the shard assignment and
      * probe choice become exactly recomputable by an external SQL engine,
      * so even PRUNED (approximate) routed results can be hash-verified. */
    ivfSeed: Option[String] = None)

/**
 * Sharded StreamingDiskANN-style index as Spark jobs (SURVEY.md §3.1 build
 * plan, §2.5 G8 replacement).
 *
 * Build dataflow: job 1 trains the SBQ quantizer (one-pass distributed
 * Welford); job 2 hash-shards rows by id and builds an independent Vamana
 * sub-graph per shard inside `mapPartitions` (no shared state — the
 * DSM/condvar coordination of the reference's parallel build is replaced by
 * Spark partitioning); the nodes table is written as Parquet partitioned by
 * shard, plus a 1-row `_meta` Parquet sidecar (replaces the versioned meta
 * page, meta_page.rs:179-210).
 *
 * Serving: each shard is searched independently (quantized traversal + exact
 * rescore) and per-shard top-k results are merged with a final window — the
 * classic partial/final top-k, which is Spark's native TakeOrdered shape.
 * Searching all shards and unioning is an over-approximation of single-graph
 * search, so recall is ≥ the per-shard recall.
 */
object DiskannIndex {

  private val nodeSchema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("node", IntegerType, nullable = false),
    StructField("row_id", LongType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("code", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("labels", ArrayType(ShortType, containsNull = false), nullable = true),
    StructField("neighbors", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** Build-time option validation — parity with the reference's hard errors
    * (build.rs:264-292, meta_page.rs:325-337): an invalid configuration must
    * fail the build up front, never silently produce a different-quality
    * index. */
  private[graft] def validateBuildOptions(params: DiskannParams, metric: Metric,
      hasLabels: Boolean, dimsToIndex: Int): Unit = {
    require(params.storage == "sbq" || params.storage == "plain",
      s"unknown storage type '${params.storage}' (expected sbq | plain)")
    if (metric == Metric.InnerProduct && params.storage == "plain")
      throw new IllegalArgumentException( // build.rs:264-266
        "Inner product distance type is not supported with plain storage")
    if (hasLabels && params.storage == "plain")
      throw new IllegalArgumentException( // build.rs:285-287
        "Labeled filtering is not supported with plain storage")
    if (dimsToIndex <= 0) // build.rs:272-274 (covers the empty-input build)
      throw new IllegalArgumentException("No dimensions to index")
    if (dimsToIndex > graft.sources.EmbeddingSources.MaxDims)
      throw new IllegalArgumentException( // build.rs:276-278
        s"Too many dimensions to index (max is ${graft.sources.EmbeddingSources.MaxDims})")
    if (params.storage == "plain" &&
        dimsToIndex > graft.sources.EmbeddingSources.MaxDimsPlain)
      throw new IllegalArgumentException( // build.rs:280-284
        "Too many dimensions to index with plain storage (max is " +
          s"${graft.sources.EmbeddingSources.MaxDimsPlain}); use storage=sbq instead")
    params.bitsPerDim.foreach { b =>
      require(b == 1 || b == 2, s"bitsPerDim must be 1 or 2, got $b")
      if (b > 1 && dimsToIndex > 930)
        throw new IllegalArgumentException( // meta_page.rs:325-328
          "SBQ with more than 1 bit per dimension is not supported for more than 930 dimensions")
      if (b > 1 && params.storage != "sbq")
        throw new IllegalArgumentException( // meta_page.rs:329-334
          "SBQ with more than 1 bit per dimension requires sbq storage")
    }
  }

  /** Build phases, mirroring `ambuildphasename` (build.rs:1154-1167). Each
    * Spark job launched by [[build]] runs inside a job group named
    * `"<PhasePrefix><phase> [<path>]"`, so progress is observable from any
    * SparkListener / the Spark UI — the AM progress-reporting analog (G10). */
  val PhasePrefix = "graft diskann build: "
  val PhaseTraining = "training quantizer"
  val PhaseBuilding = "building graph"
  val PhaseFinalizing = "finalizing graph"

  private def inPhase[T](spark: SparkSession, phase: String, path: String)(f: => T): T = {
    val sc = spark.sparkContext
    sc.setJobGroup(s"$PhasePrefix$phase", s"$PhasePrefix$phase [$path]",
      interruptOnCancel = false)
    try f finally sc.clearJobGroup()
  }

  def build(df: DataFrame, idCol: String, vecCol: String, labelsCol: Option[String],
      path: String, params: DiskannParams = DiskannParams()): Unit =
    // the whole build holds the path's writer lease: an in-place rebuild
    // racing a concurrent append/compact on the same artifact would
    // otherwise interleave the scrub below with their generation installs
    // (build from compact targets a fresh tmp dir — its lease is trivially
    // uncontended, no deadlock with the compact's own lock)
    try WriterLock.withLease(spark = df.sparkSession, path = path) {
      buildLeased(df, idCol, vecCol, labelsCol, path, params)
    } catch {
      case e: Throwable =>
        // a rejected/failed FIRST build must not leave an empty artifact
        // dir behind (the lease file's parent-mkdir creates it) — "nothing
        // was written" stays literally true for validation rejections
        try {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(
            df.sparkSession.sessionState.newHadoopConf())
          if (fs.exists(p) && fs.listStatus(p).isEmpty) fs.delete(p, false)
        } catch { case _: Throwable => () }
        throw e
    }

  private def buildLeased(df: DataFrame, idCol: String, vecCol: String,
      labelsCol: Option[String], path: String, params: DiskannParams): Unit = {
    val spark = df.sparkSession
    val metric = Metric(params.metric)

    // NULL vectors are never indexed (build.rs:493-498)
    val base0 = df.select(
      col(idCol).cast(LongType).as("row_id"),
      col(vecCol).as("vec"),
      labelsCol.map(c => col(c).cast(ArrayType(ShortType)))
        .getOrElse(lit(null).cast(ArrayType(ShortType))).as("labels"))
      .filter(col("vec").isNotNull)

    // validate options against the indexed width: the declared Matryoshka
    // slice, or (one cheap limit-1 job) the width of the first stored vector
    val checkedDims = params.numDimsToIndex.getOrElse(
      inPhase(spark, PhaseTraining, path) {
        base0.select(size(col("vec")).as("d")).head(1).headOption
          .map(_.getInt(0)).getOrElse(0)
      })
    validateBuildOptions(params, metric, labelsCol.isDefined, checkedDims)

    // a rebuild REPLACES the artifact (the TextIndex/Dedup builder rule):
    // stale `versions/` generations WIN root resolution over the flat
    // nodes/_meta this build writes, so leaving them would serve the OLD
    // index after a "successful" rebuild; stale tombstones/delta from the
    // previous life must not leak into the new one either. Compaction is
    // unaffected — it builds into a fresh tmp dir that has none of these.
    //
    // The scrub ORDER is the crash contract: an in-place rebuild is
    // deliberately NOT atomic (CREATE INDEX semantics — a failed CREATE
    // leaves no index; atomic replacement is what REINDEX/compact's
    // tmp+install path is for), so a mid-rebuild crash must fail LOUD, not
    // serve stale state. Deleting versions/ and then the flat `_meta`
    // FIRST makes every reader's loadMeta throw until the new `_meta`
    // lands at the very end of the build — the failure mode is "no index
    // here", never "old index serving without its tombstones" (silent
    // resurrection of deleted rows). The scrub itself runs only when any
    // of the stale state exists, so plain first builds skip the extra IO.
    {
      val p0 = new org.apache.hadoop.fs.Path(path)
      val fs0 = p0.getFileSystem(spark.sessionState.newHadoopConf())
      val stale = Seq("versions", "tombstones", "delta", "_meta", "labelstats")
        .map(d => new org.apache.hadoop.fs.Path(s"$path/$d"))
        .filter(fs0.exists)
      stale.foreach(d => fs0.delete(d, true))
      // version numbering restarts; cached per-root state (tier manifests,
      // label counts) keyed on recreated root strings must not survive
      TierManifest.invalidateUnder(path)
      labelCountsCache.synchronized {
        val it = labelCountsCache.keySet().iterator()
        while (it.hasNext) if (it.next().startsWith(path)) it.remove()
      }
    }

    // cosine: the graph/quantizer operate on normalized vectors
    // (preprocess_cosine, pg_vector.rs:153-155) but the nodes table stores
    // the RAW vectors — rescoring and SQL-visible distances are computed on
    // the original data, exactly like the reference's heap fetch (S5).
    graft.functions.VectorFunctions.register(spark)
    val dimsToIndex = params.numDimsToIndex.getOrElse(0) // 0 = full width
    val slicedBase = if (dimsToIndex > 0)
      base0.withColumn("vec", slice(col("vec"), 1, dimsToIndex))
    else base0
    val trainBase = if (metric == Metric.Cosine)
      slicedBase.withColumn("vec", graft.functions.VectorFunctions.vec_normalize(col("vec")))
    else slicedBase
    val base = base0

    val useSbq = params.storage == "sbq"
    val model: SbqModel = if (useSbq)
      inPhase(spark, PhaseTraining, path) { Sbq.train(trainBase, "vec", params.bitsPerDim) }
    else null
    val modelBc = spark.sparkContext.broadcast(model)

    val n = model match {
      case null => inPhase(spark, PhaseTraining, path) { base.count() }
      case m => m.count
    }
    val numShards = math.max(1, math.ceil(n.toDouble / params.shardTargetRows).toInt)
    val hasLabels = labelsCol.isDefined
    val r = params.numNeighbors
    val l = params.searchListSize
    val alpha = params.maxAlpha

    def toBuildSpace(v: Array[Float]): Array[Float] =
      BuildSpace(v, dimsToIndex, metric)

    val ivfModel: graft.operators.Similarity.IvfModel =
      if (params.partitioner == "ivf") inPhase(spark, PhaseTraining, path) {
        params.ivfSeed match {
          case Some(seed) => graft.operators.Similarity.trainIvfDeterministic(
            trainBase, "row_id", "vec", numShards, seed)
          case None => graft.operators.Similarity.trainIvf(trainBase, "vec",
            numShards, sampleSize = math.min(numShards * 256, 1 << 16))
        }
      }
      else null
    val sharded = if (ivfModel != null) {
      val mBc = spark.sparkContext.broadcast(ivfModel)
      val assign = udf((v: mutable.Seq[Float]) =>
        mBc.value.nearest(toBuildSpace(v.toArray), 1)(0))
      base.withColumn("shard", assign(col("vec"))).repartition(numShards, col("shard"))
    } else base
      .withColumn("shard", pmod(xxhash64(col("row_id")), lit(numShards)).cast(IntegerType))
      .repartition(numShards, col("shard"))

    val nodes = buildShardNodes(sharded, metric, modelBc, hasLabels,
      dimsToIndex, r, l, alpha)

    inPhase(spark, PhaseBuilding, path) {
      nodes.write.mode("overwrite").partitionBy("shard").parquet(s"$path/nodes")
    }

    // per-label node counts (the reference's contsel selectivity input,
    // mod.rs:243-256): one tiny (label, cnt) parquet per generation. Readers
    // treat it as OPTIONAL (older generations lack it), so this is an
    // additive layout change — the residual over-fetch loop uses it to
    // bound a labeled query's reachable population. Counted from the nodes
    // table JUST WRITTEN (a labels-column-pruned scan of local parquet),
    // never by re-evaluating `base` — the caller's lineage can be an
    // arbitrary corpus-sized pipeline (compact passes a join+union over
    // everything), and re-running it for a count would double build IO.
    // explicit schema on every read of the just-written nodes dir: a full
    // rebuild to ZERO rows (vacuum-everything REINDEX) writes no part
    // files, and schema inference would abort the build here — leaving the
    // index permanently un-vacuumable
    if (hasLabels)
      spark.read.schema(nodeSchema).parquet(s"$path/nodes")
        .select(explode(col("labels")).as("label"))
        .groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/labelstats")

    // per-shard cluster radii (IVF only): max build-space Euclidean distance
    // from a member to its centroid, from ONE column-pruned pass over the
    // nodes table just written — the sound input to radius shard pruning
    // ([[radiusShardsFor]]). Hash shards are random, their "radius" covers
    // the space, so nothing is stored (empty = pruning off).
    val shardRadii: Array[Double] =
      if (ivfModel == null) Array.emptyDoubleArray
      else {
        val cBc = spark.sparkContext.broadcast(ivfModel.centroids)
        val radiiMap = spark.read.schema(nodeSchema).parquet(s"$path/nodes")
          .select(col("shard"), col("vec")).rdd.map { row =>
            val s = row.getInt(0)
            val bv = toBuildSpace(row.getAs[mutable.Seq[Float]](1).toArray)
            (s, math.sqrt(VectorKernels.l2sq(bv, cBc.value(s))))
          }.reduceByKey(math.max).collectAsMap()
        Array.tabulate(numShards)(s => radiiMap.getOrElse(s, 0.0))
      }

    // per-shard exact row counts (round 11): one tiny column-pruned
    // aggregate over the nodes table just written — makes shard emptiness
    // decidable from the meta alone (see IndexMeta.shardRows)
    val shardRowCounts: Array[Long] = {
      val m = spark.read.schema(nodeSchema).parquet(s"$path/nodes")
        .groupBy(col("shard")).agg(count(lit(1)).as("c")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      Array.tabulate(numShards)(s => m.getOrElse(s, 0L))
    }

    // meta sidecar as a 1-row parquet (no JSON dependency, schema-checked).
    // buildId is a fresh epoch per (re)build and shardBuildIds one epoch PER
    // SHARD: executor caches key on (index path, shard, shard epoch), so a
    // rebuild naturally misses every executor's cache for the rebuilt
    // shards — and incremental compaction, which copies untouched shards
    // verbatim, KEEPS their epochs, so their warm decoded graphs survive
    // the generation change (no driver-to-executor invalidation broadcast;
    // the analog of the reference bumping the meta page version).
    import spark.implicits._
    val genId = java.util.UUID.randomUUID().toString
    inPhase(spark, PhaseFinalizing, path) {
      Seq(IndexMeta(params.metric, params.storage, r, l, alpha, numShards, n,
        hasLabels,
        if (model != null) model.bitsPerDim else 0,
        if (model != null) model.count else 0L,
        if (model != null) model.mean else Array.emptyDoubleArray,
        if (model != null) model.m2 else Array.emptyDoubleArray, dimsToIndex,
        params.partitioner,
        if (ivfModel != null) ivfModel.centroids else Array.empty[Array[Float]],
        params.shardTargetRows, genId,
        Array.fill(numShards)(genId), Array.fill(numShards)(""), shardRadii,
        shardRowCounts, n))
        .toDF().coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
    }
    GraphSearcher.invalidate(path)
    // a full rebuild at the same path changes numRows arbitrarily — the
    // planner's cost-gate cache must re-read it (compact/drop already do)
    graft.plans.KnnCost.invalidate(path)
  }

  /** Per-shard Vamana graph build over a (row_id, vec, labels, shard)
    * DataFrame already repartitioned by shard — the compute kernel shared by
    * [[build]] and the incremental compaction's partial rebuild
    * ([[rebuildShardsInto]]). A task may receive >1 shard (hash collisions
    * across shard keys); shards group locally and build independently. */
  private def buildShardNodes(sharded: DataFrame, metric: Metric,
      modelBc: org.apache.spark.broadcast.Broadcast[SbqModel],
      hasLabels: Boolean, dimsToIndex: Int,
      r: Int, l: Int, alpha: Double): DataFrame =
    sharded.mapPartitions { it =>
      val byShard = mutable.Map.empty[Int, mutable.ArrayBuffer[(Long, Array[Float], Array[Short])]]
      it.foreach { row =>
        val shard = row.getAs[Int]("shard")
        val vec = row.getAs[mutable.Seq[Float]]("vec").toArray
        val lbs = row.getAs[mutable.Seq[Short]]("labels") match {
          case null => null
          case s => LabelSets.normalize(s.toArray)
        }
        byShard.getOrElseUpdate(shard, new mutable.ArrayBuffer) +=
          ((row.getAs[Long]("row_id"), vec, lbs))
      }
      val m = modelBc.value
      byShard.iterator.flatMap { case (shard, rowsBuf) =>
        // deterministic insert order: ascending row_id (start-node election
        // and tie-breaks reproducible across runs — SURVEY.md §7.3)
        val rows = rowsBuf.sortInPlaceBy(_._1)
        val vecs = rows.map(_._2).toArray
        val sliced = if (dimsToIndex > 0) vecs.map(_.take(dimsToIndex)) else vecs
        val buildVecs =
          if (metric == Metric.Cosine) sliced.map(graft.functions.VectorKernels.normalize)
          else sliced
        val lbs = if (hasLabels) rows.map(t => Option(t._3).getOrElse(Array.emptyShortArray)).toArray else null
        // SBQ build runs in Hamming space over the codes (D8/D9 parity): the
        // graph must be navigable under the metric the serving traversal
        // actually uses, not the full-precision one.
        val shardCodes = if (m != null) buildVecs.map(m.quantize) else null
        val builder = new VamanaBuilder(buildVecs, lbs, metric, r, l, alpha,
          shardCodes).build()
        rows.indices.iterator.map { i =>
          Row(shard, i, rows(i)._1, vecs(i),
            if (shardCodes != null) shardCodes(i) else null,
            if (lbs != null) lbs(i) else null,
            builder.neighborsOf(i))
        }
      }
    }(org.apache.spark.sql.Encoders.row(nodeSchema))

  case class IndexMeta(metric: String, storage: String, numNeighbors: Int,
      searchListSize: Int, maxAlpha: Double, numShards: Int, numRows: Long,
      hasLabels: Boolean, bitsPerDim: Int, modelCount: Long,
      modelMean: Array[Double], modelM2: Array[Double], dimsToIndex: Int,
      partitioner: String, centroids: Array[Array[Float]],
      shardTargetRows: Long, buildId: String,
      /** per-shard cache epoch: fresh UUID when a shard's graph is
        * (re)built, PRESERVED when incremental compaction carries the shard
        * forward unchanged — executor caches stay warm across generations
        * for untouched shards */
      shardBuildIds: Array[String],
      /** per-shard data MANIFEST (the Iceberg-style metadata-only commit):
        * where shard s's parquet files physically live. "" = this
        * generation's own `nodes/shard=s`; "." = the flat (pre-versioning)
        * index root; "versions/v%09d" = the generation that last REBUILT the
        * shard, relative to the index path. Incremental compaction installs
        * a new generation by writing only the rebuilt shards and pointing
        * the rest here — no copy of the untouched 100 TB ever happens. */
      shardDirs: Array[String],
      /** per-shard cluster radius (IVF only; empty = unknown): max EUCLIDEAN
        * distance in BUILD SPACE from a member to its centroid. Upper bound
        * maintained across compactions (delta grows it, tombstones only
        * tighten the true value), which makes [[radiusShardsFor]]'s triangle
        * inequality SOUND: a shard with d(q, c_s) - radius_s > r cannot hold
        * any row within r of q. */
      shardRadii: Array[Double] = Array.emptyDoubleArray,
      /** per-shard EXACT row count (round 11; empty = unknown, pre-round-11
        * generations). Makes shard emptiness decidable from the meta alone
        * — a tombstone wipe can rebuild a shard to zero rows, whose missing
        * partition dir is otherwise indistinguishable from a GC'd one
        * (deciding "empty" from the filesystem under a racing GC can
        * silently truncate results). Maintained exactly across incremental
        * compactions from the fold arithmetic; unknown (legacy) metas are
        * backfilled at their first incremental compact. */
      shardRows: Array[Long] = Array.emptyLongArray,
      /** row count at the last FULL build (round 12; 0 = unknown, pre-
        * round-12 generations). A full build trains the SBQ quantizer and
        * elects the IVF centroids from exactly these rows; incremental
        * folds grow numRows but carry this (and the frozen models)
        * unchanged — so `(numRows - fullBuildRows) / fullBuildRows` is the
        * model-staleness fraction [[graft.streaming.StreamingIngest
        * .maybeCompact]] uses to escalate a fold into an automatic REINDEX.
        * The reference never retrains (aminsert freezes the quantizer
        * forever, build.rs:464-535); at 100 TB streaming that is a
        * measured recall leak (StreamingSpec endurance gate), hence the
        * trigger. */
      fullBuildRows: Long = 0L) {
    /** The params this index was built with (minus the SBQ auto-default
      * already resolved into bitsPerDim) — compaction/rebuild starts here so
      * storage type, quantization width and graph shape survive. */
    def toParams: DiskannParams = DiskannParams(
      metric = metric,
      numNeighbors = numNeighbors,
      searchListSize = searchListSize,
      maxAlpha = maxAlpha,
      bitsPerDim = if (storage == "sbq" && bitsPerDim > 0) Some(bitsPerDim) else None,
      storage = storage,
      numDimsToIndex = if (dimsToIndex > 0) Some(dimsToIndex) else None,
      shardTargetRows = shardTargetRows,
      partitioner = partitioner)
  }

  /**
   * Resolve the ACTIVE root of an index. Fresh builds use the flat layout
   * (`path/nodes` + `path/_meta`); compaction installs rebuilt generations as
   * `path/versions/v%09d` and the highest version wins. A version directory
   * only ever appears via one atomic `FileSystem.rename` of a fully-written
   * build (the object-store-safe replacement for the old local-only
   * backup-and-rename swap), so this listing can never observe a torn index,
   * and readers that resolved the previous version keep a complete directory
   * — compaction preserves one prior generation as a grace window.
   */
  def resolveRoot(spark: SparkSession, path: String): String = {
    val vdir = new org.apache.hadoop.fs.Path(path, "versions")
    val fs = vdir.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      val vs = fs.listStatus(vdir).map(_.getPath.getName).filter(_.matches("v\\d{9}"))
      if (vs.isEmpty) path else s"$path/versions/${vs.max}"
    } catch { case _: java.io.FileNotFoundException => path }
  }

  /**
   * Installed generations of a versioned index, oldest first (empty for a
   * never-compacted flat index). Each entry is a full index root — pass
   * `s"$path/versions/$v"` to [[search]]/[[loadMeta]] to TIME-TRAVEL to
   * that generation: compaction keeps the superseded generation on disk as
   * the in-flight-reader grace window, so the previous snapshot stays
   * queryable until the next compaction prunes it.
   */
  def listVersions(spark: SparkSession, path: String): Seq[String] = {
    val vdir = new org.apache.hadoop.fs.Path(path, "versions")
    val fs = vdir.getFileSystem(spark.sessionState.newHadoopConf())
    try fs.listStatus(vdir).map(_.getPath.getName)
      .filter(_.matches("v\\d{9}")).sorted.toSeq
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  private val GenDirRe = "^(.*)/versions/v\\d{9}$".r

  /** The index path that owns generation root `genRoot` (identity for a
    * flat, never-compacted index). Manifest entries are relative to THIS, so
    * resolution works the same whether the caller passed the index path or
    * time-traveled directly to a `versions/v%09d` dir. */
  private[graft] def indexRootOf(genRoot: String): String = genRoot match {
    case GenDirRe(p) => p
    case _ => genRoot
  }

  /** `genRoot` as a manifest entry: "." for the flat index root, else the
    * "versions/v%09d" suffix. */
  private[graft] def relGenOf(genRoot: String): String = genRoot match {
    case GenDirRe(_) => genRoot.substring(indexRootOf(genRoot).length + 1)
    case _ => "."
  }

  /** Physical generation root holding shard `s`'s data per `meta`'s
    * manifest, for an index whose ACTIVE root is `root`. */
  private[graft] def shardGenRoot(root: String, meta: IndexMeta, s: Int): String =
    meta.shardDirs(s) match {
      case "" => root
      case "." => indexRootOf(root)
      case rel => s"${indexRootOf(root)}/$rel"
    }

  /**
   * Session-local memo of the resolved per-generation nodes scan, keyed on
   * the nodes directory's mtime (the [[ParquetMetaCache]] discipline): a
   * generation's `nodes/` is WRITE-ONCE (appends land under `delta/`,
   * deletes under `tombstones/`, compaction installs a NEW root), yet every
   * `spark.read.parquet` builds a fresh file index — at production shard
   * counts that is a full parallel leaf-file LISTING of every shard
   * directory on EVERY serving query (measured: a 485 ms 317-path listing
   * job per execution on the 500-shard fixture — the single largest cost
   * of the warm many-shards serve). Reusing the resolved DataFrame reuses
   * its InMemoryFileIndex, so warm serves skip the listing entirely; an
   * in-place rebuild recreates the directory and bumps its mtime, which
   * invalidates naturally. Metadata memoization only — no rows are cached.
   */
  // round-16 hardening (ADVICE): (a) the validity token is the generation's
  // BUILD ID, not the nodes dir's mtime — a UUID minted per (re)build, so a
  // same-second in-place rebuild invalidates exactly, and object stores
  // whose directory mtimes are 0 / don't track children (S3A) can never
  // alias two generations; (b) the session key is applicationId (unique per
  // context — identityHashCode can be reused after a GC'd session and would
  // serve a DataFrame bound to a dead context); (c) bounded access-order
  // LRU — compaction installs a new root per swap, so an unbounded map
  // retains one resolved file index per DEAD generation for the JVM's life.
  private val nodesDfCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (String, DataFrame)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, DataFrame)]): Boolean =
        size() > 64
    })
  private def nodesBaseDf(spark: SparkSession, base: String,
      genFp: String): DataFrame = {
    val dirStr = s"$base/nodes"
    // a DataFrame is bound to its context: key per applicationId so a fresh
    // session (tests stop/start many) never serves a stale plan
    val key = s"${spark.sparkContext.applicationId}#$dirStr"
    val hit = nodesDfCache.get(key)
    if (hit != null && hit._1 == genFp) hit._2
    else {
      val df = spark.read.schema(nodeSchema).parquet(dirStr)
      nodesDfCache.put(key, (genFp, df))
      df
    }
  }

  /**
   * Manifest-aware nodes scan: the rows of exactly `shards`, with the
   * `shard` partition column, wherever each shard's files physically live.
   * One pruned whole-dir scan per distinct REFERENCED generation (almost
   * always 1–2), unioned — never a file copy, and stale same-numbered shard
   * dirs in old generations (superseded by a later rebuild) are excluded by
   * the per-base pruning filter. Falls back to the plain single-dir read
   * when the manifest references nothing (fresh build / full rebuild).
   */
  private[graft] def nodesDf(spark: SparkSession, root: String,
      meta: IndexMeta, shards: Seq[Int]): DataFrame = {
    // empty shard list (e.g. an empty query batch routed nowhere): empty
    // result with the nodes schema — resolve through ALL shards so the
    // schema read works even when this generation's own nodes dir holds no
    // files (manifest-era generations materialize only rebuilt shards)
    if (shards.isEmpty)
      return nodesDf(spark, root, meta, 0 until meta.numShards)
        .filter(lit(false))
    val all = shards == (0 until meta.numShards)
    // EXPLICIT schema, not inference: a generation whose only affected
    // shard rebuilt to ZERO rows (a tombstone wipe of a whole shard) has a
    // nodes dir with no part files at all — inference throws
    // UNABLE_TO_INFER_SCHEMA and every read of the generation dies. With
    // the declared schema an empty dir is just an empty scan (and every
    // non-empty read skips the footer-sampling inference job too). The
    // `shard` field doubles as the partition-dir column; `code`/`labels`
    // are nullable, so files from generations that predate a column read
    // back as nulls.
    if (meta.shardDirs.forall(_.isEmpty)) {
      val df = nodesBaseDf(spark, root, meta.buildId)
      if (all) df
      else df.filter(col("shard").isin(shards.map(Integer.valueOf): _*))
    } else {
      shards.groupBy(s => shardGenRoot(root, meta, s)).toSeq.sortBy(_._1)
        .map { case (base, ss) =>
          // a referenced base generation's nodes are identified by ITS OWN
          // buildId (loadMetaAt is memoized on the _meta listing, so this
          // is one cheap LIST, not a Spark job) — meta.buildId would be the
          // CURRENT generation's id and miss an in-place rewrite of the base
          val baseFp =
            if (base == root) meta.buildId
            else loadMetaAt(spark, base).buildId
          nodesBaseDf(spark, base, baseFp)
            .filter(col("shard").isin(ss.map(Integer.valueOf): _*))
        }
        .reduce(_ unionByName _)
    }
  }

  /**
   * Incremental compaction — the LSM-style answer to "aminsert updates the
   * live graph in place": every delta row routes to exactly one shard
   * (nearest frozen centroid for ivf, pmod(xxhash64(row_id)) for hash), so
   * only shards that RECEIVE delta rows or LOSE tombstoned rows get graph
   * work. Writes a complete new index root at `dstPath`:
   *
   *  - DELTA-ONLY shards take the LIVE-INSERT fold ([[insertFoldNodes]]):
   *    the frozen shard graph is seeded verbatim and only the appended rows
   *    are inserted (the reference's aminsert / Graph::insert,
   *    build.rs:464-557, per shard) — O(inserted · search) graph work,
   *    never O(shard);
   *  - shards losing TOMBSTONED rows rebuild from (surviving ∪ delta) rows
   *    (removal shifts node indices, invalidating stored edges) — always
   *    with the FROZEN quantizer and centroids from `meta`, since
   *    retraining would silently invalidate the codes and routing of every
   *    untouched shard;
   *  - every untouched shard is carried as a MANIFEST reference (shardDirs)
   *    with its cache epoch preserved — a metadata-only commit, no copy of
   *    the untouched corpus;
   *  - a fresh `_meta` (updated numRows, new buildId) finalizes the root.
   *
   * Growth gate: an affected shard growing past
   * `graft.compact.maxShardGrowth` (default 2.0) × shardTargetRows would
   * eventually OOM its in-heap build (frozen centroids mean a hot-spot
   * centroid's shard grows without bound across compactions). An IVF index
   * answers that with a HOT-SHARD SPLIT (round 11): the one overgrown
   * shard re-clusters its own members into ceil(total/target) fresh
   * sub-centroids and rebuilds as that many sub-shards — O(hot shard)
   * work, so a persistently skewed append stream keeps compaction
   * O(ingest window) forever instead of paying an O(corpus) re-shard at
   * every fold (`graft.compact.shardSplit=false` restores the refusal).
   * A HASH index returns None REFUSING the partial rebuild — hash routing
   * bakes numShards into every row's placement, so one shard cannot split;
   * the caller answers the refusal with the FULL rebuild, which re-shards
   * (and, for ivf, re-trains centroids).
   *
   * Returns (new row count, shard ids needing cache invalidation) on
   * success.
   */
  private[graft] def rebuildShardsInto(spark: SparkSession, srcRoot: String,
      meta: IndexMeta, delta: DataFrame, tombstones: Set[Long],
      dstPath: String): Option[(Long, Seq[Int])] = {
    import org.apache.spark.sql.functions.broadcast
    val metric = Metric(meta.metric)
    val model =
      if (meta.storage == "sbq")
        SbqModel(meta.modelCount, meta.modelMean, meta.modelM2, meta.bitsPerDim)
      else null
    val modelBc = spark.sparkContext.broadcast(model)
    val dimsToIndex = meta.dimsToIndex
    // delta rows route to exactly one shard by the SAME rule the build
    // used: nearest frozen centroid (ivf) or pmod(xxhash64(row_id)) (hash)
    val routeCol: org.apache.spark.sql.Column =
      if (meta.partitioner == "ivf") {
        val ivfBc = spark.sparkContext.broadcast(
          graft.operators.Similarity.IvfModel(meta.centroids))
        val assign = udf((v: mutable.Seq[Float]) =>
          ivfBc.value.nearest(BuildSpace(v.toArray, dimsToIndex, metric), 1)(0))
        assign(col("vec"))
      } else
        pmod(xxhash64(col("row_id")), lit(meta.numShards)).cast(IntegerType)
    val tombDf = spark.createDataset(tombstones.toSeq)(
      org.apache.spark.sql.Encoders.scalaLong).toDF("row_id")
    // tombstones apply to the DELTA too: a row appended and then deleted
    // before compaction must not be resurrected into the new generation
    // (parity with the full-rebuild path and searchWithDelta)
    val deltaAssigned0 = delta
      .filter(col("vec").isNotNull)
      .select(col("row_id").cast(LongType), col("vec"),
        col("labels").cast(ArrayType(ShortType)).as("labels"))
      // at-least-once ingest: a retried micro-batch appends the same row
      // twice — collapse by row_id before any counting or graph work
      // (shuffles only the small delta), or the duplicate bakes into the
      // graph and can occupy multiple top-k slots
      .dropDuplicates("row_id")
      .transform(d => if (tombstones.isEmpty) d
        else d.join(broadcast(tombDf), Seq("row_id"), "left_anti"))
      .withColumn("shard", routeCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val existing = nodesDf(spark, srcRoot, meta, 0 until meta.numShards)
      // crash-window re-fold defense: a predecessor that INSTALLED its
      // generation but crashed before deleting the consumed delta files
      // leaves rows in BOTH main and delta. Keep the MAIN copy — its shard
      // then needs no graph work at all — and drop the delta copy. The
      // probe is a column-pruned (row_id-only) scan of the nodes table
      // against the broadcast delta ids; localCheckpoint materializes the
      // (≤ delta-sized) hit list so downstream replays never re-scan.
      val dupIds = existing.select(col("row_id"))
        .join(broadcast(deltaAssigned0.select(col("row_id"))), Seq("row_id"))
        .localCheckpoint(true)
      val deltaAssigned =
        if (dupIds.isEmpty) deltaAssigned0
        else deltaAssigned0.join(broadcast(dupIds), Seq("row_id"), "left_anti")
      // ONE small aggregate per input computes everything the bookkeeping
      // needs: per-shard delta counts, per-shard tombstone hits, per-shard
      // existing sizes of the affected shards
      def countsByShard(df: DataFrame): Map[Int, Long] =
        df.groupBy(col("shard")).agg(count(lit(1)).as("c"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val deltaByShard = countsByShard(deltaAssigned)
      val tombByShard: Map[Int, Long] =
        if (tombstones.isEmpty) Map.empty
        else countsByShard(existing.join(broadcast(tombDf), Seq("row_id")))
      val affected = (deltaByShard.keySet ++ tombByShard.keySet).toSeq.sorted
      val deltaCount = deltaByShard.valuesIterator.sum
      val tombCount = tombByShard.valuesIterator.sum
      val newRows = meta.numRows - tombCount + deltaCount

      val fs = new org.apache.hadoop.fs.Path(dstPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      // HOT-SHARD SPLIT plan (IVF only): a frozen-centroid hot spot that
      // would overgrow a shard past the heap-sizing invariant no longer
      // forces the O(corpus) full rebuild — the one hot shard SPLITS into
      // ceil(total/target) sub-shards (local k-means over its own members),
      // keeping the compaction O(ingest window) even under a persistently
      // skewed append stream. Hash routing bakes numShards into every
      // row's placement, so a hash index cannot split one shard — there
      // the refusal (→ full re-shard) remains the only sound answer; hash
      // shards grow uniformly anyway, so an overgrown hash shard means the
      // WHOLE index outgrew its shard count.
      var splitPlan: Seq[(Int, Array[Int], Array[Array[Float]])] = Seq.empty
      var splitSubCounts: Map[Int, Long] = Map.empty
      var numShardsOut = meta.numShards
      if (affected.nonEmpty) {
        val oldByShard = countsByShard(
          existing.filter(col("shard").isin(affected.map(Integer.valueOf): _*)))
        // growth gate: refuse (or split, ivf) before any graph work if a
        // frozen-centroid hot spot would push a shard past the heap-sizing
        // invariant
        val growthCap = (spark.conf.get("graft.compact.maxShardGrowth", "2.0")
          .toDouble * meta.shardTargetRows).toLong
        def postFoldRows(s: Int): Long =
          oldByShard.getOrElse(s, 0L) - tombByShard.getOrElse(s, 0L) +
            deltaByShard.getOrElse(s, 0L)
        val oversized = affected.filter(s => postFoldRows(s) > growthCap)
        val splitOn = meta.partitioner == "ivf" && meta.centroids.nonEmpty &&
          spark.conf.get("graft.compact.shardSplit", "true").toBoolean
        if (oversized.nonEmpty && !splitOn) return None
        val oversizedSet = oversized.toSet

        // LIVE-INSERT fold (the reference's aminsert / Graph::insert,
        // build.rs:464-557, applied per routed shard): a shard that only
        // RECEIVES delta rows keeps its frozen graph and has the new rows
        // inserted into it — O(inserted · search) graph work instead of an
        // O(shard) rebuild. A shard LOSING tombstoned rows must rebuild
        // (removal shifts the node indices its edges point at); an
        // OVERSIZED shard splits (below) instead of folding.
        val insertFoldOn =
          spark.conf.get("graft.compact.insertFold", "true").toBoolean
        val insertShards =
          if (insertFoldOn)
            affected.filter(s => !oversizedSet(s) &&
              tombByShard.getOrElse(s, 0L) == 0L &&
              deltaByShard.getOrElse(s, 0L) > 0L)
          else Seq.empty[Int]
        val insertSet = insertShards.toSet
        val rebuildShards =
          affected.filterNot(insertSet).filterNot(oversizedSet)

        // the split: per oversized shard, (surviving ∪ delta) members are
        // re-clustered into nSub fresh sub-centroids (sampled Lloyd,
        // [[graft.operators.Similarity.trainIvf]], over BUILD-SPACE
        // vectors — the space routing and radii live in); sub 0 keeps the
        // old shard id, the rest take fresh ids appended past numShards.
        // All sub-shards then rebuild through the normal shard-build
        // kernel — O(hot shard), bounded by the growth cap, never
        // O(corpus).
        val splitInput: Option[DataFrame] =
          if (oversized.isEmpty) None
          else {
            val oCol = oversized.map(Integer.valueOf)
            val old = existing.filter(col("shard").isin(oCol: _*))
              .select(col("row_id"), col("vec"), col("labels"), col("shard"))
            val survivors =
              if (tombstones.isEmpty) old
              else old.join(broadcast(tombDf), Seq("row_id"), "left_anti")
            Some(survivors
              .unionByName(deltaAssigned.filter(col("shard").isin(oCol: _*)))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          }
        try {
          if (oversized.nonEmpty) {
            val met = metric
            val dims = dimsToIndex
            val toBuild = udf((v: mutable.Seq[Float]) =>
              BuildSpace(v.toArray, dims, met))
            var nextId = meta.numShards
            splitPlan = oversized.map { s =>
              val nSub = math.max(2, math.ceil(
                postFoldRows(s).toDouble / meta.shardTargetRows).toInt)
              // sampleSize must cover nSub (trainIvf returns at most
              // sample.length centroids); size the plan arrays from the
              // RETURNED count, never the requested one — an extreme
              // one-compaction pile-up that outruns the capped sample
              // yields fewer, larger sub-shards (still gated for progress
              // below) instead of indexing past the centroid array
              val sub = graft.operators.Similarity.trainIvf(
                splitInput.get.filter(col("shard") === s)
                  .withColumn("bv", toBuild(col("vec"))), "bv", nSub,
                sampleSize = math.max(4096, math.min(nSub * 16, 1 << 17)))
              val cents = sub.centroids
              val ids = Array.tabulate(cents.length)(j =>
                if (j == 0) s else { val id = nextId; nextId += 1; id })
              (s, ids, cents)
            }
            numShardsOut = nextId
          }
          val splitNodes: Option[DataFrame] =
            if (splitPlan.isEmpty) None
            else {
              val splitBc = spark.sparkContext.broadcast(
                splitPlan.map { case (s, ids, cents) =>
                  s -> (ids, graft.operators.Similarity.IvfModel(cents))
                }.toMap)
              val met = metric
              val dims = dimsToIndex
              val reassign = udf((s: Int, v: mutable.Seq[Float]) => {
                val (ids, model) = splitBc.value(s)
                ids(model.nearest(BuildSpace(v.toArray, dims, met), 1)(0))
              })
              val nSubTotal = splitPlan.map(_._2.length).sum
              val rows = splitInput.get
                .withColumn("shard", reassign(col("shard"), col("vec")))
                .repartition(nSubTotal, col("shard"))
              // PROGRESS gate: a point-mass cluster (e.g. a shard of
              // identical vectors) cannot be subdivided by ANY centroid
              // router — every member ties to one sub-centroid, the
              // overgrown sub persists, and re-splitting each compaction
              // would mint empty shards forever. If the split leaves any
              // sub-shard still past the cap, refuse (None → the caller's
              // full rebuild) instead of spiraling. One small aggregate
              // over the (bounded, persisted) split input.
              val subCounts = countsByShard(rows)
              splitSubCounts = subCounts
              val worst = splitPlan.iterator.flatMap(_._2)
                .map(subCounts.getOrElse(_, 0L)).max
              if (worst > growthCap) return None
              Some(buildShardNodes(rows, metric, modelBc, meta.hasLabels,
                dimsToIndex, meta.numNeighbors, meta.searchListSize,
                meta.maxAlpha))
            }

          val rebuiltNodes: Option[DataFrame] =
            if (rebuildShards.isEmpty) None
            else {
              val rCol = rebuildShards.map(Integer.valueOf)
              val oldAffected = existing.filter(col("shard").isin(rCol: _*))
                .select(col("row_id"), col("vec"), col("labels"), col("shard"))
              val survivors =
                if (tombstones.isEmpty) oldAffected
                else oldAffected.join(broadcast(tombDf), Seq("row_id"), "left_anti")
              val rebuildRows = survivors
                .unionByName(deltaAssigned.filter(col("shard").isin(rCol: _*)))
                .repartition(rebuildShards.length, col("shard"))
              Some(buildShardNodes(rebuildRows, metric, modelBc,
                meta.hasLabels, dimsToIndex, meta.numNeighbors,
                meta.searchListSize, meta.maxAlpha))
            }
          val foldedNodes: Option[DataFrame] =
            if (insertShards.isEmpty) None
            else Some(insertFoldNodes(spark, srcRoot, meta, insertShards,
              deltaAssigned, metric, modelBc))
          val nodes = (rebuiltNodes.toSeq ++ foldedNodes.toSeq ++
            splitNodes.toSeq).reduce(_ unionByName _)
          inPhase(spark, PhaseBuilding, dstPath) {
            nodes.write.mode("overwrite").partitionBy("shard")
              .parquet(s"$dstPath/nodes")
          }
        } finally splitInput.foreach(_.unpersist(false))
      } else fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dstPath/nodes"))

      // Untouched shards: MANIFEST entries, not copies — the new generation
      // is a metadata-only commit for them (the Iceberg-style layout; the
      // GC in [[StreamingIngest.compact]] keeps every referenced generation
      // alive). Entries are chain-free: a shard untouched for many
      // compactions still points DIRECTLY at the generation that last built
      // it, never through intermediate manifests.
      // `graft.compact.manifest=false` is the ops escape hatch: raw file
      // copies into the new generation (self-contained dirs, old behavior).
      val splitNewIds: Seq[Int] = splitPlan.flatMap(_._2.drop(1))
      val splitIdsSet: Set[Int] = splitPlan.flatMap(_._2).toSet
      val affectedSet = affected.toSet ++ splitNewIds
      val untouched = (0 until meta.numShards).filterNot(affectedSet)
      val manifestMode =
        spark.conf.get("graft.compact.manifest", "true").toBoolean
      val newShardDirs: Array[String] =
        if (manifestMode)
          (0 until numShardsOut).map { s =>
            if (s >= meta.numShards || affectedSet(s)) ""
            else meta.shardDirs(s) match {
              case "" => relGenOf(srcRoot)
              case ref => ref
            }
          }.toArray
        else {
          val conf = spark.sessionState.newHadoopConf()
          untouched.foreach { s =>
            val src = new org.apache.hadoop.fs.Path(
              s"${shardGenRoot(srcRoot, meta, s)}/nodes/shard=$s")
            if (fs.exists(src))
              org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
                new org.apache.hadoop.fs.Path(s"$dstPath/nodes/shard=$s"),
                false, conf)
          }
          Array.fill(numShardsOut)("")
        }
      import spark.implicits._
      // per-shard cache epochs: fresh for rebuilt/split shards, PRESERVED
      // for carried-forward ones — executor caches of untouched shards
      // survive the generation change
      val freshEpoch = java.util.UUID.randomUUID().toString
      val newShardIds = Array.tabulate(numShardsOut) { s =>
        if (s >= meta.numShards || affectedSet(s)) freshEpoch
        else meta.shardBuildIds(s)
      }
      // split shards REPLACE their centroid with the sub-centroids trained
      // over their own members; everything else keeps its frozen centroid
      // (retraining would invalidate every untouched shard's routing)
      val newCentroids: Array[Array[Float]] =
        if (splitPlan.isEmpty) meta.centroids
        else {
          val out = java.util.Arrays.copyOf(meta.centroids, numShardsOut)
          splitPlan.foreach { case (_, ids, cents) =>
            ids.indices.foreach(j => out(ids(j)) = cents(j))
          }
          out
        }
      // cluster radii stay a SOUND upper bound across the fold: delta rows
      // can only grow an (un-split) shard's radius (max with their centroid
      // distances), tombstones only tighten the true value (the stored
      // bound stays valid), and SPLIT shards re-measure exactly against
      // their fresh centroids (the old bound is meaningless for a new
      // centroid). Unknown (pre-round-10) radii stay unknown — only a full
      // rebuild re-measures.
      val newShardRadii: Array[Double] =
        if (meta.partitioner != "ivf" ||
            meta.shardRadii.length != meta.numShards ||
            (deltaByShard.isEmpty && splitPlan.isEmpty)) meta.shardRadii
        else {
          val met = metric
          val dims = dimsToIndex
          val out = java.util.Arrays.copyOf(meta.shardRadii, numShardsOut)
          if (deltaByShard.nonEmpty) {
            val cBc = spark.sparkContext.broadcast(meta.centroids)
            val deltaMax = deltaAssigned
              .select(col("shard"), col("vec")).rdd.map { row =>
                val s = row.getInt(0)
                val bv = BuildSpace(
                  row.getAs[mutable.Seq[Float]](1).toArray, dims, met)
                (s, math.sqrt(VectorKernels.l2sq(bv, cBc.value(s))))
              }.reduceByKey(math.max).collectAsMap()
            (0 until meta.numShards).foreach { s =>
              if (!splitIdsSet(s))
                out(s) = math.max(out(s), deltaMax.getOrElse(s, 0.0))
            }
          }
          if (splitIdsSet.nonEmpty) {
            // one column-pruned pass over the just-written split shards
            // (bounded by the hot shard's size), exactly like the build's
            // radius measurement
            val ncBc = spark.sparkContext.broadcast(newCentroids)
            val measured = spark.read.schema(nodeSchema).parquet(s"$dstPath/nodes")
              .filter(col("shard").isin(splitIdsSet.toSeq
                .map(Integer.valueOf): _*))
              .select(col("shard"), col("vec")).rdd.map { row =>
                val s = row.getInt(0)
                val bv = BuildSpace(
                  row.getAs[mutable.Seq[Float]](1).toArray, dims, met)
                (s, math.sqrt(VectorKernels.l2sq(bv, ncBc.value(s))))
              }.reduceByKey(math.max).collectAsMap()
            splitIdsSet.foreach(s => out(s) = measured.getOrElse(s, 0.0))
          }
          out
        }
      // per-shard row counts from the fold arithmetic — EXACT, no extra
      // scan: an affected shard loses its tombstone hits and gains its
      // (deduped) delta rows; split shards take their measured sub-counts
      // (a sub-shard the assignment left empty is 0). A pre-round-11 meta
      // (counts unknown) is BACKFILLED here with one group-by-partition-
      // column count over the existing nodes — footer/metadata scale, paid
      // once per legacy index — so legacy indexes gain the exact counts
      // (and the empty-shard fast answer) at their first incremental
      // compact instead of staying unknown forever.
      val newShardRows: Array[Long] = {
        val base: Array[Long] =
          if (meta.shardRows.length == meta.numShards)
            java.util.Arrays.copyOf(meta.shardRows, numShardsOut)
          else {
            val m = countsByShard(existing)
            val out = new Array[Long](numShardsOut)
            (0 until meta.numShards).foreach(s => out(s) = m.getOrElse(s, 0L))
            out
          }
        (deltaByShard.keySet ++ tombByShard.keySet).foreach { s =>
          base(s) = base(s) - tombByShard.getOrElse(s, 0L) +
            deltaByShard.getOrElse(s, 0L)
        }
        splitPlan.foreach { case (_, ids, _) =>
          ids.foreach(id => base(id) = splitSubCounts.getOrElse(id, 0L))
        }
        base
      }
      inPhase(spark, PhaseFinalizing, dstPath) {
        Seq(meta.copy(numRows = newRows, buildId = freshEpoch,
          numShards = numShardsOut, centroids = newCentroids,
          shardBuildIds = newShardIds, shardDirs = newShardDirs,
          shardRadii = newShardRadii, shardRows = newShardRows))
          .toDF().coalesce(1).write.mode("overwrite").parquet(s"$dstPath/_meta")
      }
      Some((newRows, affected ++ splitNewIds))
    } finally deltaAssigned0.unpersist(false)
  }

  /**
   * Per-shard LIVE-INSERT fold: each task receives one shard's FROZEN node
   * rows plus the delta rows routed to it, seeds a [[VamanaBuilder]] with
   * the stored adjacency ([[VamanaBuilder.seedFrozen]]) and inserts only
   * the new rows through the normal build-insert path — the reference's
   * `aminsert` semantics (build.rs:464-557) re-expressed per shard. Old
   * nodes keep their indices (appended rows take the next ones), so stored
   * edges stay valid and only lists a back-edge actually touches are
   * rewritten with fresh distances. Graph work is O(inserted · search);
   * the shard is re-written (IO) but never re-BUILT (compute).
   */
  private def insertFoldNodes(spark: SparkSession, srcRoot: String,
      meta: IndexMeta, shards: Seq[Int], deltaAssigned: DataFrame,
      metric: Metric,
      modelBc: org.apache.spark.broadcast.Broadcast[SbqModel]): DataFrame = {
    val dimsToIndex = meta.dimsToIndex
    val hasLabels = meta.hasLabels
    val r = meta.numNeighbors
    val l = meta.searchListSize
    val alpha = meta.maxAlpha
    val sCol = shards.map(Integer.valueOf)
    val oldRowsDf = nodesDf(spark, srcRoot, meta, shards)
      .select(col("shard"), col("node"), col("row_id"), col("vec"),
        col("code"), col("labels").cast(ArrayType(ShortType)).as("labels"),
        col("neighbors"))
    // appended rows carry node = -1 until the task assigns the next indices
    val freshRowsDf = deltaAssigned.filter(col("shard").isin(sCol: _*))
      .select(col("shard"), lit(-1).as("node"), col("row_id"), col("vec"),
        lit(null).cast(ArrayType(LongType)).as("code"),
        col("labels").cast(ArrayType(ShortType)).as("labels"),
        lit(null).cast(ArrayType(IntegerType)).as("neighbors"))
    oldRowsDf.unionByName(freshRowsDf)
      .repartition(shards.length, col("shard"))
      .mapPartitions { it =>
        val m = modelBc.value
        val byShard = mutable.Map.empty[Int, mutable.ArrayBuffer[Row]]
        it.foreach { row =>
          byShard.getOrElseUpdate(row.getAs[Int]("shard"),
            new mutable.ArrayBuffer) += row
        }
        byShard.iterator.flatMap { case (shard, rows) =>
          val (oldRows, newRows0) = rows.partition(_.getAs[Int]("node") >= 0)
          val sortedOld = oldRows.sortBy(_.getAs[Int]("node")).toArray
          // deterministic append order: ascending row_id, like the build
          val sortedNew = newRows0.sortBy(_.getAs[Long]("row_id")).toArray
          val nOld = sortedOld.length
          val nAll = nOld + sortedNew.length
          val rowIds = new Array[Long](nAll)
          val rawVecs = new Array[Array[Float]](nAll)
          val codes = if (m != null) new Array[Array[Long]](nAll) else null
          val lbs = if (hasLabels) new Array[Array[Short]](nAll) else null
          val adj = new Array[Array[Int]](nOld)
          val buildVecs = new Array[Array[Float]](nAll)
          var i = 0
          while (i < nAll) {
            val row = if (i < nOld) sortedOld(i) else sortedNew(i - nOld)
            require(i >= nOld || row.getAs[Int]("node") == i,
              s"insert fold: shard $shard arrived with non-contiguous nodes")
            rowIds(i) = row.getAs[Long]("row_id")
            rawVecs(i) = row.getAs[mutable.Seq[Float]]("vec").toArray
            buildVecs(i) = BuildSpace(rawVecs(i), dimsToIndex, metric)
            if (codes != null)
              codes(i) =
                if (i < nOld) row.getAs[mutable.Seq[Long]]("code").toArray
                else m.quantize(buildVecs(i))
            if (lbs != null)
              lbs(i) = Option(row.getAs[mutable.Seq[Short]]("labels"))
                .map(s => LabelSets.normalize(s.toArray))
                .getOrElse(Array.emptyShortArray)
            if (i < nOld)
              adj(i) = row.getAs[mutable.Seq[Int]]("neighbors").toArray
            i += 1
          }
          val builder = new VamanaBuilder(buildVecs, lbs, metric, r, l,
            alpha, codes)
          builder.seedFrozen(adj).buildAppended()
          (0 until nAll).iterator.map { j =>
            Row(shard, j, rowIds(j), rawVecs(j),
              if (codes != null) codes(j) else null,
              if (lbs != null) lbs(j) else null,
              builder.neighborsOf(j))
          }
        }
      }(org.apache.spark.sql.Encoders.row(nodeSchema))
  }

  /**
   * Persistent per-index tombstone registry (V1 / the DELETE-visibility
   * analog): `deleteRows` durably marks row ids deleted by appending a tiny
   * parquet file under `$indexPath/tombstones/`; every index-served read
   * path that honors freshness ([[graft.streaming.StreamingIngest.searchFresh]],
   * the SQL-planned [[graft.plans.KnnIndexScanExec]]) loads the set and
   * skips those rows — the reference's scan likewise never emits rows the
   * visibility map says are dead (scan.rs:229-235). The next compaction
   * physically folds them (VACUUM) and consumes the files, so the live set
   * stays bounded by the append-then-compact contract exactly like the
   * delta.
   */
  def deleteRows(spark: SparkSession, indexPath: String,
      rowIds: Iterable[Long]): Unit = {
    if (rowIds.isEmpty) return
    import spark.implicits._
    rowIds.toSeq.toDF("row_id").coalesce(1)
      .write.mode("append").parquet(s"$indexPath/tombstones")
  }

  /** The registry's current data files (Hadoop FS — HDFS/S3 paths work the
    * same as local ones); empty when no deletes are pending. */
  private[graft] def tombstoneFiles(spark: SparkSession,
      indexPath: String): Array[org.apache.hadoop.fs.FileStatus] = {
    val d = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    try fs.listStatus(d)
      .filter(s => !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    catch { case _: java.io.FileNotFoundException => Array.empty }
  }

  /** Fingerprint-keyed cache for [[loadTombstones]]: the LISTING runs on
    * every call (that is the freshness contract — a new delete must be
    * visible to the next scan), but the parquet read + collect job is paid
    * only when the listed (path, length, modtime) fingerprint changed.
    * Steady serving between deletes: one metadata listing per query, zero
    * Spark jobs. */
  private val tombstoneCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Set[Long])]()

  private def tombstoneFingerprint(
      files: Array[org.apache.hadoop.fs.FileStatus]): String =
    files.map(s => s"${s.getPath}#${s.getLen}#${s.getModificationTime}")
      .sorted.mkString("|")

  /** Load the persisted tombstone set. Bounded by the compaction contract
    * (folded + consumed at every compact), so the driver-side Set is the
    * same size class as a query batch. Tolerates the list-then-read race
    * with a concurrent compact consuming the files (re-lists, and a
    * post-compact empty dir correctly yields the empty set). */
  def loadTombstones(spark: SparkSession, indexPath: String): Set[Long] = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < 4) {
      attempt += 1
      val files = tombstoneFiles(spark, indexPath)
      if (files.isEmpty) { tombstoneCache.remove(indexPath); return Set.empty }
      val fp = tombstoneFingerprint(files)
      val cached = tombstoneCache.get(indexPath)
      if (cached != null && cached._1 == fp) return cached._2
      try {
        val set = spark.read.option("ignoreMissingFiles", "true")
          .parquet(files.map(_.getPath.toString).toIndexedSeq: _*)
          .select(col("row_id").cast(LongType))
          .collect().map(_.getLong(0)).toSet
        tombstoneCache.put(indexPath, (fp, set))
        return set
      } catch {
        // plan-time path-not-exist from the race; re-list
        case e: org.apache.spark.sql.AnalysisException => lastErr = e
      }
    }
    throw lastErr
  }

  def loadMeta(spark: SparkSession, path0: String): IndexMeta =
    loadMetaAt(spark, resolveRoot(spark, path0))

  /** Per-label node counts recorded at build (`labelstats`) — None for
    * generations built before the table existed (incremental-compact
    * carry-forwards included): callers must treat the stats as an OPTIONAL
    * optimization input, never a correctness dependency. Cached per
    * generation root — the table is immutable once installed. */
  // (fingerprint, counts) per root — fingerprint-validated like metaCache:
  // an in-place rebuild in ANOTHER process can recreate the same root
  // string with different data, and the consumer uses these counts as a
  // hard exhaustion bound (stale-small counts would truncate results)
  private val labelCountsCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (String, Option[Map[Short, Long]])](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Option[Map[Short, Long]])]): Boolean =
        size() > 64
    })

  def labelCounts(spark: SparkSession,
      path0: String): Option[Map[Short, Long]] = {
    val root = resolveRoot(spark, path0)
    val p = new org.apache.hadoop.fs.Path(s"$root/labelstats")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val fp =
      try fs.listStatus(p)
        .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
        .sorted.mkString("|")
      catch { case _: java.io.FileNotFoundException => "absent" }
    val hit = labelCountsCache.get(root)
    if (hit != null && hit._1 == fp) return hit._2
    val out =
      if (fp == "absent") None
      else Some(spark.read.parquet(p.toString)
        .collect().map(r => r.getShort(0) -> r.getLong(1)).toMap)
    labelCountsCache.put(root, (fp, out))
    out
  }

  /** [[loadMeta]] for an ALREADY-RESOLVED generation root — the GC needs the
    * flat root's own meta even when a newer generation is active (plain
    * loadMeta would re-resolve right past it). */
  /** Per-JVM meta cache keyed by the `_meta` directory's listing
    * fingerprint (names + sizes + mtimes): a generation's meta is
    * immutable under the versioned-install protocol, but the FLAT root's
    * `_meta` can be rewritten by the legacy in-place upgrade, so the
    * fingerprint — one cheap LIST, no Spark job — is the invalidation
    * rule (the tombstone registry's discipline). Without it every search
    * call pays a full parquet-read job for a KB of metadata, which
    * DOMINATES warm single-query serving latency (~100 ms of the ~140 ms
    * measured before this cache). */
  /** Bounded LRU: compaction creates a NEW generation dir per swap, so an
    * unbounded path-keyed map would retain one IndexMeta (incl. IVF
    * centroids) per dead generation for the life of the JVM. 64 live
    * (index, generation) pairs is far above any serving set. */
  private val metaCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (String, IndexMeta)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, IndexMeta)]): Boolean =
        size() > 64
    })

  private def metaFingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_meta")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).map(s =>
        s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("|")
  }

  private[graft] def loadMetaAt(spark: SparkSession, path: String): IndexMeta = {
    val fp = metaFingerprint(spark, path)
    val hit = metaCache.get(path)
    if (hit != null && hit._1 == fp) return hit._2
    val meta = readMetaAt(spark, path)
    metaCache.put(path, (fp, meta))
    meta
  }

  private def readMetaAt(spark: SparkSession, path: String): IndexMeta = {
    import spark.implicits._
    // tolerate metas from earlier format generations (the analog of the
    // reference's V1/V2→V3 meta-page upgrade path, meta_page.rs:296-424):
    // fill every missing field with the default that generation implied
    var df = spark.read.parquet(s"$path/_meta")
    if (!df.columns.contains("partitioner"))
      df = df.withColumn("partitioner", lit("hash"))
    if (!df.columns.contains("centroids"))
      df = df.withColumn("centroids",
        lit(Array.empty[Array[Float]]).cast(ArrayType(ArrayType(FloatType))))
    if (!df.columns.contains("shardTargetRows"))
      df = df.withColumn("shardTargetRows", lit(1L << 20))
    if (!df.columns.contains("buildId"))
      df = df.withColumn("buildId", lit("legacy"))
    if (!df.columns.contains("shardBuildIds"))
      df = df.withColumn("shardBuildIds",
        array_repeat(col("buildId"), col("numShards")))
    if (!df.columns.contains("shardDirs"))
      // pre-manifest generations are self-contained: every shard lives in
      // the generation's own nodes dir
      df = df.withColumn("shardDirs", array_repeat(lit(""), col("numShards")))
    if (!df.columns.contains("shardRadii"))
      // pre-round-10 generations carry no cluster radii: empty = unknown,
      // which disables radius shard pruning but changes nothing else
      df = df.withColumn("shardRadii",
        lit(Array.emptyDoubleArray).cast(ArrayType(DoubleType)))
    if (!df.columns.contains("shardRows"))
      // pre-round-11 generations carry no per-shard row counts: empty =
      // unknown, which only disables the empty-shard fast answer
      df = df.withColumn("shardRows",
        lit(Array.emptyLongArray).cast(ArrayType(LongType)))
    if (!df.columns.contains("fullBuildRows"))
      // pre-round-12 generations don't record the last-full-build row
      // count: 0 = unknown, which disables the auto-REINDEX staleness
      // trigger until the index's first full rebuild stamps it
      df = df.withColumn("fullBuildRows", lit(0L))
    df.as[IndexMeta].head()
  }

  /** IVF probe routing for ONE query vector — the single routing rule
    * shared by the online batch path and the resumable scan (a drifted copy
    * would silently probe different shards warm vs cold). None = unrouted:
    * the query searches every shard. */
  private def probeShardsFor(meta: IndexMeta, metric: Metric,
      qvec: Array[Float], nProbe: Int): Option[Array[Int]] =
    if (meta.partitioner == "ivf" && nProbe > 0 && nProbe < meta.numShards &&
        meta.centroids.nonEmpty) {
      val raw =
        if (qvec == null) new Array[Float](meta.centroids(0).length) else qvec
      val bv = BuildSpace(raw, meta.dimsToIndex, metric)
      Some(graft.operators.Similarity.IvfModel(meta.centroids).nearest(bv, nProbe))
    } else None

  /**
   * SOUND shard pruning for RADIUS queries over IVF-partitioned indexes —
   * unlike nProbe (nearest-n heuristic, recall trade), this prune can never
   * drop an in-radius row: by the triangle inequality in build space,
   * every member m of shard s satisfies
   * |q - m| >= |q - c_s| - radius_s, so a shard with
   * |q - c_s| - radius_s > r holds nothing within Euclidean radius r.
   * Report radii convert to build-space Euclidean per metric:
   * cosine on unit vectors has cosineDist = |a-b|^2/2, so r -> sqrt(2r);
   * true L2 is Euclidean already, and a Matryoshka slice only SHRINKS L2
   * distances, so pruning with the full-vector radius stays a superset.
   * Returns None (no pruning) when radii are unknown (pre-round-10 metas,
   * hash partitioner), for inner product (not a metric space), or for
   * sliced cosine (the slice breaks the unit-norm identity).
   */
  private[graft] def radiusShardsFor(meta: IndexMeta, metric: Metric,
      qvec: Array[Float], radius: Double): Option[Array[Int]] =
    if (meta.partitioner == "ivf" && meta.centroids.nonEmpty &&
        meta.shardRadii.length == meta.numShards && qvec != null &&
        metric != Metric.InnerProduct &&
        !(metric == Metric.Cosine && meta.dimsToIndex > 0)) {
      val bv = BuildSpace(qvec, meta.dimsToIndex, metric)
      val eR = metric match {
        case Metric.Cosine => math.sqrt(2.0 * math.max(radius, 0.0))
        case _ => math.max(radius, 0.0)
      }
      Some((0 until meta.numShards).filter { s =>
        val dc = math.sqrt(VectorKernels.l2sq(bv, meta.centroids(s)))
        // RELATIVE slack sized to the kernels' worst case: with the SIMD
        // float-lane kernels enabled, l2sq at high dims carries ~1e-3
        // relative error, and both the stored radius and dc round-trip
        // through it — an absolute epsilon would under-admit boundary
        // shards and break soundness. Over-admitting only costs time.
        val slack = 1e-3 * (dc + meta.shardRadii(s)) + 1e-6
        dc - meta.shardRadii(s) <= eR + slack
      }.toArray)
    } else None

  /** SQL-visible distance for projections (§4.3 note 1): true cosine / true
    * L2-with-sqrt / negative inner product. */
  private[graft] def reportDistFn(metric: Metric): (Array[Float], Array[Float]) => Double =
    metric match {
      case Metric.L2 => (a, b) => math.sqrt(VectorKernels.l2sq(a, b))
      case Metric.Cosine => (a, b) => VectorKernels.cosineDist(a, b)
      case Metric.InnerProduct => (a, b) => VectorKernels.negDot(a, b)
    }

  /**
   * ANN search: `queries` has columns (qid LONG, qvec ARRAY<FLOAT>) and
   * optionally qlabels ARRAY<SHORT> (null = unfiltered). Returns
   * (qid, row_id, dist) with per-query top-k rows, dist in SQL-visible form.
   *
   * The query set is collected and broadcast (it is the small side by
   * definition); the index scan is a narrow mapPartitions over the nodes
   * table — no shuffle of index data, only of k rows per (shard, query).
   */
  /** Executor-side scan telemetry sinks (V5): Spark `SQLMetric`s are
    * `AccumulatorV2`s, so adding to them inside `mapPartitions` surfaces the
    * counts in the SQL UI / `metrics` of [[graft.plans.KnnIndexScanExec]]. */
  case class SearchMetrics(
      nodesVisited: org.apache.spark.sql.execution.metric.SQLMetric,
      quantizedCmps: org.apache.spark.sql.execution.metric.SQLMetric,
      exactCmps: org.apache.spark.sql.execution.metric.SQLMetric)

  /**
   * A scan of the nodes table whose every task sees only WHOLE shards.
   * Parquet files are splittable (and Spark splits aggressively to fill
   * parallelism — maxSplitBytes can drop to openCostInBytes), so a plain
   * `spark.read.parquet(...).mapPartitions` can hand a task a shard SUBSET;
   * node ids would no longer equal array positions after sort-and-compact and
   * the adjacency would be corrupt. Two shapes, picked by shard count:
   *
   *  - moderate (≤ 256 shards): a union of per-shard partition-pruned scans,
   *    each `coalesce(1)` — pruning keeps each branch to its own shard
   *    directory and coalesce glues that shard's splits into ONE task with NO
   *    shuffle. One union branch per shard is fine at this plan size.
   *  - large (100 TB-scale, thousands of shards): one hash repartition on the
   *    shard key — a single shuffle beats a many-thousand-branch union plan,
   *    and co-locates each shard in exactly one task by construction.
   */
  private def wholeShardScan(nodes: DataFrame, shards: Seq[Int]): DataFrame =
    if (shards.length <= 256)
      shards.map(s => nodes.filter(col("shard") === s).coalesce(1))
        .reduce(_ unionByName _)
    else nodes
      .filter(col("shard").isin(shards.map(Integer.valueOf): _*))
      .repartition(shards.length, col("shard"))

  /** Decode one whole shard's rows into a serving [[GraphSearcher]] (CSR
    * adjacency + primitive arrays), failing fast on a partial shard —
    * neighbors are positions into the node-sorted array, so a subset would
    * silently corrupt adjacency. */
  private def buildShardSearcher(path: String, shard: Int, shardRows: Array[Row],
      metric: Metric, model: SbqModel, hasLabels: Boolean,
      dimsToIndex: Int): GraphSearcher = {
    val sorted = shardRows.sortBy(_.getAs[Int]("node"))
    val nn = sorted.length
    var chk = 0
    while (chk < nn) {
      if (sorted(chk).getAs[Int]("node") != chk)
        throw new IllegalStateException(
          s"index $path shard $shard arrived incomplete in one task " +
            s"(expected contiguous node ids 0..${nn - 1}); " +
            "the nodes scan must deliver whole shards")
      chk += 1
    }
    val rowIds = new Array[Long](nn)
    val vecs = new Array[Array[Float]](nn)
    val codes = if (model != null) new Array[Array[Long]](nn) else null
    val lbs = if (hasLabels) new Array[Array[Short]](nn) else null
    val adj = new Array[Array[Int]](nn)
    var i = 0
    sorted.foreach { r =>
      rowIds(i) = r.getAs[Long]("row_id")
      vecs(i) = r.getAs[mutable.Seq[Float]]("vec").toArray
      if (codes != null) codes(i) = r.getAs[mutable.Seq[Long]]("code").toArray
      if (lbs != null) lbs(i) = Option(r.getAs[mutable.Seq[Short]]("labels"))
        .map(_.toArray).getOrElse(Array.emptyShortArray)
      adj(i) = r.getAs[mutable.Seq[Int]]("neighbors").toArray
      i += 1
    }
    val off = new Array[Int](nn + 1)
    var s = 0
    var j = 0
    while (j < nn) { off(j) = s; s += adj(j).length; j += 1 }
    off(nn) = s
    val tgt = new Array[Int](s)
    j = 0
    var p = 0
    while (j < nn) {
      adj(j).foreach { t => tgt(p) = t; p += 1 }
      j += 1
    }
    new GraphSearcher(rowIds, vecs, codes, lbs, off, tgt, metric, model, dimsToIndex)
  }

  /** `nProbe` > 0 on an IVF-partitioned index restricts each query to its
    * nProbe nearest shards (per-query cost O(nProbe) instead of
    * O(numShards)); 0 = search every shard (exact same recall as hash). */
  def search(spark: SparkSession, path0: String, queries: DataFrame, k: Int,
      searchListSize: Int = 100, rescore: Int = 50,
      tombstones: Set[Long] = Set.empty,
      metrics: Option[SearchMetrics] = None,
      nProbe: Int = 0): DataFrame = {
    val hasQLabels = queries.columns.contains("qlabels")
    val qRows: Array[(Long, Array[Float], Array[Short])] = queries.collect().map { r =>
      // null query vector => zero-vector search (labels/mod.rs:214-216)
      val qv = Option(r.getAs[mutable.Seq[Float]]("qvec")).map(_.toArray).orNull
      val ql = if (hasQLabels) r.getAs[mutable.Seq[Short]]("qlabels") match {
        case null => null
        case s => LabelSets.normalize(s.toArray)
      } else null
      (r.getAs[Long]("qid"), qv, ql)
    }
    searchRows(spark, path0, qRows, k, searchListSize, rescore, tombstones,
      metrics, nProbe)
  }

  /**
   * Low-latency POINT query — the reference's primary operation (one
   * `ORDER BY embedding <=> q LIMIT k` per client call) as a driver API:
   * returns the k (row_id, dist) pairs directly. When every probed shard's
   * searcher is warm in this JVM, the entire call is driver-side — no
   * Spark job, no DataFrame round-trip — which is what makes ms-scale
   * serving possible from a long-lived session (ServingBench measures it;
   * cold shards fall back to the scan path transparently).
   */
  def searchPoint(spark: SparkSession, path0: String, qvec: Array[Float],
      k: Int, searchListSize: Int = 100, rescore: Int = 50, nProbe: Int = 0,
      qlabels: Array[Short] = null,
      tombstones: Set[Long] = Set.empty): Seq[(Long, Double)] = {
    val ql = Option(qlabels).map(LabelSets.normalize).orNull
    searchRows(spark, path0, Array((0L, qvec, ql)), k, searchListSize,
      rescore, tombstones, None, nProbe)
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
      .sortBy { case (rid, d) => (d, rid) }.toSeq
  }

  /** Memoized serving RDD per index path: one partition per shard over the
    * current generation, reused across [[servePointBatch]] calls so steady
    * serving pays ZERO per-call planning (the ~20 ms/branch QueryExecution
    * cost of building the shard-aligned union — ZipPlanCost's measurement —
    * is paid once per generation, not per query). Fingerprint = generation
    * root + per-shard epochs + Spark application id, so a compaction or a
    * session restart invalidates naturally. Bounded LRU like [[metaCache]]. */
  private val servingRddCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (String, org.apache.spark.rdd.RDD[Row])](
      8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, org.apache.spark.rdd.RDD[Row])]): Boolean =
        size() > 16
    })

  private def servingNodesRdd(spark: SparkSession, path0: String,
      root: String, meta: IndexMeta): org.apache.spark.rdd.RDD[Row] = {
    val fp = root + "#" + meta.shardBuildIds.mkString(",") + "#" +
      spark.sparkContext.applicationId
    val hit = servingRddCache.get(path0)
    if (hit != null && hit._1 == fp) hit._2
    else {
      val all = 0 until meta.numShards
      val rdd = shardAlignedNodesRdd(spark, nodesDf(spark, root, meta, all), all)
      servingRddCache.put(path0, (fp, rdd))
      rdd
    }
  }

  /** Memoized bucket-aligned zip scan for [[searchDistributed]] /
    * [[rangeSearchDistributed]] (round 16): partition i holds exactly
    * `buckets(i)`'s shards. Building it costs one pruned-scan
    * QueryExecution PER BUCKET (~20 ms each — ZipPlanCost's measurement;
    * ~0.5 s per query on the 500-shard fixture, and O(zipMaxShards)
    * branches in general), all driver-side — paid once per (generation,
    * routing set, bucket layout) instead of once per query. Fingerprint =
    * generation root + per-shard epochs + applicationId + the exact shard
    * set and bucket size, so compaction, an in-place rebuild, a different
    * IVF routing set or a different zipMaxShards all invalidate naturally.
    * The [[servingRddCache]] discipline — index STATE memoization, never
    * query results (every execution still scans the parquet nodes). */
  private val zipRddCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (String, org.apache.spark.rdd.RDD[Row])](
      8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, org.apache.spark.rdd.RDD[Row])]): Boolean =
        size() > 16
    })

  private def zipNodesRdd(spark: SparkSession, path0: String, root: String,
      meta: IndexMeta, neededShards: Seq[Int],
      buckets: IndexedSeq[Seq[Int]],
      bucketSize: Int): org.apache.spark.rdd.RDD[Row] = {
    val fp = root + "#" + meta.shardBuildIds.mkString(",") + "#" +
      spark.sparkContext.applicationId + "#" + neededShards.mkString(",") +
      "#" + bucketSize
    val key = s"$path0#zip#$bucketSize"
    val hit = zipRddCache.get(key)
    if (hit != null && hit._1 == fp) hit._2
    else {
      val nodes = nodesDf(spark, root, meta, neededShards)
      val rdd =
        if (bucketSize == 1) shardAlignedNodesRdd(spark, nodes, neededShards)
        else bucketedNodesRdd(spark, nodes, buckets)
      zipRddCache.put(key, (fp, rdd))
      rdd
    }
  }

  /**
   * CLUSTER-MODE serving: answer a small query batch from EXECUTOR-resident
   * warm searchers — the path that does not exist through [[searchPoint]]
   * when the driver is not colocated with the executor cache (SCALING.md's
   * documented cluster-mode fallback was the full scan path; this closes
   * it). The reference serves from wherever the backend process holds its
   * shared buffers; on Spark, that place is the executor JVM, so the
   * serving pool lives there.
   *
   * How it stays cheap:
   *  - ONE task per shard over a MEMOIZED shard-aligned RDD (partition i ==
   *    shard i, the [[shardAlignedNodesRdd]] contract) — no per-call
   *    planning, no shuffle anywhere in the lineage;
   *  - each task checks the executor-local [[GraphSearcher]] cache FIRST
   *    and serves without touching its input iterator when warm — the
   *    parquet scan underneath is LAZY, so a warm task reads zero bytes
   *    (asserted via task input metrics in DiskannIndexSpec). Only a cold
   *    (first-visit) task consumes the scan and decodes the shard, after
   *    which that executor holds the shard for the life of its LRU slot;
   *  - IVF routing skips unprobed shards BEFORE the cache probe, so a
   *    routed query batch schedules numShards no-op tasks but reads and
   *    searches only its probe set;
   *  - the per-query top-k merge runs driver-side over ≤ shards×k×|batch|
   *    collected rows — the same bounded merge [[searchPoint]]'s all-warm
   *    path does.
   *
   * Scheduling affinity is best-effort (Spark places tasks by scan
   * locality, not by cache residency): a task landing on a cache-cold
   * executor pays one scan+decode and warms THAT executor — at steady
   * state each frequently-probed shard converges to one decoded replica
   * per executor that serves it, bounded by the cache's LRU. Deletes are
   * honored: the persisted tombstone registry is loaded (fingerprint-
   * cached) and masked on every call, like the SQL scan path.
   *
   * Returns (qid, row_id, dist) rows, per query ordered by (dist, row_id),
   * ties broken exactly like every other search path.
   */
  def servePointBatch(spark: SparkSession, path0: String,
      queries: Seq[(Long, Array[Float], Array[Short])], k: Int,
      searchListSize: Int = 100, rescore: Int = 50, nProbe: Int = 0,
      tombstones: Set[Long] = Set.empty): Seq[(Long, Long, Double)] = {
    if (queries.isEmpty) return Seq.empty
    val path = resolveRoot(spark, path0)
    val meta = loadMeta(spark, path)
    val metric = Metric(meta.metric)
    val model =
      if (meta.storage == "sbq")
        SbqModel(meta.modelCount, meta.modelMean, meta.modelM2, meta.bitsPerDim)
      else null
    val qRows = queries.map { case (qid, qv, ql) =>
      (qid, qv, Option(ql).map(LabelSets.normalize).orNull)
    }.toArray
    val probeOf: Map[Long, Array[Int]] =
      qRows.flatMap { case (qid, qv, _) =>
        probeShardsFor(meta, metric, qv, nProbe).map(qid -> _)
      }.toMap
    val probedShards: Set[Int] =
      if (probeOf.nonEmpty && probeOf.size == qRows.length)
        probeOf.values.flatten.toSet
      else (0 until meta.numShards).toSet
    val tomb = tombstones ++ loadTombstones(spark, path0)
    val report = reportDistFn(metric)
    val rdd = servingNodesRdd(spark, path0, path, meta)
    val sc = spark.sparkContext
    val qBc = sc.broadcast(qRows)
    val probeBc = sc.broadcast(probeOf)
    val probedBc = sc.broadcast(probedShards)
    val tombBc = sc.broadcast(tomb)
    val shardIds = meta.shardBuildIds
    val cachePath = path0
    val hasLabels = meta.hasLabels
    val dims = meta.dimsToIndex
    val served = rdd.mapPartitionsWithIndex { (shard, it) =>
      if (!probedBc.value.contains(shard)) Iterator.empty
      else {
        val key = s"$cachePath#$shard#${shardIds(shard)}"
        // peek BEFORE touching the iterator: a warm hit must not consume
        // (= read) the underlying lazy parquet scan at all
        val searcher = GraphSearcher.peek(key).getOrElse {
          val rows = it.toArray
          if (rows.isEmpty) null
          else GraphSearcher.getOrBuild(key,
            () => buildShardSearcher(path, shard, rows, metric, model,
              hasLabels, dims))
        }
        if (searcher == null) Iterator.empty
        else qBc.value.iterator
          .filter { case (qid, _, _) =>
            probeBc.value.get(qid).forall(_.contains(shard)) }
          .flatMap { case (qid, qv, ql) =>
            searcher.search(qv, k, searchListSize, rescore, ql,
              rid => tombBc.value.contains(rid), report, null)
              .take(k).map { case (rid, d) => (qid, rid, d) }
          }
      }
    }
    // submit ONLY the probed partitions (partition id == shard id by the
    // aligned-RDD contract): a routed single query schedules nProbe tasks,
    // not numShards — the scheduling overhead that otherwise dominates
    // point latency at high shard counts
    val partial = sc.runJob(served,
      (it: Iterator[(Long, Long, Double)]) => it.toArray,
      probedShards.toSeq.sorted).flatten
    partial.groupBy(_._1).iterator.flatMap { case (_, hits) =>
      hits.sortBy(h => (h._3, h._2)).take(k)
    }.toSeq.sortBy(h => (h._1, h._3, h._2))
  }

  /** [[search]] after query collection — the shared kernel for the
    * DataFrame path and [[searchPoint]]. */
  private[graft] def searchRows(spark: SparkSession, path0: String,
      qRows: Array[(Long, Array[Float], Array[Short])], k: Int,
      searchListSize: Int, rescore: Int, tombstones: Set[Long],
      metrics: Option[SearchMetrics], nProbe: Int): DataFrame = {
    // resolve the active generation ONCE: meta and nodes must come from the
    // same version even if a compaction swap lands mid-query
    val path = resolveRoot(spark, path0)
    val meta = loadMeta(spark, path)
    val metric = Metric(meta.metric)
    val model =
      if (meta.storage == "sbq") SbqModel(meta.modelCount, meta.modelMean, meta.modelM2, meta.bitsPerDim)
      else null
    // IVF routing: per-query probe set computed once on the driver from the
    // meta centroids (tiny); absent = query searches every shard
    val probeOf: Map[Long, Array[Int]] =
      qRows.flatMap { case (qid, qv, _) =>
        probeShardsFor(meta, metric, qv, nProbe).map(qid -> _)
      }.toMap
    val probeBc = spark.sparkContext.broadcast(probeOf)
    val qBc = spark.sparkContext.broadcast(qRows)
    val tombBc = spark.sparkContext.broadcast(tombstones)
    val report = reportDistFn(metric)

    // IVF routing also prunes the SCAN: only shards some query probes are
    // read at all (partition-pruned by the shard directory key) — at
    // thousands of shards a probe touches O(queries × nProbe) shards, not
    // every shard. Unrouted searches read everything.
    val neededShards: Seq[Int] =
      if (probeOf.nonEmpty && probeOf.size == qRows.length)
        probeOf.values.flatten.toSet.toSeq.sorted
      else 0 until meta.numShards
    val resultSchema = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("row_id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))

    // cache keys use the CALLER's index path + the per-shard epoch: the
    // resolved generation dir changes on every compaction, but an untouched
    // shard keeps its epoch, so its decoded graph stays warm across
    // incremental compactions
    val shardIds = meta.shardBuildIds
    val cachePath = path0

    def searchShard(searcher: GraphSearcher, shard: Int,
        qs: Iterator[(Long, Array[Float], Array[Short])],
        tomb: Set[Long], probes: Map[Long, Array[Int]]): Iterator[Row] =
      qs.filter { case (qid, _, _) => probes.get(qid).forall(_.contains(shard)) }
        .flatMap { case (qid, qvec, qlabels) =>
          val st = if (metrics.isDefined) new SearchStats else null
          val hits = searcher.search(qvec, k, searchListSize, rescore, qlabels,
            rid => tomb.contains(rid), report, st)
          metrics.foreach { m =>
            m.nodesVisited.add(st.nodesVisited)
            m.quantizedCmps.add(st.quantizedCmps)
            m.exactCmps.add(st.exactCmps)
          }
          hits.take(k).map { case (rid, d) => Row(qid, rid, d) }
        }

    // Serving warm path: a shard whose decoded searcher already lives in
    // THIS JVM's cache is answered directly, with no nodes scan at all — the
    // analog of a reference backend serving from shared buffers instead of
    // re-reading index pages. In local mode (and any serving node colocated
    // with its executor cache) repeat point queries skip Parquet entirely; in
    // cluster mode the query-issuing driver has an empty cache, every shard
    // is cold, and the scan path below is unchanged. Gated to small query
    // batches — large batches belong to searchDistributed anyway.
    val warmPairs: Seq[(Int, GraphSearcher)] =
      if (qRows.length <= 128)
        neededShards.flatMap(sh =>
          GraphSearcher.peek(s"$cachePath#$sh#${shardIds(sh)}").map(sh -> _))
      else Seq.empty
    val warmSet = warmPairs.map(_._1).toSet
    val coldShards = neededShards.filterNot(warmSet)
    val warmShards = warmPairs.map(_._1)
    val warmRows: Seq[Row] = warmPairs.flatMap { case (shard, searcher) =>
      searchShard(searcher, shard, qRows.iterator, tombstones, probeOf).toSeq
    }

    val coldPartial: Option[DataFrame] = if (coldShards.isEmpty) None else {
      val coldNodes =
        wholeShardScan(nodesDf(spark, path, meta, coldShards), coldShards)
      Some(coldNodes.mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else rows.groupBy(_.getAs[Int]("shard")).iterator.flatMap { case (shard, shardRows) =>
          val searcher = GraphSearcher.getOrBuild(
            s"$cachePath#$shard#${shardIds(shard)}",
            () => buildShardSearcher(path, shard, shardRows, metric, model,
              meta.hasLabels, meta.dimsToIndex))
          searchShard(searcher, shard, qBc.value.iterator, tombBc.value, probeBc.value)
        }
      }(org.apache.spark.sql.Encoders.row(resultSchema)))
    }

    // All-warm serving fast path: every probed shard answered from this
    // JVM's decoded searchers, so the per-query top-k merge is over ≤
    // nShards×k DRIVER-LOCAL rows — do it here and return a LocalRelation.
    // Routing it through the window merge below would spend a full Spark
    // job + shuffle on rows already in hand (measured: single-query p50
    // ~190 ms through the window vs low-ms driver-side; the reference
    // analog is answering from shared buffers without planning a scan).
    // Same ordering rule as the window ((dist, row_id) ascending), so the
    // result content is bit-identical.
    if (coldShards.isEmpty) {
      val topk = warmRows.groupBy(_.getLong(0)).iterator.flatMap {
        case (_, rs) => rs.sortBy(r => (r.getDouble(2), r.getLong(1))).take(k)
      }.toSeq
      return spark.createDataFrame(
        java.util.Arrays.asList(topk: _*), resultSchema)
    }

    val warmPartial: Option[DataFrame] =
      if (warmShards.isEmpty) None
      else Some(spark.createDataFrame(
        java.util.Arrays.asList(warmRows: _*), resultSchema))

    val partial = (warmPartial, coldPartial) match {
      case (Some(w), Some(c)) => w.unionByName(c)
      case (Some(w), None) => w
      case (None, Some(c)) => c
      case (None, None) =>
        spark.createDataFrame(java.util.Collections.emptyList[Row](), resultSchema)
    }

    // final top-k merge per query
    partial
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist"), col("row_id"))))
      .filter(col("rnk") <= k)
      .drop("rnk")
  }

  /**
   * Shard-aligned, SHUFFLE-FREE nodes RDD: partition i holds exactly shard
   * `neededShards(i)`, built as an RDD-level union of per-shard
   * partition-pruned scans. RDD union (unlike a Catalyst union) never
   * repacks tiny scans into fewer partitions — the zip alignment depends on
   * that — and its lineage contains NO ShuffleDependency on the nodes side
   * (asserted by DiskannIndexSpec), which is the property that keeps the
   * 100 TB index out of every shuffle regardless of shard count.
   */
  private[graft] def shardAlignedNodesRdd(spark: SparkSession,
      nodes: DataFrame,
      neededShards: Seq[Int]): org.apache.spark.rdd.RDD[Row] = {
    // each branch pays its own QueryExecution (~20 ms measured — the only
    // cost that grows with shard count on this path); branches are
    // independent, so plan them on a parallel collection (Spark planning is
    // thread-safe per session — concurrent queries do exactly this).
    // ParSeq.map preserves sequence order, which the zip alignment needs.
    // ZipPlanCost is the measurement harness.
    import scala.collection.parallel.CollectionConverters._
    spark.sparkContext.union(
      neededShards.par
        .map(s => nodes.filter(col("shard") === s).coalesce(1).rdd).seq)
  }

  /**
   * Bucket-aligned generalization of [[shardAlignedNodesRdd]]: partition i
   * holds ALL rows of the shards in `buckets(i)` via one partition-pruned
   * coalesced scan per bucket. Same shuffle-free lineage property (asserted
   * by DiskannIndexSpec past `zipMaxShards`) — this is what lets the zip
   * path serve ANY shard count with a bounded number of plan branches.
   */
  private[graft] def bucketedNodesRdd(spark: SparkSession, nodes: DataFrame,
      buckets: Seq[Seq[Int]]): org.apache.spark.rdd.RDD[Row] = {
    import scala.collection.parallel.CollectionConverters._
    spark.sparkContext.union(
      buckets.par.map(ss => nodes
        .filter(col("shard").isin(ss.map(Integer.valueOf): _*))
        .coalesce(1).rdd).seq)
  }

  /** True iff `rdd`'s lineage reaches a shuffle — test/plan-audit hook. */
  private[graft] def hasShuffle(rdd: org.apache.spark.rdd.RDD[_]): Boolean = {
    val seen = mutable.Set.empty[Int]
    def walk(r: org.apache.spark.rdd.RDD[_]): Boolean =
      seen.add(r.id) && r.dependencies.exists {
        case _: org.apache.spark.ShuffleDependency[_, _, _] => true
        case d => walk(d.rdd)
      }
    walk(rdd)
  }

  /**
   * Driver-side resumable single-query scan over WARM shards — the
   * `amgettuple` / TSVResponseIterator analog (scan.rs:162-242,370-405) for
   * the residual-recheck over-fetch loop: each escalation round EXTENDS the
   * per-shard best-first frontiers instead of re-searching from scratch.
   *
   * Opens only when every needed shard's decoded [[GraphSearcher]] is
   * already in THIS JVM's cache (the serving warm path: always true in
   * local mode after the first round, and on any serving node colocated
   * with its executor cache). Cold or cluster-remote shards return None and
   * the caller keeps the distributed per-round search — correctness is
   * identical either way (resume is exact; see [[GraphSearcher.ResumableSearch]]),
   * only the re-paid traversal differs.
   */
  final class ResumableScanHandle private[DiskannIndex] (
      handles: Seq[(GraphSearcher#ResumableSearch, SearchStats)],
      metrics: Option[SearchMetrics]) {
    private var reported = (0L, 0L, 0L)

    /** Top-kk merged hits at this budget, as (qid=0, row_id, dist) rows. */
    def topK(kk: Int, searchListSize: Int, rescore: Int): Array[Row] = {
      val merged = handles.iterator
        .flatMap { case (h, _) =>
          h.advance(kk, math.max(searchListSize, kk), rescore).take(kk) }
        .toArray
        .sortBy { case (rid, d) => (d, rid) }
        .take(kk)
      metrics.foreach { m =>
        val now = handles.map(_._2).foldLeft((0L, 0L, 0L)) { case (acc, st) =>
          (acc._1 + st.nodesVisited, acc._2 + st.quantizedCmps, acc._3 + st.exactCmps)
        }
        m.nodesVisited.add(now._1 - reported._1)
        m.quantizedCmps.add(now._2 - reported._2)
        m.exactCmps.add(now._3 - reported._3)
        reported = now
      }
      merged.map { case (rid, d) => Row(0L, rid, d) }
    }
  }

  /**
   * Distance-threshold scan — the `WHERE embedding <=> q < r` shape
   * (pgvector 0.8's iterative index scans; pgvectorscale serves it through
   * the same streaming top-k machinery, scan.rs:162-242): pull from the
   * resumable frontier in escalating top-k rounds until the deepest exact
   * distance exceeds `radius`, then keep every hit within it. Same
   * approximation contract as top-k (greedy traversal may miss outliers;
   * exhaustive at widened L), exact under the verification parameters.
   * Warm shards resume one frontier across rounds; a cold index pays one
   * full search on round 1 (which warms it) and resumes from round 2 —
   * the residualExecute escalation discipline. `maxResults` bounds the
   * driver-side result (a radius covering the whole corpus is a scan, not
   * a point lookup — callers wanting that should read the table).
   */
  def rangeSearch(spark: SparkSession, path0: String, qvec: Array[Float],
      radius: Double, searchListSize: Int = 100, rescore: Int = 50,
      qlabels: Array[Short] = null, tombstones: Set[Long] = Set.empty,
      nProbe: Int = 0, maxResults: Int = 65536): Seq[(Long, Double)] =
    rangeSearchWithStatus(spark, path0, qvec, radius, searchListSize,
      rescore, qlabels, tombstones, nProbe, maxResults)._1

  /**
   * [[rangeSearch]] plus a CONFIRMED flag: `true` means the escalation's
   * stability contract held (the in-radius set was unchanged across a 4x
   * widening, or the traversal genuinely exhausted), `false` means the
   * `maxResults` cap cut escalation short and the set may be INCOMPLETE —
   * note the returned count can be far below maxResults in that case (only
   * a fraction of the capped top-k cleared the radius), so consumers
   * needing exactness must branch on this flag, not on the result size
   * (KnnRangeScanExec falls back to the exact distributed scan on false).
   */
  def rangeSearchWithStatus(spark: SparkSession, path0: String,
      qvec: Array[Float],
      radius: Double, searchListSize: Int = 100, rescore: Int = 50,
      qlabels: Array[Short] = null, tombstones: Set[Long] = Set.empty,
      nProbe: Int = 0, maxResults: Int = 65536): (Seq[(Long, Double)], Boolean) = {
    // SOUND radius shard pruning (triangle inequality over the stored IVF
    // cluster radii, [[radiusShardsFor]]): at thousands of shards a
    // selective radius visits only the shards whose cluster ball can
    // intersect it — a 100x serving lever that, unlike nProbe, can never
    // drop an in-radius row. The prune is computed inside the open, from
    // the same meta that routes the scan (no generation-swap straddle);
    // the cold first call still pays the full searchPoint once (which
    // warms the caches), every resumed round is pruned.
    var resumable = openResumableScan(spark, path0, qvec, qlabels,
      tombstones, nProbe = nProbe, radiusPrune = Some(radius))
    def round(kk: Int, l: Int): Seq[(Long, Double)] = resumable match {
      case Some(h) =>
        h.topK(kk, math.max(l, kk), math.max(rescore, l))
          .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      case None =>
        val hits = searchPoint(spark, path0, qvec, kk,
          math.max(l, kk), math.max(rescore, l), nProbe, qlabels, tombstones)
        resumable = openResumableScan(spark, path0, qvec, qlabels,
          tombstones, nProbe = nProbe, radiusPrune = Some(radius))
        hits
    }
    // EXHAUSTIVENESS is owned here, not by caller-tuned parameters: the
    // greedy traversal at a given search-list size L can clear the radius
    // (deepest returned distance > radius) while un-returned in-radius rows
    // sit beyond its frontier — a top-k result hides that behind k, a range
    // result cannot. So the escalation widens L TOGETHER with kk and only
    // stops once the in-radius ID SET is UNCHANGED across a 4x widening
    // (or the maxResults cap is hit — the documented truncation bound for
    // radii that cover the corpus). L quadruples per round, so the confirm
    // round re-pays little: the resumable frontier extends instead of
    // re-searching, and a stable set is typically confirmed in one extra
    // round at 4x the L that found it.
    // for the cap-boundary confirmation (see escalateRadius): numRows is
    // the cover bound — kk >= numRows proves the exploration covered the
    // corpus (bound >= 3kk), the one condition under which a cap exit may
    // still confirm
    val indexedRows: Long =
      try loadMeta(spark, resolveRoot(spark, path0)).numRows
      catch { case _: Exception => Long.MaxValue }
    escalateRadius(round, radius, searchListSize, maxResults, indexedRows)
  }

  /** THE escalate-until-stable radius loop — ONE definition shared by the
    * point path ([[rangeSearchWithStatus]], multi-shard resumable scan) and
    * the distributed per-(query, shard) kernel ([[rangeOnSearcher]]) so the
    * exhaustiveness contract can never drift between them. `round(kk, l)`
    * returns the current top-kk by report distance under exploration bound
    * l; `coverRows` is the row count a drained round (hits < kk) must have
    * provably covered for a cap-boundary exit to stay confirmed. */
  private[graft] def escalateRadius(round: (Int, Int) => Seq[(Long, Double)],
      radius: Double, searchListSize: Int, maxResults: Int,
      coverRows: => Long): (Seq[(Long, Double)], Boolean) = {
    var kk = math.max(1, math.min(64, maxResults))
    var l = math.max(searchListSize, kk)
    var prevInRadius: Option[Set[Long]] = None
    var out: Seq[(Long, Double)] = null
    var confirmed = true
    while (out == null) {
      val hits = round(kk, l)
      val inRadius = hits.filter(_._2 <= radius)
      val cleared = hits.length < kk || hits.lastOption.forall(_._2 > radius)
      // stable-exit FIRST: a set confirmed at the cap boundary is still
      // confirmed; only an exit FORCED by the cap is unconfirmed
      if (cleared && prevInRadius.contains(inRadius.map(_._1).toSet))
        out = inRadius.take(maxResults)
      else if (kk >= maxResults) {
        // cap exit confirms iff the exploration bound provably covered the
        // corpus: with kk >= coverRows (and L >= kk), either the traversal
        // drained (hits < kk — frontier exhausted) or it returned kk >=
        // coverRows rows, i.e. every row there is; both are complete. A
        // drained look under a SMALLER kk stays unconfirmed — heavy
        // tombstone/label filtering can drain a truncated traversal whose
        // eligible survivors just happen to be few.
        confirmed = kk >= coverRows
        out = inRadius.take(maxResults)
      } else {
        prevInRadius =
          if (cleared) Some(inRadius.map(_._1).toSet) else None
        kk = math.min(maxResults, kk * 4)
        l = math.max(l * 4, kk)
      }
    }
    (out, confirmed)
  }

  def openResumableScan(spark: SparkSession, path0: String,
      qvec: Array[Float], qlabels: Array[Short],
      tombstones: Set[Long] = Set.empty,
      metrics: Option[SearchMetrics] = None,
      nProbe: Int = 0,
      /** when set, apply SOUND radius shard pruning ([[radiusShardsFor]])
        * for this report-distance radius — computed from the SAME meta this
        * scan resolves, so routing and radii can never straddle a
        * generation swap; None = no pruning */
      radiusPrune: Option[Double] = None): Option[ResumableScanHandle] = {
    val path = resolveRoot(spark, path0)
    val meta = loadMeta(spark, path)
    val metric = Metric(meta.metric)
    val routed: Seq[Int] =
      probeShardsFor(meta, metric, qvec, nProbe)
        .map(_.toSeq.sorted).getOrElse(0 until meta.numShards)
    // graft.knn.range.shardPrune=false is the ops escape hatch (and the
    // measurement baseline for RangeProbe) — pruning is sound, so turning
    // it off can only cost time, never change results
    val pruneOn =
      spark.conf.get("graft.knn.range.shardPrune", "true").toBoolean
    val needed: Seq[Int] =
      radiusPrune.filter(_ => pruneOn)
        .flatMap(r => radiusShardsFor(meta, metric, qvec, r)) match {
        case Some(f) => val keep = f.toSet; routed.filter(keep)
        case None => routed
      }
    val model =
      if (meta.storage == "sbq")
        SbqModel(meta.modelCount, meta.modelMean, meta.modelM2, meta.bitsPerDim)
      else null
    val searchers = needed.map { sh =>
      val key = s"$path0#$sh#${meta.shardBuildIds(sh)}"
      GraphSearcher.peek(key).orElse {
        // an EMPTY shard (a tombstone wipe rebuilt it to zero rows, or a
        // degenerate split sub-cluster) never flows through the scan paths
        // that build searchers, so it would block this open FOREVER — the
        // whole index's resumable serving wedged by one rowless shard.
        // Emptiness is decided from the META's exact per-shard row counts,
        // never the filesystem: a GC racing this open can legitimately
        // remove a superseded shard dir (even inside a generation whose
        // _meta survives), and an FS probe would call that "empty" and
        // silently truncate results. shardRows is immutable per
        // generation; unknown (pre-round-11) metas never synthesize and
        // stay on the loud cold path. A merely COLD (non-empty) shard
        // returns None and the caller pays the normal warming search once.
        if (meta.shardRows.length == meta.numShards &&
            meta.shardRows(sh) == 0L)
          Some(GraphSearcher.getOrBuild(key,
            () => buildShardSearcher(path, sh, Array.empty, metric, model,
              meta.hasLabels, meta.dimsToIndex)))
        else None
      }
    }
    if (searchers.exists(_.isEmpty)) None
    else {
      val report = reportDistFn(metric)
      val nq = Option(qlabels).map(l => LabelSets.normalize(l.clone())).orNull
      val handles = searchers.map { s =>
        val st = new SearchStats
        (s.get.resumable(qvec, nq, rid => tombstones.contains(rid), report, st), st)
      }
      Some(new ResumableScanHandle(handles, metrics))
    }
  }

  /**
   * Fully distributed ANN search for LARGE query sets — the offline
   * "find neighbors for every row" workload where the query table itself has
   * millions of rows and collecting/broadcasting it (as [[search]] does for
   * online batches) would not scale.
   *
   * Nothing touches the driver except the tiny `_meta` (centroids): queries
   * keep their rows distributed, each is routed to its probe shards with the
   * broadcast centroid table (IVF + nProbe) or fanned to every shard (hash),
   * and a `cogroup` on the shard key co-locates each whole shard with its
   * query group in one task — per-shard searchers come from the same
   * executor cache as the online path. Cost shape at 100 TB: one shuffle of
   * the (pruned) nodes table + one shuffle of queries×nProbe, then a final
   * per-query top-k merge; bucketing the nodes table by shard would remove
   * the nodes shuffle entirely.
   */
  def searchDistributed(spark: SparkSession, path0: String, queries: DataFrame,
      k: Int, searchListSize: Int = 100, rescore: Int = 50,
      tombstones: Set[Long] = Set.empty, nProbe: Int = 0): DataFrame = {
    val path = resolveRoot(spark, path0)
    val meta = loadMeta(spark, path)
    val metric = Metric(meta.metric)
    val model =
      if (meta.storage == "sbq") SbqModel(meta.modelCount, meta.modelMean, meta.modelM2, meta.bitsPerDim)
      else null
    val report = reportDistFn(metric)
    val shardIds = meta.shardBuildIds
    val cachePath = path0
    val numShards = meta.numShards
    val dimsToIndex = meta.dimsToIndex
    val hasLabels = meta.hasLabels
    val tombBc = spark.sparkContext.broadcast(tombstones)

    // per-query probe-shard assignment, executor-side over broadcast centroids
    val routed = meta.partitioner == "ivf" && nProbe > 0 &&
      nProbe < numShards && meta.centroids.nonEmpty
    val centBc = spark.sparkContext.broadcast(meta.centroids)
    val probeShards = udf((qv: mutable.Seq[Float]) =>
      if (!routed) (0 until numShards).toArray
      else {
        val raw = Option(qv).map(_.toArray)
          .getOrElse(new Array[Float](centBc.value(0).length))
        val bv = BuildSpace(raw, dimsToIndex, metric)
        graft.operators.Similarity.IvfModel(centBc.value).nearest(bv, nProbe)
      })
    val hasQLabels = queries.columns.contains("qlabels")
    // explode_outer: a plain explode would make InferFiltersFromGenerate
    // synthesize size(probeShards(qvec))>0 and re-invoke the routing UDF
    // (normalize + full centroid scan) once per conjunct per query row
    val q2 = queries.select(col("qid"), col("qvec"),
      (if (hasQLabels) col("qlabels")
       else lit(null).cast(ArrayType(ShortType))).as("qlabels"),
      explode_outer(probeShards(col("qvec"))).as("shard"))
      .filter(col("shard").isNotNull)

    // only shards that received at least one query are read at all (the ids
    // are tiny — numShards ints at most — so this driver hop is free)
    val neededShards: Seq[Int] =
      if (routed) q2.select("shard").distinct().collect().map(_.getInt(0)).sorted.toSeq
      else 0 until numShards
    import spark.implicits._
    // an empty (routed) query batch routes nowhere — zero buckets would
    // make the zip partitioner degenerate, so short-circuit
    if (neededShards.isEmpty)
      return spark.emptyDataset[(Long, Long, Double)]
        .toDF("qid", "row_id", "dist")
    def answerShard(shard: Int, nodeRows: () => Array[Row],
        qs: Array[Row]): Iterator[(Long, Long, Double)] = {
      val searcher = GraphSearcher.getOrBuild(
        s"$cachePath#$shard#${shardIds(shard)}",
        () => buildShardSearcher(path, shard, nodeRows(), metric, model,
          hasLabels, dimsToIndex))
      val tomb = tombBc.value
      qs.iterator.flatMap { r =>
        val qid = r.getAs[Long]("qid")
        val qvec = Option(r.getAs[mutable.Seq[Float]]("qvec")).map(_.toArray).orNull
        val qlabels = Option(r.getAs[mutable.Seq[Short]]("qlabels"))
          .map(s => LabelSets.normalize(s.toArray)).orNull
        searcher.search(qvec, k, searchListSize, rescore, qlabels,
          rid => tomb.contains(rid), report)
          .take(k).iterator.map { case (rid, d) => (qid, rid, d) }
      }
    }
    // Co-location WITHOUT shuffling the index, at ANY shard count: the
    // shard-aligned scan is one coalesced task per shard BUCKET (same
    // pruned-scan mechanism as the online path), so zipping it against
    // queries hash-partitioned to the matching partition index moves ONLY
    // the query rows — the 100 TB nodes table never crosses the wire, and a
    // warm executor cache means the unconsumed node iterator skips the
    // decode entirely. The only cost that grows with shard count is DRIVER
    // planning (one tiny pruned-scan plan per bucket, single-digit ms each
    // — the "bucketed by shard directory" equivalent of a bucketed-table
    // join, without a metastore); past `graft.search.zipMaxShards`
    // (default 4096) buckets start holding MULTIPLE whole shards, capping
    // the plan-branch count while keeping the nodes side shuffle-free —
    // the round-4 cogroup fallback (which shuffled the nodes table past
    // the cap) is gone.
    val zipMaxShards =
      spark.conf.get("graft.search.zipMaxShards", "4096").toInt
    val partial: org.apache.spark.rdd.RDD[(Long, Long, Double)] = {
      val bucketSize = math.max(1,
        math.ceil(neededShards.length.toDouble / zipMaxShards).toInt)
      val buckets: IndexedSeq[Seq[Int]] =
        neededShards.grouped(bucketSize).toIndexedSeq
      val nBuckets = buckets.length
      val bucketIndex: Map[Int, Int] = buckets.zipWithIndex
        .flatMap { case (ss, b) => ss.map(_ -> b) }.toMap
      // one pruned coalesced scan per BUCKET; contiguous shard ranges keep
      // each branch's directory listing local. bucketSize == 1 is exactly
      // the round-4 per-shard zip.
      val nodesRdd =
        zipNodesRdd(spark, path0, path, meta, neededShards, buckets, bucketSize)
      val byBucket = new org.apache.spark.Partitioner {
        override def numPartitions: Int = nBuckets
        override def getPartition(key: Any): Int =
          bucketIndex(key.asInstanceOf[Int])
      }
      val qRdd = q2.rdd.map(r => (r.getAs[Int]("shard"), r))
        .partitionBy(byBucket).values
      // zip alignment rests on coalesce(1) yielding exactly ONE partition
      // even for an EMPTY shard directory (unused IVF centroid) — true on
      // Spark 4.x via CoalesceExec.EmptyRDDWithPartitions. If a Spark
      // upgrade ever changes that, fail with the invariant's name instead
      // of zipPartitions' opaque "unequal number of partitions".
      require(nodesRdd.getNumPartitions == nBuckets,
        s"nodes RDD has ${nodesRdd.getNumPartitions} partitions, expected " +
          s"$nBuckets (one per shard bucket; empty-shard coalesce(1) must " +
          "still yield one partition)")
      require(qRdd.getNumPartitions == nBuckets,
        s"query RDD has ${qRdd.getNumPartitions} partitions, expected $nBuckets")
      val bIdxBc = spark.sparkContext.broadcast(bucketIndex)
      val resRdd = nodesRdd.zipPartitions(qRdd) { (nodeIt, qIt) =>
        val qs = qIt.toArray
        if (qs.isEmpty) Iterator.empty
        else {
          // materialized on the FIRST cache miss only: a bucket whose every
          // shard is warm in this JVM never reads its node iterator at all
          lazy val nodeByShard: Map[Int, Array[Row]] = {
            val arr = nodeIt.toArray
            // partition alignment is by construction; fail fast if it
            // breaks (an EMPTY shard — unused IVF centroid — is legal and
            // builds an empty searcher)
            val expected = bIdxBc.value(qs(0).getAs[Int]("shard"))
            require(arr.isEmpty ||
              bIdxBc.value(arr(0).getAs[Int]("shard")) == expected,
              s"nodes partition misaligned with query bucket $expected")
            arr.groupBy(_.getAs[Int]("shard"))
          }
          qs.groupBy(_.getAs[Int]("shard")).iterator
            .flatMap { case (shard, shardQs) =>
              answerShard(shard,
                () => nodeByShard.getOrElse(shard, Array.empty), shardQs)
            }
        }
      }
      resRdd
    }

    // final per-query top-k as a MERGEABLE bounded aggregation: map-side
    // combine caps each task's contribution at k rows per query BEFORE the
    // shuffle, so only ~k rows per query cross the wire instead of the
    // nProbe×k per-shard candidates a window row_number merge would shuffle
    // (and there is no sort). Same (dist, row_id) tie-break, the SAME
    // TopKAggregator insert kernel — but run as an RDD aggregateByKey
    // (round 16): the typed groupByKey().agg() form re-paid two Catalyst
    // QueryExecutions plus an AQE stage-materialization round of pure
    // driver overhead on EVERY query, while the RDD form plans nothing and
    // shuffles the identical ≤k-rows-per-(query,task) combiner output.
    val agg = new graft.operators.Similarity.TopKAggregator(k)
    val merged = partial
      .map { case (qid, rid, d) => (qid, (rid, d)) }
      .aggregateByKey(agg.zero)(
        (st, v) => agg.reduce(st, v), (a, b) => agg.merge(a, b))
      .flatMap { case (qid, st) =>
        st.ids.indices.iterator.map(i => Row(qid, st.ids(i), st.dists(i))) }
    spark.createDataFrame(merged, StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("row_id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false))))
  }

  /**
   * Shard-LOCAL radius search: the escalate-until-stable exhaustiveness
   * loop of [[rangeSearchWithStatus]] applied to ONE searcher. Because a
   * row lives in exactly one shard, per-shard exhaustiveness composes: the
   * union of confirmed shard answers IS the confirmed global answer — the
   * property that lets [[rangeSearchDistributed]] run the radius shape
   * over millions of queries with no cross-shard coordination. Returns
   * (in-radius hits, confirmed); `confirmed = false` only when the
   * maxResults cap forced an exit before the in-radius set stabilized.
   */
  private def rangeOnSearcher(searcher: GraphSearcher, qvec: Array[Float],
      qlabels: Array[Short], radius: Double, searchListSize: Int,
      rescore: Int, maxResults: Int, tombstoned: Long => Boolean,
      report: (Array[Float], Array[Float]) => Double): (Seq[(Long, Double)], Boolean) = {
    val rs = searcher.resumable(qvec, qlabels, tombstoned, report)
    escalateRadius(
      (kk, l) => rs.advance(kk, math.max(l, kk), math.max(rescore, l)).toSeq,
      radius, searchListSize, maxResults, searcher.n)
  }

  /**
   * Fully distributed RADIUS search for LARGE query sets — the offline
   * "every row's in-radius matches" workload (positive-pair mining,
   * duplicate sweeps at a distance threshold), the radius twin of
   * [[searchDistributed]]. Same co-location kernel (zip-partitioned
   * pruned shard scans, warm executor searchers, the nodes table never
   * shuffles); per (query, shard) the answer comes from the shard-local
   * escalate-until-stable loop ([[rangeOnSearcher]]), whose per-shard
   * confirmations compose into global exhaustiveness because every row
   * lives in exactly one shard. Routing uses the SOUND triangle-inequality
   * prune over broadcast (centroids, radii) when stored — per query only
   * the shards whose cluster ball can intersect the query ball are
   * visited; hash/unknown-radii indexes fan to every shard.
   *
   * Truncation is LOUD, never silent: a (query, shard) pair whose
   * in-radius set could not be confirmed under `maxResults` (per shard)
   * fails the job with the cap's name unless `strict = false`, which
   * keeps the possibly-partial rows instead. Output: (qid, row_id, dist),
   * exactly one row per in-radius match.
   */
  def rangeSearchDistributed(spark: SparkSession, path0: String,
      queries: DataFrame, radius: Double, searchListSize: Int = 100,
      rescore: Int = 50, tombstones: Set[Long] = Set.empty,
      maxResults: Int = 65536, strict: Boolean = true): DataFrame = {
    val path = resolveRoot(spark, path0)
    val meta = loadMeta(spark, path)
    val metric = Metric(meta.metric)
    val model =
      if (meta.storage == "sbq") SbqModel(meta.modelCount, meta.modelMean, meta.modelM2, meta.bitsPerDim)
      else null
    val report = reportDistFn(metric)
    val shardIds = meta.shardBuildIds
    val cachePath = path0
    val numShards = meta.numShards
    val dimsToIndex = meta.dimsToIndex
    val hasLabels = meta.hasLabels
    val tombBc = spark.sparkContext.broadcast(tombstones)
    val metaBc = spark.sparkContext.broadcast(meta)

    // per-query shard routing, executor-side: the same sound prune as the
    // point path ([[radiusShardsFor]]) over the broadcast meta — soundness
    // means a pruned-away shard provably holds nothing within the radius,
    // so routing can never truncate the answer
    val pruneOn =
      spark.conf.get("graft.knn.range.shardPrune", "true").toBoolean
    val met = metric
    val probeShards = udf((qv: mutable.Seq[Float]) => {
      val m = metaBc.value
      val raw = Option(qv).map(_.toArray)
        .getOrElse(new Array[Float](
          if (m.centroids.nonEmpty) m.centroids(0).length else 1))
      (if (pruneOn) radiusShardsFor(m, met, raw, radius) else None)
        .getOrElse((0 until m.numShards).toArray)
    })
    val hasQLabels = queries.columns.contains("qlabels")
    val q2 = queries.select(col("qid"), col("qvec"),
      (if (hasQLabels) col("qlabels")
       else lit(null).cast(ArrayType(ShortType))).as("qlabels"),
      explode_outer(probeShards(col("qvec"))).as("shard"))
      .filter(col("shard").isNotNull)

    val neededShards: Seq[Int] =
      if (meta.partitioner == "ivf" && pruneOn &&
          meta.shardRadii.length == numShards)
        q2.select("shard").distinct().collect().map(_.getInt(0)).sorted.toSeq
      else 0 until numShards
    import spark.implicits._
    // an empty query batch routes nowhere — zero buckets would make the
    // zip partitioner degenerate, so short-circuit the empty result
    if (neededShards.isEmpty)
      return spark.emptyDataset[(Long, Long, Double)]
        .toDF("qid", "row_id", "dist")
    val sl = searchListSize
    val rc = rescore
    val mr = maxResults
    val strictOn = strict
    def answerShard(shard: Int, nodeRows: () => Array[Row],
        qs: Array[Row]): Iterator[(Long, Long, Double)] = {
      val searcher = GraphSearcher.getOrBuild(
        s"$cachePath#$shard#${shardIds(shard)}",
        () => buildShardSearcher(path, shard, nodeRows(), metric, model,
          hasLabels, dimsToIndex))
      val tomb = tombBc.value
      qs.iterator.flatMap { r =>
        val qid = r.getAs[Long]("qid")
        val qvec = Option(r.getAs[mutable.Seq[Float]]("qvec")).map(_.toArray).orNull
        val qlabels = Option(r.getAs[mutable.Seq[Short]]("qlabels"))
          .map(s => LabelSets.normalize(s.toArray)).orNull
        val (hits, confirmed) = rangeOnSearcher(searcher, qvec, qlabels,
          radius, sl, rc, mr, rid => tomb.contains(rid), report)
        if (!confirmed && strictOn)
          throw new IllegalStateException(
            s"rangeSearchDistributed: query $qid shard $shard hit the " +
              s"graft maxResults cap ($mr) before its in-radius set " +
              "stabilized — raise maxResults, or pass strict=false to " +
              "keep possibly-partial rows")
        hits.iterator.map { case (rid, d) => (qid, rid, d) }
      }
    }
    // same bucketed zip co-location as searchDistributed: nodes never
    // shuffle, only the (pruned) query fan-out does
    val zipMaxShards =
      spark.conf.get("graft.search.zipMaxShards", "4096").toInt
    val bucketSize = math.max(1,
      math.ceil(neededShards.length.toDouble / zipMaxShards).toInt)
    val buckets: IndexedSeq[Seq[Int]] =
      neededShards.grouped(bucketSize).toIndexedSeq
    val nBuckets = buckets.length
    val bucketIndex: Map[Int, Int] = buckets.zipWithIndex
      .flatMap { case (ss, b) => ss.map(_ -> b) }.toMap
    val nodesRdd =
      zipNodesRdd(spark, path0, path, meta, neededShards, buckets, bucketSize)
    val byBucket = new org.apache.spark.Partitioner {
      override def numPartitions: Int = nBuckets
      override def getPartition(key: Any): Int =
        bucketIndex(key.asInstanceOf[Int])
    }
    val qRdd = q2.rdd.map(r => (r.getAs[Int]("shard"), r))
      .partitionBy(byBucket).values
    require(nodesRdd.getNumPartitions == nBuckets,
      s"nodes RDD has ${nodesRdd.getNumPartitions} partitions, expected $nBuckets")
    require(qRdd.getNumPartitions == nBuckets,
      s"query RDD has ${qRdd.getNumPartitions} partitions, expected $nBuckets")
    val bIdxBc = spark.sparkContext.broadcast(bucketIndex)
    val resRdd = nodesRdd.zipPartitions(qRdd) { (nodeIt, qIt) =>
      val qs = qIt.toArray
      if (qs.isEmpty) Iterator.empty
      else {
        lazy val nodeByShard: Map[Int, Array[Row]] = {
          val arr = nodeIt.toArray
          val expected = bIdxBc.value(qs(0).getAs[Int]("shard"))
          require(arr.isEmpty ||
            bIdxBc.value(arr(0).getAs[Int]("shard")) == expected,
            s"nodes partition misaligned with query bucket $expected")
          arr.groupBy(_.getAs[Int]("shard"))
        }
        qs.groupBy(_.getAs[Int]("shard")).iterator
          .flatMap { case (shard, shardQs) =>
            answerShard(shard,
              () => nodeByShard.getOrElse(shard, Array.empty), shardQs)
          }
      }
    }
    // a row lives in exactly one shard: no cross-shard duplicates, no merge
    spark.createDataset(resRdd).toDF("qid", "row_id", "dist")
  }

  /**
   * [[rangeSearchDistributed]] + delta freshness — the radius twin of
   * [[searchDistributedFresh]], same role flip: the query table is the big
   * side and stays distributed, the (compaction-bounded) delta collects
   * once and BROADCASTS; every query partition adds an exact map-side
   * radius pass over it (tombstone-masked, label-filtered with the
   * searchWithDelta rules). A row transiently in both main and delta
   * (compact mid-flight) is collapsed by (qid, row_id) min-dist.
   */
  def rangeSearchDistributedFresh(spark: SparkSession, path0: String,
      queries: DataFrame, delta: DataFrame, radius: Double,
      searchListSize: Int = 100, rescore: Int = 50,
      tombstones: Set[Long] = Set.empty, maxResults: Int = 65536,
      strict: Boolean = true): DataFrame = {
    val meta = loadMeta(spark, resolveRoot(spark, path0))
    val report = reportDistFn(Metric(meta.metric))
    // SNAPSHOT the delta before the main search resolves its generation
    // (the race-with-compact invariant — see searchDistributedFresh)
    val hasDLabels = delta.columns.contains("labels")
    // enforced, not advisory (the knnGraph guard discipline): the limit
    // caps what can reach the driver, one extra row proves oversize
    val maxDeltaBc = spark.conf
      .get("graft.delta.maxBroadcastRows", "2000000").toInt
    val collected = delta.limit(maxDeltaBc + 1).collect()
    require(collected.length <= maxDeltaBc,
      s"rangeSearchDistributedFresh: pending delta exceeds " +
        s"graft.delta.maxBroadcastRows ($maxDeltaBc) — the fresh batch " +
        "paths broadcast the delta, which the compaction contract keeps " +
        "small; fold it with StreamingIngest.compactNow (or enable " +
        "autoCompact), or raise the knob if the driver can hold it")
    val deltaRows: Array[(Long, Array[Float], Array[Short])] =
      collected.map { r =>
        (r.getAs[Long]("row_id"),
          Option(r.getAs[mutable.Seq[Float]]("vec")).map(_.toArray).orNull,
          if (hasDLabels) Option(r.getAs[mutable.Seq[Short]]("labels"))
            .map(s => LabelSets.normalize(s.toArray))
            .getOrElse(Array.emptyShortArray)
          else null)
      }
    val main = rangeSearchDistributed(spark, path0, queries, radius,
      searchListSize, rescore, tombstones, maxResults, strict)
    val dBc = spark.sparkContext.broadcast(deltaRows)
    val tombBc = spark.sparkContext.broadcast(tombstones)
    val hasQLabels = queries.columns.contains("qlabels")
    val q3 = queries.select(col("qid"), col("qvec"),
      (if (hasQLabels) col("qlabels")
       else lit(null).cast(ArrayType(ShortType))).as("qlabels"))
    val resultSchema = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("row_id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))
    val deltaHits = q3.mapPartitions { it =>
      val tomb = tombBc.value
      val dr = dBc.value
      it.flatMap { r =>
        val qid = r.getAs[Long]("qid")
        val qv0 = Option(r.getAs[mutable.Seq[Float]]("qvec")).map(_.toArray).orNull
        val ql = Option(r.getAs[mutable.Seq[Short]]("qlabels"))
          .map(s => LabelSets.normalize(s.toArray)).orNull
        dr.iterator.flatMap { case (rid, v, lbs) =>
          deltaRadiusMatch(rid, v, lbs, qv0, ql, radius, tomb.contains,
            report).map(d => Row(qid, rid, d)).iterator
        }
      }
    }(org.apache.spark.sql.Encoders.row(resultSchema))
    main.unionByName(deltaHits)
      .groupBy(col("qid"), col("row_id")).agg(min(col("dist")).as("dist"))
  }

  /**
   * Search main index + an unindexed delta (micro-batch appends, §3.3 / G9):
   * the delta side is answered by exact brute force and merged into the final
   * top-k. `delta` has columns (row_id, vec [, labels]).
   */
  def searchWithDelta(spark: SparkSession, path: String, queries: DataFrame,
      delta: DataFrame, k: Int, searchListSize: Int = 100, rescore: Int = 50,
      tombstones: Set[Long] = Set.empty,
      metrics: Option[SearchMetrics] = None, nProbe: Int = 0): DataFrame = {
    val meta = loadMeta(spark, path)
    val metric = Metric(meta.metric)
    val report = reportDistFn(metric)
    val main = search(spark, path, queries, k, searchListSize, rescore,
      tombstones, metrics, nProbe)

    val hasQLabels = queries.columns.contains("qlabels")
    val hasDLabels = delta.columns.contains("labels")
    val qRows = queries.collect().map { r =>
      (r.getAs[Long]("qid"),
        // null query vector => zero-vector search, same as the main path
        // (labels/mod.rs:214-216)
        Option(r.getAs[mutable.Seq[Float]]("qvec")).map(_.toArray).orNull,
        if (hasQLabels) Option(r.getAs[mutable.Seq[Short]]("qlabels"))
          .map(s => LabelSets.normalize(s.toArray)).orNull
        else null)
    }
    val qBc = spark.sparkContext.broadcast(qRows)
    val tombBc = spark.sparkContext.broadcast(tombstones)
    val resultSchema = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("row_id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))

    val deltaHits = delta.mapPartitions { it =>
      val tomb = tombBc.value
      it.flatMap { r =>
        val rid = r.getAs[Long]("row_id")
        if (tomb.contains(rid)) Iterator.empty
        else {
          val v = r.getAs[mutable.Seq[Float]]("vec").toArray
          val lbs = if (hasDLabels) Option(r.getAs[mutable.Seq[Short]]("labels"))
            .map(s => LabelSets.normalize(s.toArray)).getOrElse(Array.emptyShortArray)
          else null
          qBc.value.iterator.flatMap { case (qid, qv0, ql) =>
            val qv = if (qv0 == null) new Array[Float](v.length) else qv0
            val ok = ql == null || (lbs != null && LabelSets.overlaps(lbs, ql))
            if (ok) Iterator.single(Row(qid, rid, report(v, qv))) else Iterator.empty
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(resultSchema))

    main.unionByName(deltaHits)
      // a row may transiently exist in BOTH the main graph and the delta
      // (compaction folded the delta in, its file delete not yet visible);
      // collapse by row_id so the top-k never contains duplicates
      .groupBy(col("qid"), col("row_id")).agg(min(col("dist")).as("dist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist"), col("row_id"))))
      .filter(col("rnk") <= k)
      .drop("rnk")
  }

  /**
   * Exact radius pass over an UNINDEXED delta (the radius twin of
   * [[searchWithDelta]]'s delta kernel): every delta row within `radius`
   * of the query in REPORT distance, tombstone-masked, label-filtered with
   * the same empty-set/null rules as the graph traversal
   * (labels/mod.rs:188-204). One map-side job over the (small-by-the-
   * compaction-contract) delta snapshot; the result collects because the
   * caller ([[graft.streaming.StreamingIngest.rangeSearchFresh]]) merges
   * it with the driver-side graph hits — both are bounded by the
   * maxResults discipline above this.
   */
  /** Score one delta row against one radius query — THE definition of the
    * delta-side radius semantics (tombstone mask, null-vector row skip,
    * searchWithDelta's label rules incl. unlabeled-delta-vs-labeled-query
    * = no match, null query = zero-vector search, labels/mod.rs:214-216),
    * shared by [[rangeOverDelta]] and [[rangeSearchDistributedFresh]] so
    * the two fresh radius paths can never drift. `lbs` must already be
    * normalized (null = delta has no labels column), `ql` likewise. */
  private def deltaRadiusMatch(rid: Long, v: Array[Float],
      lbs: Array[Short], qv0: Array[Float], ql: Array[Short],
      radius: Double, tombstoned: Long => Boolean,
      report: (Array[Float], Array[Float]) => Double): Option[Double] =
    if (tombstoned(rid) || v == null) None
    else if (!(ql == null || (lbs != null && LabelSets.overlaps(lbs, ql))))
      None
    else {
      val qv = if (qv0 == null) new Array[Float](v.length) else qv0
      val d = report(v, qv)
      if (d <= radius) Some(d) else None
    }

  private[graft] def rangeOverDelta(spark: SparkSession, path: String,
      delta: DataFrame, qvec: Array[Float], radius: Double,
      qlabels: Array[Short] = null,
      tombstones: Set[Long] = Set.empty,
      /** driver-boundedness: the collect below is capped at maxResults + 1
        * rows (a Spark-side limit, so overflow never reaches the driver) —
        * one extra row lets [[graft.streaming.StreamingIngest
        * .rangeSearchFresh]] detect the overflow and return unconfirmed
        * (its caller's exact-scan bail), the same loud-truncation
        * discipline as the graph side's cap. 0 = uncapped (tests). */
      maxResults: Int = 0): Seq[(Long, Double)] = {
    val meta = loadMeta(spark, path)
    val report = reportDistFn(Metric(meta.metric))
    val hasDLabels = delta.columns.contains("labels")
    val nq = Option(qlabels).map(l => LabelSets.normalize(l.clone())).orNull
    val tombBc = spark.sparkContext.broadcast(tombstones)
    val qv0 = qvec
    val hitsDs = delta.mapPartitions { it =>
      val tomb = tombBc.value
      it.flatMap { r =>
        val rid = r.getAs[Long]("row_id")
        // tombstone short-circuit BEFORE materializing the vector/labels:
        // a heavily-tombstoned delta would otherwise pay an array copy +
        // label normalize per masked row for no output (the kernel
        // re-checks — harmless)
        if (tomb.contains(rid)) Iterator.empty
        else {
          val v = Option(r.getAs[mutable.Seq[Float]]("vec")).map(_.toArray).orNull
          val lbs = if (hasDLabels) Option(r.getAs[mutable.Seq[Short]]("labels"))
            .map(s => LabelSets.normalize(s.toArray))
            .getOrElse(Array.emptyShortArray)
          else null
          deltaRadiusMatch(rid, v, lbs, qv0, nq, radius, tomb.contains, report)
            .map(rid -> _).iterator
        }
      }
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaDouble))
    (if (maxResults > 0) hitsDs.limit(maxResults + 1) else hitsDs)
      .collect().toSeq
  }

  /**
   * [[searchDistributed]] + delta freshness — the offline BATCH twin of
   * [[searchWithDelta]], closing the freshness gap where a large offline
   * job had to run `compact()` first to see recent appends. The roles flip
   * versus the online path: there the (small) query batch broadcasts and
   * the delta is scanned; here the query table is the big side, so the
   * delta — small versus the index by the compaction contract — collects
   * once and BROADCASTS, and every query partition scores it map-side with
   * a bounded per-query top-k heap. No extra shuffle of the query table;
   * the only added wide op is the final ≤2k-rows-per-query re-merge
   * through the same mergeable [[graft.operators.Similarity.TopKAggregator]].
   * A delta too large to broadcast is the signal to compact, not to
   * distribute this differently.
   */
  def searchDistributedFresh(spark: SparkSession, path0: String,
      queries: DataFrame, delta: DataFrame, k: Int,
      searchListSize: Int = 100, rescore: Int = 50,
      tombstones: Set[Long] = Set.empty, nProbe: Int = 0): DataFrame = {
    // SNAPSHOT the delta BEFORE the main search resolves its generation
    // (the race-with-compact invariant, see StreamingIngest.searchFresh): a
    // compact landing after this collect moves these same rows into the
    // generation the main search then resolves — duplicates collapse below,
    // nothing is lost. Collecting after resolving can lose rows.
    val hasDLabels = delta.columns.contains("labels")
    val hasQLabels = queries.columns.contains("qlabels")
    // sort + dedup by row_id: foreachBatch ingest is at-least-once, so a
    // retried micro-batch appends the same row twice — without the dedup,
    // both copies enter the bounded heap and can evict a DISTINCT true
    // neighbor from the top-k (the online twin collapses by row_id before
    // ranking and is immune)
    // enforced, not advisory (the knnGraph guard discipline): the limit
    // caps what can reach the driver, one extra row proves oversize
    val maxDeltaBc = spark.conf
      .get("graft.delta.maxBroadcastRows", "2000000").toInt
    val collected =
      delta.filter(col("vec").isNotNull).limit(maxDeltaBc + 1).collect()
    require(collected.length <= maxDeltaBc,
      s"searchDistributedFresh: pending delta exceeds " +
        s"graft.delta.maxBroadcastRows ($maxDeltaBc) — the fresh batch " +
        "paths broadcast the delta, which the compaction contract keeps " +
        "small; fold it with StreamingIngest.compactNow (or enable " +
        "autoCompact), or raise the knob if the driver can hold it")
    val deltaRows: Array[(Long, Array[Float], Array[Short])] =
      collected.map { r =>
        (r.getAs[Long]("row_id"), r.getAs[mutable.Seq[Float]]("vec").toArray,
          if (hasDLabels) Option(r.getAs[mutable.Seq[Short]]("labels"))
            .map(s => LabelSets.normalize(s.toArray)).getOrElse(Array.emptyShortArray)
          else null)
      }.filterNot { case (rid, _, _) => tombstones.contains(rid) }
        .sortBy(_._1).distinctBy(_._1)

    val meta = loadMeta(spark, path0)
    val report = reportDistFn(Metric(meta.metric))
    val main = searchDistributed(spark, path0, queries, k, searchListSize,
      rescore, tombstones, nProbe)
    val dBc = spark.sparkContext.broadcast(deltaRows)
    val resultSchema = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("row_id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))
    val deltaHits = queries.mapPartitions { it =>
      val d = dBc.value
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      it.flatMap { r =>
        val qid = r.getAs[Long]("qid")
        val qv0 = Option(r.getAs[mutable.Seq[Float]]("qvec")).map(_.toArray).orNull
        val ql = if (hasQLabels) Option(r.getAs[mutable.Seq[Short]]("qlabels"))
          .map(s => LabelSets.normalize(s.toArray)).orNull else null
        // bounded per-query heap: only k delta rows leave the partition
        val heap = mutable.PriorityQueue.empty[(Double, Long)](ord)
        d.foreach { case (rid, v, lbs) =>
          val ok = ql == null || (lbs != null && LabelSets.overlaps(lbs, ql))
          if (ok) {
            val qv = if (qv0 == null) new Array[Float](v.length) else qv0
            val dist = report(v, qv)
            if (heap.size < k) heap.enqueue((dist, rid))
            else if (ord.lt((dist, rid), heap.head)) {
              heap.dequeue(); heap.enqueue((dist, rid))
            }
          }
        }
        heap.iterator.map { case (dist, rid) => Row(qid, rid, dist) }
      }
    }(org.apache.spark.sql.Encoders.row(resultSchema))

    // collapse transient main∩delta duplicates (min dist per (qid, row_id)),
    // then the same bounded mergeable top-k merge as searchDistributed —
    // no sort, ~k rows/query; run as RDD ops with the same TopKAggregator
    // insert kernel (round 16): the typed groupBy/groupByKey form re-paid
    // two Catalyst plans + AQE stage materializations per query
    val agg = new graft.operators.Similarity.TopKAggregator(k)
    val merged = main.rdd.union(deltaHits.rdd)
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .reduceByKey((a, b) => math.min(a, b))
      .map { case ((qid, rid), d) => (qid, (rid, d)) }
      .aggregateByKey(agg.zero)(
        (st, v) => agg.reduce(st, v), (a, b) => agg.merge(a, b))
      .flatMap { case (qid, st) =>
        st.ids.indices.iterator.map(i => Row(qid, st.ids(i), st.dists(i))) }
    spark.createDataFrame(merged, resultSchema)
  }

  /** Index introspection (V2, vacuum.rs:138-157 page-count analog): size and
    * degree statistics computed with a single distributed aggregation. */
  case class IndexStats(numRows: Long, numShards: Int, numEdges: Long,
      avgDegree: Double, maxDegree: Int, metric: String, storage: String,
      bitsPerDim: Int)

  def stats(spark: SparkSession, path0: String): IndexStats = {
    val path = resolveRoot(spark, path0)
    val meta = loadMeta(spark, path)
    val row = nodesDf(spark, path, meta, 0 until meta.numShards)
      .agg(count(lit(1)).as("n"), sum(size(col("neighbors"))).as("edges"),
        max(size(col("neighbors"))).as("maxdeg"))
      .head()
    val n = row.getLong(0)
    val edges = row.getLong(1)
    IndexStats(n, meta.numShards, edges,
      if (n == 0) 0.0 else edges.toDouble / n, row.getInt(2),
      meta.metric, meta.storage, meta.bitsPerDim)
  }

  /** Debug graph dump in DOT format (V6, graph/mod.rs:535-635 /
    * debugging.rs:12-50): one shard, capped at `maxNodes` nodes. Dev-only. */
  def toDot(spark: SparkSession, path0: String, shard: Int = 0,
      maxNodes: Int = 200): String = {
    val path = resolveRoot(spark, path0)
    val rows = nodesDf(spark, path, loadMetaAt(spark, path), Seq(shard))
      .filter(col("node") < maxNodes)
      .select(col("node"), col("row_id"), col("neighbors"))
      .collect()
      .sortBy(_.getInt(0))
    val sb = new StringBuilder(s"digraph shard$shard {\n")
    rows.foreach { r =>
      val node = r.getInt(0)
      sb.append(s"""  n$node [label="${r.getLong(1)}"];\n""")
      r.getAs[mutable.Seq[Int]](2).foreach { t =>
        if (t < maxNodes) sb.append(s"  n$node -> n$t;\n")
      }
    }
    sb.append("}\n").toString
  }

  /** Graph-connectivity check (V6 / §4.3 gate 3a, build.rs:1717-1753): BFS
    * from each shard's start node over its adjacency, summed across shards.
    * Distributed: each shard's BFS runs inside its own task; only one count
    * per shard crosses the wire. A healthy index returns `numRows`. */
  def reachableCount(spark: SparkSession, path0: String): Long = {
    import spark.implicits._
    val path = resolveRoot(spark, path0)
    val meta = loadMetaAt(spark, path)
    nodesDf(spark, path, meta, 0 until meta.numShards)
      .select(col("shard"), col("node"), col("neighbors"))
      .groupByKey(_.getAs[Int]("shard"))
      .mapGroups { (_, it) =>
        val adj = mutable.Map.empty[Int, Array[Int]]
        it.foreach(r => adj(r.getAs[Int]("node")) = r.getAs[mutable.Seq[Int]]("neighbors").toArray)
        val seen = mutable.BitSet(0)
        val queue = mutable.Queue(0)
        while (queue.nonEmpty) {
          adj.getOrElse(queue.dequeue(), Array.emptyIntArray).foreach { t =>
            if (seen.add(t)) queue.enqueue(t)
          }
        }
        seen.size.toLong
      }
      .reduce(_ + _)
  }

  /**
   * The built Vamana graph as a row-id edge list `(src: long, dst: long)` —
   * "the graph IS the index" (reference: the neighbor lists of
   * graph/mod.rs:212-266 are the whole data structure). This is the 100 TB
   * input for the link-analysis operators ([[graft.operators.GraphOps]]):
   * instead of materializing a kNN graph with a quadratic join, reuse the
   * out-edges the index build already paid for.
   *
   * Shape: one explode + one equi-join on `(shard, node)` to translate
   * neighbor positions back to row ids — both sides are partition-pruned
   * scans of the same nodes table, no driver state, no broadcast of
   * anything corpus-sized. Edges are within-shard by construction (each
   * shard is an independent sub-graph), so the join never crosses shards.
   *
   * Reflects the COMPACTED graph: delta-appended rows (G9) have no
   * neighbor lists until compaction folds them in, and tombstoned rows
   * still carry their structural edges (they route traversal; callers
   * curating on rank should anti-join their own tombstone set).
   */
  def edges(spark: SparkSession, path0: String): DataFrame = {
    val path = resolveRoot(spark, path0)
    val meta = loadMetaAt(spark, path)
    val nodes = nodesDf(spark, path, meta, 0 until meta.numShards)
    val dstIds = nodes.select(col("shard"), col("node"),
      col("row_id").as("dst"))
    nodes.select(col("shard"), col("row_id").as("src"),
        explode(col("neighbors")).as("node"))
      .join(dstIds, Seq("shard", "node"))
      .select(col("src"), col("dst"))
  }
}
