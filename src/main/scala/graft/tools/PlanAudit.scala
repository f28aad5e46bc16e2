package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit for the headline queries: prints `explain("formatted")`
  * and greps the properties that matter at 100 TB — parquet `PushedFilters`,
  * pruned `ReadSchema`, broadcast joins on small dims, and whole-stage
  * codegen coverage. Run with an sf dir argument (default sf0.001):
  *
  *   sbt 'runMain graft.tools.PlanAudit /root/testdata/sf0.001'
  *
  * [audit] lines summarize each query; the full plans follow for reading.
  */
object PlanAudit {

  private val audited = Seq(
    // relational/aggregation surface: pushdown + pruning + codegen
    "q1_agg", "join_region_revenue", "top_users_window", "events_hourly",
    // vector surface: expressions must live inside codegen stages
    "knn_exact_cosine", "vector_norms",
    // pipeline surface
    "dedup_exact", "token_counts", "dedup_minhash", "dedup_simhash",
    "neardup_embedding_lsh",
    // curation surface: sampling must stay map-side, decontam must broadcast
    // the eval side, vocab must keep a partial aggregate below the shuffle
    "sample_stratified", "decontam_overlap", "vocab_topk", "pii_scrub",
    // mixture/packing/quality/tf-idf: gopher must stay map-side, mixture's
    // rate table and tf-idf's N must broadcast, packing shuffles once
    "gopher_quality", "sample_mixture", "pack_sequences", "tfidf_topk",
    // span dedup shuffles hash partials once; the composed pipeline keeps
    // the gate map-side and the packing bucket shuffle as its only wide op
    "dup_spans", "pipeline_pretrain",
    // LM model tables must broadcast to the scoring join; the incremental
    // dedup must broadcast the batch side; quant/range stay map-side
    "lm_score", "dedup_incremental", "embed_quant_int8", "knn_range",
    // ANN surface: routed + distributed paths
    "ann_ivf_routed", "knn_ann_batch",
    // round 4: as-of must be one window shuffle with pushed type filters;
    // semantic dedup one cluster-key join; chunk/ngram dedup must keep
    // partial aggregation below their window shuffles
    "asof_attribution", "semantic_dedup", "dedup_chunks", "dup_ngram_coverage",
    // round 6: repetition + DSIR must stay map-side below one bounded
    // aggregation; RRF's windows must sit above TakeOrderedAndProject;
    // funnel/retention joins must be AQE-broadcast or user_id-shuffle only
    "gopher_repetition", "dsir_weights", "dsir_resample", "hybrid_rrf",
    "funnel_steps", "retention_cohorts", "dedup_span_removal",
    "quality_adaptive", "sample_epochs", "tokenizer_fertility",
    // round 6 (cont.): maxsim's query bag and knn-vote/hard-neg queries
    // must broadcast below partial top-k aggregations; split/covariance
    // stay map-side into one bounded aggregation; heaps' window must run
    // over checkpoint buckets, not docs
    "maxsim_topk", "knn_label_vote", "hard_negatives", "split_assign",
    "embed_covariance", "centroid_shift", "heaps_law", "mmr_diversify",
    // round 6 (cont. 2): the distribution suite must keep its vocab/
    // threshold tables broadcast and its folds bounded; anomaly stats join
    // one row per type; contrastive/retrieval kernels as above
    "feature_hash", "source_kl", "zipf_fit", "embed_dim_mad",
    "embed_outliers", "events_anomaly", "contrastive_triplets",
    "retrieval_metrics", "hubness_audit", "bpe_fertility",
    // round 6 (third pass): q3's customer side must broadcast under pushed
    // date filters; shard/time-decay stay one combined aggregation;
    // transitions one lag window + tiny count table; winnow posting join
    // and frame-hash count must keep partial aggregation below their
    // shuffles; the LM matrix joins type tables with a broadcast source
    // list; quantile-norm ranks only within source partitions
    "q3_shipping", "event_transitions", "shard_plan", "time_decay_score",
    "quality_quantile_norm", "winnow_pairs", "multimodal_frame_dedup",
    "source_lm_matrix", "embed_winsorize", "cluster_topics",
    "minhash_est_audit",
    // round 7: index-graph surface — edge export must be one explode + one
    // within-shard join (nothing corpus-sized broadcast); distributed
    // PageRank/label-prop cost one join + one combined aggregation per
    // round; user_rfm must bucket map-side below ONE tiny broadcast
    // threshold aggregate (no global rank window)
    "graph_pagerank_index", "label_propagation_index",
    "authority_curate_index", "index_in_degree", "user_rfm",
    // round 7 (cont.): KMV sketches must be ONE partial-aggregated shuffle
    // over the token scan (no distinct, no vocabulary-sized join); the
    // overlap post-processing and gap-fill grid/window are bounded
    // (sketch-sized / calendar-sized); exact-k must be a bounded aggregate
    // + broadcast semi-join, not a per-stratum sort
    "kmv_vocab_distinct", "kmv_vocab_overlap", "events_gapfill",
    "sample_exact_k",
    // round 7 (cont. 2): edge-list rescoring joins bounded candidate pairs
    // (nodes×R) against the embeddings table — partial top-20 above, no
    // pairwise blow-up
    "neardup_index_pairs",
    // round 7 (cont. 3): the text-index serving scans must carry PARTITION
    // filters (bucket pruning) with the stats side broadcast; the batch
    // variant adds one broadcast of the (qid, term) pairs and its rank
    // window must partition by qid; phrase search joins pruned posting
    // lists on id (broadcast/AQE), adjacency stays in the row; zorder_key
    // is one broadcast stats row + pure map-side bit arithmetic
    "bm25_indexed", "bm25_batch", "phrase_search", "hybrid_rrf_stored",
    "zorder_key",
    // round 7 (cont. 4): chunk retrieval keeps the pruned-posting shape
    // over the chunk table; the dedup-index probe broadcasts only batch
    // bands; the quality pair must be ONE aggregate pass each; the salted
    // join's keys must include the salt column
    "bm25_chunks", "dedup_incremental_index", "data_profile",
    "dq_expectations", "salted_join",
    // round 10: the SQL radius rewrite must plan KnnRangeScan under one
    // FilterExec recheck (no corpus scan); the tier-fold query's serving
    // plan is the standard pruned ANN shape over the folded generation
    "knn_range_sql", "ann_tier_fold",
    // round 11: the radius rewrite must STAY KnnRangeScan under pending
    // delta + tombstones (the rangeSearchFresh merge), never regress to
    // the corpus scan whenever appends pend
    "knn_range_sql_fresh")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // AQE query stages are leaf nodes in the plan tree — descend into them
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }

    audited.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE so the executed plan carries codegen stages
      val nodes = flatten(df.queryExecution.executedPlan)
      val codegenStages = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
      val broadcasts = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
      val shuffles = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val pushed = formatted.linesIterator.count(l =>
        l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
      println(s"[audit] $name pushedFilterScans=$pushed codegenStages=$codegenStages " +
        s"broadcastJoins=$broadcasts shuffles=$shuffles")
      println(formatted)
      graft.CacheScope.releaseAll() // free operator-internal persists per query
    }
  }
}
