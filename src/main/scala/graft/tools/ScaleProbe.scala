package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

/**
 * Empirical scaling probe: times the scale-risky operators on ×1, ×10 and
 * ×100 replicas of the sf0.1 documents/embeddings tables and prints the
 * measured scaling exponents. The point is to turn "would this plan hold at
 * 100×?" into data: a near-1.0 exponent on the ×10→×100 leg means the
 * operator's cost is linear in corpus size with the fixed driver/JIT
 * overhead amortized away.
 *
 * Replicas are PERTURBED so the probe measures capacity, not degenerate
 * duplicate structure: each document replica's tokens are re-ordered by
 * md5(token, replica) — same token multiset, disjoint shingle sets, so
 * MinHash-LSH sees a realistic (mostly non-duplicate) corpus instead of an
 * every-doc-has-99-twins pathology; each embedding replica gets a
 * deterministic per-element hash offset. Probe tables are materialized once
 * under /tmp/graft_scaleprobe and reused.
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "/tmp/graft_scaleprobe"

    def docsPath(f: Int) = s"$root/docs_x$f"
    def embPath(f: Int) = s"$root/emb_x$f"

    def ensureDocs(f: Int): Unit = {
      if (new java.io.File(s"${docsPath(f)}/_SUCCESS").exists()) return
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val reps = (0 until f).map { i =>
        if (i == 0) base
        else base
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10_000_000L))
          // per-replica deterministic token re-order: same multiset,
          // different shingles → replicas are NOT near-dups of each other
          .withColumn("text", array_join(
            transform(
              array_sort(transform(TextAnalysis.tokens(col("text")),
                t => struct(md5(concat(t, lit(i.toString))).as("k"), t.as("t")))),
              s => s.getField("t")),
            " "))
      }
      reps.reduce(_ unionAll _).repartition(32)
        .write.mode("overwrite").parquet(docsPath(f))
    }

    def ensureEmb(f: Int): Unit = {
      if (new java.io.File(s"${embPath(f)}/_SUCCESS").exists()) return
      val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val reps = (0 until f).map { i =>
        if (i == 0) base
        else base
          .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10_000_000L))
          .withColumn("embedding", transform(col("embedding"),
            (x, j) => (x + (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(1000L))
              .cast("double") - 500.0) / 50000.0).cast("float")))
      }
      reps.reduce(_ unionAll _).repartition(32)
        .write.mode("overwrite").parquet(embPath(f))
    }

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // one JSON map per op: factor -> (sec, result rows) — result rows make
    // output-size growth visible next to time growth
    val ops: Seq[(String, Int => Long)] = Seq(
      "dedup_exact" -> { f =>
        Dedup.exactDedup(spark.read.parquet(docsPath(f)), "doc_id", "text").count()
      },
      // Both LSH geometries, with the bucket cap (the cap is the PRODUCTION
      // configuration at corpus scale — the uncapped probe run spilled
      // >25 GB in one sort-merge join at ×100 before dying). r = rows/band
      // sets the S-curve: r=4 (64 hashes/16 bands) admits the corpus's
      // templated mid-similarity background (P(band collision) = j^4 ≈ 2.6%
      // at j=0.4), so candidates grow ~quadratically until capped; r=8
      // (128/16) suppresses it (j^8 ≈ 0.07%) for the same true-pair recall.
      // Numbers + analysis in SCALING.md §"Measured scaling probe".
      "dedup_minhash_r4" -> { f =>
        Dedup.minhashNearDupPairs(spark.read.parquet(docsPath(f)), "doc_id",
          "text", shingleSize = 3, numHashes = 64, bands = 16,
          threshold = 0.8, maxBucketSize = 200).count()
      },
      "dedup_minhash_r8" -> { f =>
        Dedup.minhashNearDupPairs(spark.read.parquet(docsPath(f)), "doc_id",
          "text", shingleSize = 3, numHashes = 128, bands = 16,
          threshold = 0.8, maxBucketSize = 200).count()
      },
      "chunk_sliding" -> { f =>
        TextAnalysis.slidingChunks(spark.read.parquet(docsPath(f)), "doc_id",
          "text", 200, 150).count()
      },
      "gopher_quality" -> { f =>
        TextAnalysis.gopherQuality(spark.read.parquet(docsPath(f)), "doc_id",
          "text").filter(col("passes")).count()
      },
      "cms_heavy_ngrams" -> { f =>
        TextAnalysis.cmsNgramEstimates(spark.read.parquet(docsPath(f)), "text")
          .count()
      },
      "sparse_topk" -> { f =>
        val e = spark.read.parquet(embPath(f))
        val q = e.filter(col("vec_id") === 0).select(col("embedding"))
          .head().getSeq[Float](0).toArray
        Similarity.sparseDotTopK(e.filter(col("vec_id") =!= 0), "vec_id",
          "embedding", q, 0.15, 10).count()
      },
      "knn_exact_cosine" -> { f =>
        val e = spark.read.parquet(embPath(f))
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qvec"))
        graft.functions.VectorFunctions.register(spark)
        e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
          .select(col("vec_id"),
            graft.functions.VectorFunctions
              .vec_cosine_dist(col("embedding"), col("qvec")).as("d"))
          .orderBy(col("d"), col("vec_id")).limit(10).count()
      },
      // round 6: per-doc n-gram counting is map-side (expect ~1.0) and the
      // DSIR LM table is constant-size (buckets) regardless of corpus —
      // the per-doc scoring join is the only part that grows
      // the data-dependent filters exist to defeat column pruning: a bare
      // count() lets Catalyst drop the projection and time only the scan
      "gopher_repetition" -> { f =>
        TextAnalysis.gopherRepetition(spark.read.parquet(docsPath(f)),
          "doc_id", "text").filter(col("dup5gram_char_frac") >= 0).count()
      },
      "dsir_weights" -> { f =>
        graft.operators.Curation.dsirWeights(spark.read.parquet(docsPath(f)),
          "doc_id", "text", col("lang") === "en")
          .filter(col("dsir_weight").isNotNull).count()
      },
      // round 6 (cont.): fixed query bags — the probe grows the CORPUS side
      // only, so a linear exponent means linear-in-corpus, not linear×queries
      "maxsim_topk" -> { f =>
        val e = spark.read.parquet(embPath(f))
        Similarity.maxsimTopK(
          e.filter(col("vec_id") >= 8)
            .select(floor(col("vec_id") / 8).cast("long").as("doc"),
              col("embedding").as("vec")),
          e.filter(col("vec_id") < 4)
            .select(col("vec_id").as("q_ix"), col("embedding").as("qvec")),
          topK = 10).count()
      },
      "hard_negatives" -> { f =>
        val e = spark.read.parquet(embPath(f))
        Similarity.hardNegatives(
          e.filter(col("vec_id") >= 64)
            .select(col("vec_id").as("id"), col("embedding").as("vec"),
              col("label")),
          e.filter(col("vec_id") < 64)
            .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
              col("label").as("qlabel")),
          k = 5,
          (a, b) => graft.functions.VectorFunctions.vec_cosine_dist(a, b))
          .count()
      },
      "heaps_law" -> { f =>
        TextAnalysis.heapsLaw(spark.read.parquet(docsPath(f)), "doc_id",
          "text", bucketDocs = 50).filter(col("cum_vocab") >= 0).count()
      },
      "embed_covariance" -> { f =>
        Similarity.covarianceAudit(spark.read.parquet(embPath(f)),
          "embedding", dims = 8).filter(col("cov").isNotNull).count()
      },
      // round 6 (cont. 2): winnow pair-join cost is governed by the
      // posting cap (quadratic per posting, ≤100 wide); the LM matrix
      // grows with per-source TYPE counts (Heaps-sublinear), not tokens
      "winnow_pairs" -> { f =>
        val n = TextAnalysis.winnowPairs(spark.read.parquet(docsPath(f)),
          "doc_id", "text", maxPosting = 100, topN = 20).count()
        graft.CacheScope.releaseAll() // drop capped-posting blocks per factor
        n
      },
      "source_lm_matrix" -> { f =>
        val n = TextAnalysis.crossSourceLmMatrix(spark.read.parquet(docsPath(f)),
          "text", "source").filter(col("cross_entropy").isNotNull).count()
        graft.CacheScope.releaseAll() // drop the per-source count-table blocks
        n
      },
      // round 6 (cont. 2): the DISTRIBUTED PageRank path (driver fast path
      // forced off) on a synthetic 5-out-regular graph that grows with f —
      // 3 iterations of join + combined aggregation; the kNN-graph edge
      // GENERATION is probed separately by the ANN path (broadcast-bounded
      // exact kernel at small n, index out-edges at scale)
      // round 7: KMV sketch end-to-end (hash → per-source sketch → pairwise
      // overlap). Expect ~1.0: one scan + one O(k)-partial shuffle; the
      // overlap stage is sketch-sized (nPairs×2k) regardless of corpus.
      "kmv_vocab_sketch" -> { f =>
        val hashed = spark.read.parquet(docsPath(f))
          .select(col("source"),
            explode_outer(TextAnalysis.tokens(col("text"))).as("tok"))
          .filter(col("tok").isNotNull)
          .select(col("source"),
            graft.operators.Curation.md5Low60(col("tok")).as("h"))
        val sk = graft.operators.Sketches.kmvSketches(hashed, "source", "h", 256)
        graft.operators.Sketches.kmvOverlap(sk, "source", 256).count()
      },
      // round 7: the COMPOSED pretrain pipeline end-to-end (gopher gate →
      // budgeted mixture sample → sequence packing) — the plan a real run
      // executes, not an isolated operator. Gate+sample are map-side over
      // one tokenize; packing's bucket shuffle is the only wide op.
      "pipeline_pretrain" -> { f =>
        val base = spark.read.parquet(docsPath(f))
        val kept = TextAnalysis.gopherQuality(base, "doc_id", "text",
          minTokens = 40, maxTokens = 150, keep = Seq("source"))
          .filter(col("passes"))
          .select(col("doc_id"), col("source"), col("n_tokens"))
          .transform(graft.CacheScope.persist)
        val sampled = graft.operators.Curation.mixtureSample(kept, "doc_id",
          "source", col("n_tokens"), budgets = Map("src0" -> 2000L * f),
          defaultBudget = 600L * f, seed = "pre42")
        val n = graft.operators.Curation.packSequences(sampled, "doc_id",
          col("n_tokens"), budget = 256, nBuckets = 4 * f, seed = "prepack42")
          .count()
        graft.CacheScope.releaseAll()
        n
      },
      // round 7: exact-k sampling on the aggregator path — the per-stratum
      // sort this replaced would grow superlinearly in the largest stratum
      "exact_k_per_stratum" -> { f =>
        graft.operators.Curation.exactKPerStratum(
          spark.read.parquet(docsPath(f)), "doc_id", "source", 1000,
          "probe7").count()
      },
      // round 7 (cont. 2): the stored text index. Build should track the
      // corpus (~1.0 — one tokenize+shuffle per batch); SERVING should grow
      // only with the query terms' posting lists (df growth ≈ linear in
      // corpus for common terms, but the scan stays pruned to ≤3 of 64
      // buckets — the probe verifies serving cost stays a small fraction
      // of a corpus pass). Ops run in declaration order, so the build leg
      // materializes each factor's artifact before the search leg times it.
      "text_index_build" -> { f =>
        val p = s"$root/textidx_x$f"
        graft.operators.TextIndex.buildTextIndex(
          spark.read.parquet(docsPath(f)), "doc_id", "text", p)
        spark.read.parquet(s"$p/corpusstats")
          .agg(sum(col("n"))).head().getLong(0)
      },
      "text_index_search" -> { f =>
        graft.operators.TextIndex.bm25SearchIndexed(spark,
          s"$root/textidx_x$f", Seq("vector", "query", "dup"), n = 20).count()
      },
      // the batch path amortizes ONE pass over 8 queries' posting lists;
      // per-query cost should undercut 8 single-query calls
      "text_index_batch8" -> { f =>
        val bags = (0 until 8).map(i => (i.toLong,
          Seq("vector", "query", "dup", "table", "hash", "join", "big",
            "data").drop(i % 5).take(3)))
        graft.operators.TextIndex.bm25SearchIndexedBatch(spark,
          s"$root/textidx_x$f",
          spark.createDataFrame(bags).toDF("qid", "terms"), n = 20).count()
      },
      // round 7 (cont. 2): Z-order rewrite is one range shuffle (expect
      // ~1.0 with files scaled to hold per-file size constant); the pruned
      // read touches ~box-fraction of rows via the file manifest, so its
      // absolute time should stay a small fraction of the write's
      "zorder_write" -> { f =>
        val n = 100_000L * f
        val df = spark.range(n).select(col("id"),
          pmod(xxhash64(col("id"), lit(1)), lit(1000L)).cast("double").as("a"),
          pmod(xxhash64(col("id"), lit(2)), lit(1000L)).cast("double").as("b"))
        graft.operators.Layout.zorderWrite(df, Seq("a", "b"),
          s"$root/zorder_x$f", nFiles = 16 * f)
        n
      },
      "zonemap_pruned_read" -> { f =>
        graft.operators.Layout.prunedRead(spark, s"$root/zorder_x$f",
          Seq(("a", 100.0, 200.0), ("b", 100.0, 200.0))).count()
      },
      // round 7 (cont. 3): the STORED dedup index. Build = the corpus
      // shingle+sign pass, paid once; the PROBE re-shingles only a fixed
      // 64-doc batch and broadcasts its bands against the stored table —
      // its cost should track the stored bands SCAN (linear bytes, tiny
      // constant), not corpus shingling (compare: dedup_minhash_r8 pays
      // 34.6s at x100; the probe should stay in single digits)
      "dedup_index_build" -> { f =>
        val p = s"$root/dedupidx_x$f"
        graft.operators.Dedup.buildDedupIndex(
          spark.read.parquet(docsPath(f)), "doc_id", "text", p,
          numHashes = 128, bands = 16)
        graft.CacheScope.releaseAll()
        spark.read.parquet(s"$p/bands").count()
      },
      "dedup_index_probe" -> { f =>
        val batch = spark.read.parquet(docsPath(1)).limit(64)
          .withColumn("doc_id", col("doc_id") + 900000000L)
        val n = graft.operators.Dedup.nearDupAgainstDedupIndex(spark,
          s"$root/dedupidx_x$f", batch, "doc_id", "text", 0.8).count()
        graft.CacheScope.releaseAll()
        n
      },
      "pagerank_distributed" -> { f =>
        val n = 20000L * f
        val edges = spark.range(n).select(col("id").as("src"),
            explode(sequence(lit(0), lit(4))).as("j"))
          .select(col("src"),
            pmod(xxhash64(col("src"), col("j")), lit(n)).as("dst"))
        val out = graft.operators.GraphOps.pageRank(edges, nIter = 3,
          driverSolveMaxEdges = 0).filter(col("r") >= 0).count()
        graft.CacheScope.releaseAll()
        out
      })

    // --ann: the DiskANN headline path — index build + distributed batch
    // search at growing corpus size, CONSTANT shard size (40k rows/shard:
    // ×10 = 2 shards, ×100 = 20 — the designed scale-out: shards multiply,
    // per-shard build cost stays fixed, builds run in parallel across the
    // executor pool)
    if (args.contains("--ann")) {
      import graft.index.{DiskannIndex, DiskannParams}
      val annFactors = Seq(10, 100)
      annFactors.foreach(ensureEmb)
      val parts = annFactors.map { f =>
        val idx = s"$root/idx_x$f"
        val e = spark.read.parquet(embPath(f))
        val queries = e.filter(col("vec_id") < 64)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        // time the build ALONE (a warm rerun with the index on disk would
        // otherwise report the cost of whatever else sat in the block)
        val fresh = !new java.io.File(s"$idx/_meta/_SUCCESS").exists()
        val (buildSec, _) = time {
          if (fresh)
            DiskannIndex.build(e, "vec_id", "embedding", None, idx,
              DiskannParams(metric = "cosine", partitioner = "ivf",
                shardTargetRows = 40_000L))
          0L
        }
        if (!fresh) Console.err.println(
          s"[scaleprobe] ann x$f: index already on disk — build_sec is NOT a build measurement")
        val (searchSec, nRes) = time {
          DiskannIndex.searchDistributed(spark, idx, queries, k = 10,
            searchListSize = 100, rescore = 50, nProbe = 4).count()
        }
        // the 100 TB graph-analytics path end-to-end: export the Vamana
        // out-edges (explode + within-shard join, no broadcast) and run the
        // DISTRIBUTED PageRank (driver fast path forced off) over them
        val (prSec, nNodes) = time {
          val out = graft.operators.GraphOps.pageRank(
            DiskannIndex.edges(spark, idx), nIter = 3,
            driverSolveMaxEdges = 0).filter(col("r") >= 0).count()
          graft.CacheScope.releaseAll()
          out
        }
        Console.err.println(
          f"[scaleprobe] ann x$f: build=$buildSec%.1fs search64q=$searchSec%.2fs res=$nRes edges_pagerank=$prSec%.1fs nodes=$nNodes")
        f"""\"x$f\":{\"build_sec\":$buildSec%.1f,\"search64q_sec\":$searchSec%.2f,\"edges_pagerank_sec\":$prSec%.1f}"""
      }
      println(s"""{"metric":"scaleprobe_ann","ops":{${parts.mkString(",")}}}""")
      spark.stop()
      return
    }

    // --skew: does the salted join still matter under AQE? Three fair legs
    // over the same 90%-hot-key join (broadcast disabled in all three —
    // salting's premise is a dim too big to broadcast): plain+AQE-skew-
    // splitter, plain without it, salted without it. Honest outcome either
    // way: if AQE alone flattens the skew, that's the documented answer.
    if (args.contains("--skew")) {
      val n = 10_000_000L
      val fact = spark.range(n).select(
        when(pmod(col("id"), lit(10)) < 9, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(100000L))).as("k"),
        col("id").as("rid"),
        (col("id") % 97).cast("double").as("v"))
      val dim = spark.range(100000).select(col("id").as("k"),
        md5(col("id").cast("string")).as("name"))
      def leg(label: String, aqeSkew: Boolean)(
          join: => org.apache.spark.sql.DataFrame): Double = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
          aqeSkew.toString)
        val t0 = System.nanoTime()
        // consume both sides' columns so neither scan is pruned away
        val r = join.agg(sum(col("v") + length(col("name")))).head()
        val sec = (System.nanoTime() - t0) / 1e9
        Console.err.println(f"[scaleprobe] skew/$label: $sec%.2fs " +
          s"(checksum ${r.getDouble(0)})")
        sec
      }
      // two passes; report the second (the first pays JIT/codegen warmup
      // and would bias whichever leg runs first)
      def battery(): (Double, Double, Double) = (
        leg("plain_aqe_skewjoin", aqeSkew = true)(fact.join(dim, "k")),
        leg("plain_no_skewjoin", aqeSkew = false)(fact.join(dim, "k")),
        leg("salted32_no_skewjoin", aqeSkew = false)(
          graft.operators.SkewJoin.saltedJoin(fact, dim, "k", "rid", 32)))
      battery()
      val (plainAqe, plainRaw, salted) = battery()
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      println(f"""{"metric":"scaleprobe_skew","rows":$n,""" +
        f""""plain_aqe_sec":$plainAqe%.2f,"plain_raw_sec":$plainRaw%.2f,""" +
        f""""salted32_sec":$salted%.2f}""")
      spark.stop()
      return
    }

    // --only=a,b restricts the probe to named ops (re-probing one operator
    // shouldn't cost a full multi-minute sweep)
    val only = args.collectFirst { case s if s.startsWith("--only=") =>
      s.stripPrefix("--only=").split(",").toSet }
    val opsRun = only.map(sel => ops.filter(t => sel(t._1))).getOrElse(ops)

    factors.foreach { f => ensureDocs(f); ensureEmb(f) }
    // warm-up at ×1 (JIT, file listing)
    opsRun.foreach { case (_, body) => try body(1) catch { case _: Throwable => () } }

    val results = opsRun.map { case (name, body) =>
      val perF = factors.map { f =>
        val (sec, rows) = time(body(f))
        // progress line per measurement so a failed run still shows where
        Console.err.println(f"[scaleprobe] $name x$f: $sec%.2fs rows=$rows")
        f -> (sec, rows)
      }
      (name, perF)
    }
    val parts = results.map { case (name, perF) =>
      val m = perF.map { case (f, (sec, rows)) =>
        f"""\"x$f\":{\"sec\":$sec%.3f,\"rows\":$rows}"""
      }.mkString(",")
      // scaling exponent on the amortized leg: log10(t100/t10)
      val t10 = perF.find(_._1 == 10).map(_._2._1).getOrElse(Double.NaN)
      val t100 = perF.find(_._1 == 100).map(_._2._1).getOrElse(Double.NaN)
      val expo = math.log10(t100 / t10)
      f"""\"$name\":{$m,\"exp10_100\":$expo%.3f}"""
    }
    println(s"""{"metric":"scaleprobe","sf":"$sfDir","ops":{${parts.mkString(",")}}}""")
    spark.stop()
  }
}
