package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measured evidence for the tiered-compaction claim: the TIER fold's cost
 * must stay ~FLAT as the base corpus grows (it folds only the appended
 * batches and references the base), while the FULL fold grows linearly
 * with the corpus (it rewrites everything). Replicates the sf0.01
 * documents table ×{1,4,16}, appends the SAME two fixed batches at every
 * scale, and times both folds. Prints one JSON line; numbers land in
 * SCALING.md next to the ScaleProbe results.
 *
 *   sbt 'runMain graft.tools.TierProbe'
 */
object TierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextIndex

    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()

    // two fixed 200-doc append batches, identical at every scale — the
    // "daily ingest" whose fold cost we are isolating
    val batchA = docs.limit(200)
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
    val batchB = docs.limit(200)
      .select(($"doc_id" + 20000000L).as("doc_id"), $"text")

    val rows = Seq(1, 16, 64).map { mult =>
      val path = s"/tmp/graft_tierprobe/text_x$mult"
      graft.tools.LocalFs.deleteRec(new java.io.File(path))
      // base corpus ×mult (replicated ids stay unique per replica)
      val base = (0 until mult).map(r =>
        docs.select(($"doc_id" + lit(r.toLong * 1000000L)).as("doc_id"),
          $"text")).reduce(_ unionByName _)
      TextIndex.buildTextIndex(base, "doc_id", "text", path)
      TextIndex.appendTextIndex(batchA, "doc_id", "text", path, 1L)
      TextIndex.appendTextIndex(batchB, "doc_id", "text", path, 2L)
      def time(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val tTier = time(require(
        TextIndex.compactTextIndex(spark, path, tiered = true)))
      // fresh appends so the FULL fold has the same pending tier to fold
      TextIndex.appendTextIndex(
        batchA.select(($"doc_id" + 1L).as("doc_id"), $"text"),
        "doc_id", "text", path, 3L)
      val tFull = time(require(TextIndex.compactTextIndex(spark, path)))
      // sanity: serving equals expectations (non-empty, tier docs visible)
      val top = TextIndex.bm25SearchIndexed(spark, path,
        Seq("vector", "query", "dup"), n = 5).count()
      require(top == 5, s"serving broke at x$mult")
      (mult, nDocs * mult, tTier, tFull)
    }
    val js = rows.map { case (m, n, tt, tf) =>
      f"""{"mult":$m,"base_docs":$n,"tier_fold_s":$tt%.2f,"full_fold_s":$tf%.2f}"""
    }.mkString("[", ",", "]")

    // ---- ANN index: LIVE-INSERT fold vs full rebuild. Same protocol —
    // fixed-size delta (20 twins), growing base corpus (shard size pinned
    // by shardTargetRows, shard COUNT grows): the insert fold touches only
    // the <=20 shards the delta routes to and inserts O(delta) rows into
    // their frozen graphs, so its cost is bounded by the delta; the full
    // rebuild re-runs Vamana over every row and grows with the corpus.
    import graft.index.{DiskannIndex, DiskannParams}
    import graft.streaming.StreamingIngest
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nEmb = emb.count()
    def deltaTwins(off: Long) = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + off).as("row_id"), $"embedding".as("vec"))
    val annRows = Seq(1, 8, 32).map { mult =>
      val path = s"/tmp/graft_tierprobe/ann_x$mult"
      graft.tools.LocalFs.deleteRec(new java.io.File(path))
      val base = (0 until mult).map(r =>
        emb.select(($"vec_id" + lit(r.toLong * 1000000L)).as("row_id"),
          $"embedding".as("vec"))).reduce(_ unionByName _)
      DiskannIndex.build(base, "row_id", "vec", None, path,
        DiskannParams(metric = "cosine", shardTargetRows = 2000))
      def time(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      StreamingIngest.appendBatchToDelta(path)(deltaTwins(900000000L), 0L)
      val tFold = time(StreamingIngest.compact(spark, path))
      StreamingIngest.appendBatchToDelta(path)(deltaTwins(910000000L), 1L)
      spark.conf.set("graft.compact.incremental", "false")
      val tFull =
        try time(StreamingIngest.compact(spark, path))
        finally spark.conf.unset("graft.compact.incremental")
      // sanity: a folded twin serves at distance ~0 — the base holds `mult`
      // exact replicas of the query vector (all dist 0, lower row_ids win
      // the tie-break), so k must clear them before the twins can surface
      val q = emb.filter($"vec_id" === 0)
        .select(lit(0L).as("qid"), $"embedding".as("qvec"))
      val hits = DiskannIndex.search(spark, path, q, k = mult + 3,
        searchListSize = 400, rescore = 300)
        .collect().map(_.getLong(1)).toSet
      require(hits.contains(900000000L) || hits.contains(910000000L),
        s"folded twin not served at x$mult: $hits")
      (mult, nEmb * mult, tFold, tFull)
    }
    val annJs = annRows.map { case (m, n, tt, tf) =>
      f"""{"mult":$m,"base_rows":$n,"insert_fold_s":$tt%.2f,"full_rebuild_s":$tf%.2f}"""
    }.mkString("[", ",", "]")

    // ---- persistently SKEWED stream (round-11 hot-shard split): every
    // wave's delta routes to ONE frozen IVF centroid, the workload that
    // used to trip the growth gate into an O(corpus) re-shard at every
    // compaction. With the split, per-wave compact cost must stay ~flat —
    // bounded by the (capped) hot shard, not the corpus — while numShards
    // grows and untouched shards keep their cache epochs (proof no full
    // rebuild ever ran). One full rebuild is timed at the end as the
    // per-wave price the split avoids.
    val skewJs = {
      val mult = 32
      val path = "/tmp/graft_tierprobe/ann_skew"
      graft.tools.LocalFs.deleteRec(new java.io.File(path))
      val base = (0 until mult).map(r =>
        emb.select(($"vec_id" + lit(r.toLong * 1000000L)).as("row_id"),
          $"embedding".as("vec"))).reduce(_ unionByName _)
      DiskannIndex.build(base, "row_id", "vec", None, path,
        DiskannParams(metric = "cosine", partitioner = "ivf",
          shardTargetRows = 2000))
      val meta0 = DiskannIndex.loadMeta(spark, path)
      val nodes0 = spark.read.parquet(s"$path/nodes")
      val hot = nodes0.groupBy($"shard").count()
        .orderBy($"count".desc, $"shard").head().getInt(0)
      val hotMembers = nodes0.filter($"shard" === hot)
        .select($"row_id", $"vec").limit(1000).cache()
      hotMembers.count()
      def time(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val waves = (1 to 6).map { w =>
        StreamingIngest.appendBatchToDelta(path)(
          hotMembers.select(($"row_id" + lit(w * 10000000L)).as("row_id"),
            $"vec"), w.toLong)
        val t = time(StreamingIngest.compact(spark, path))
        val m = DiskannIndex.loadMeta(spark, path)
        (w, t, m.numShards)
      }
      val metaN = DiskannIndex.loadMeta(spark, path)
      val untouchedStable = (0 until meta0.numShards)
        .filterNot(_ == hot)
        .forall(s => metaN.shardBuildIds(s) == meta0.shardBuildIds(s))
      require(untouchedStable,
        "skew waves rebuilt untouched shards — full-rebuild fallback fired")
      require(metaN.numShards > meta0.numShards,
        "skew waves never split the hot shard")
      hotMembers.unpersist()
      spark.conf.set("graft.compact.incremental", "false")
      val tFull =
        try time(StreamingIngest.compact(spark, path, force = true))
        finally spark.conf.unset("graft.compact.incremental")
      val ws = waves.map { case (w, t, ns) =>
        f"""{"wave":$w,"compact_s":$t%.2f,"num_shards":$ns}"""
      }.mkString("[", ",", "]")
      f""""skew_waves":$ws,"skew_full_rebuild_s":$tFull%.2f"""
    }
    println(s"""{"metric":"tierprobe","sf":"$sfDir","points":$js,"ann_points":$annJs,$skewJs}""")
    spark.stop()
  }
}
