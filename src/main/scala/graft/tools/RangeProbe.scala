package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.{DiskannIndex, DiskannParams}

/**
 * Measured evidence for SOUND radius shard pruning (SCALING.md §round 10):
 * a clustered corpus sharded by IVF, warm per-shard searchers, and the
 * SAME selective radius query timed with `graft.knn.range.shardPrune`
 * on vs off. Pruning is sound (identical results — asserted here), so the
 * delta is pure avoided traversal: at `numShards` shards a query whose
 * radius intersects k cluster balls does k/numShards of the work.
 *
 *   sbt 'runMain graft.tools.RangeProbe'
 */
object RangeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nClusters = 24
    val perCluster = 2500
    val n = nClusters * perCluster
    // 16-dim, cluster c centered at 10 * e_{c mod 16} + deterministic jitter
    val rows = spark.range(n).selectExpr(
      "id AS row_id",
      s"""transform(sequence(1, 16), d ->
         |  CAST((CASE WHEN d - 1 = CAST(pmod(id, $nClusters) % 16 AS INT)
         |          THEN 10.0 + CAST(pmod(id, $nClusters) AS INT) / 4.0
         |          ELSE 0.0 END)
         |    + pmod(hash(id, d), 97) / 97.0 AS FLOAT)) AS vec""".stripMargin)
    val path = "/tmp/graft_rangeprobe/idx"
    graft.tools.LocalFs.deleteRec(new java.io.File("/tmp/graft_rangeprobe"))
    DiskannIndex.build(rows, "row_id", "vec", None, path,
      DiskannParams(metric = "l2", storage = "plain", partitioner = "ivf",
        shardTargetRows = perCluster))
    val meta = DiskannIndex.loadMeta(spark, path)
    val q = rows.filter("row_id = 0").head()
      .getAs[scala.collection.mutable.Seq[Float]]("vec").toArray
    val radius = 2.5 // covers ~one cluster's jitter ball
    val prunedTo = DiskannIndex.radiusShardsFor(
      meta, graft.index.Metric.L2, q, radius).map(_.length).getOrElse(-1)
    def timeRuns(prune: Boolean, reps: Int): (Double, Set[Long]) = {
      spark.conf.set("graft.knn.range.shardPrune", prune.toString)
      // one untimed call warms every shard searcher this setting touches
      DiskannIndex.rangeSearch(spark, path, q, radius)
      var res: Set[Long] = Set.empty
      val t0 = System.nanoTime()
      (0 until reps).foreach { _ =>
        res = DiskannIndex.rangeSearch(spark, path, q, radius).map(_._1).toSet
      }
      ((System.nanoTime() - t0) / 1e9 / reps, res)
    }
    val (tOff, rOff) = timeRuns(prune = false, reps = 20)
    val (tOn, rOn) = timeRuns(prune = true, reps = 20)
    require(rOn == rOff && rOn.nonEmpty,
      s"pruning changed results: ${rOn.size} vs ${rOff.size}")

    // BATCH radius (round 11, rangeSearchDistributed): 960 queries spread
    // over every cluster, per-query pruned routing — the fan-out is
    // queries × intersecting-shards instead of queries × numShards, and
    // the per-(query, shard) work is the same shard-local escalation the
    // point path pays. Equality vs the point path is asserted on a sample.
    val qdf = rows.filter(s"row_id % ${n / 960} = 0")
      .selectExpr("row_id AS qid", "vec AS qvec")
    def timeBatch(prune: Boolean): (Double, Long) = {
      spark.conf.set("graft.knn.range.shardPrune", prune.toString)
      DiskannIndex.rangeSearchDistributed(spark, path, qdf, radius).count()
      val t0 = System.nanoTime()
      val cnt = DiskannIndex.rangeSearchDistributed(spark, path, qdf, radius).count()
      ((System.nanoTime() - t0) / 1e9, cnt)
    }
    val (tbOff, cbOff) = timeBatch(prune = false)
    val (tbOn, cbOn) = timeBatch(prune = true)
    require(cbOn == cbOff && cbOn > 0,
      s"batch pruning changed results: $cbOn vs $cbOff")
    spark.conf.set("graft.knn.range.shardPrune", "true")
    val batchByQ = DiskannIndex.rangeSearchDistributed(spark, path,
        qdf, radius).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the sample MUST come from the batch's own qid set — an independent
    // modulus silently skips the compare for qids the batch never ran —
    // and the size guard fires BEFORE the stride divides by it
    val sampleIds = batchByQ.keySet.toSeq.sorted
    require(sampleIds.size >= 8,
      s"too few batch queries with hits to sample: ${sampleIds.size}")
    val sample = sampleIds.indices.filter(_ % (sampleIds.size / 8) == 0)
      .map(sampleIds)
    val vecById = rows
      .filter(rows("row_id").isin(sample.map(java.lang.Long.valueOf): _*))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray).toMap
    sample.foreach { qid =>
      val point = DiskannIndex.rangeSearch(spark, path, vecById(qid), radius)
        .map(_._1).toSet
      require(batchByQ(qid) == point, s"batch != point for q $qid")
    }
    println(f"""{"metric":"rangeprobe","rows":$n,"shards":${meta.numShards},"pruned_to":$prunedTo,"in_radius":${rOn.size},"warm_ms_prune_off":${tOff * 1000}%.1f,"warm_ms_prune_on":${tOn * 1000}%.1f,"speedup":${tOff / tOn}%.1f,"batch_queries":${qdf.count()},"batch_pairs":$cbOn,"batch_s_prune_off":$tbOff%.2f,"batch_s_prune_on":$tbOn%.2f}""")
    spark.stop()
  }
}
