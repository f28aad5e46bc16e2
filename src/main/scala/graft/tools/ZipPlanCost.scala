package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** One-off measurement: driver-side cost of constructing the shard-aligned
  * nodes RDD (one pruned-scan plan per shard) — the number behind the
  * `graft.search.zipMaxShards` default. Uses the 500-single-row-shard test
  * index layout at /tmp; prints ms total and ms/shard for 100..500 shards. */
object ZipPlanCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = "/tmp/graft_test_index/manyshards"
    if (!new java.io.File(s"$path/nodes").exists()) {
      val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      graft.index.DiskannIndex.build(e, "vec_id", "embedding", None, path,
        graft.index.DiskannParams(metric = "cosine", shardTargetRows = 1))
    }
    val nodes = spark.read.parquet(s"$path/nodes")
    Seq(100, 250, 500).foreach { n =>
      // warm the relation/listing caches once, then measure best-of-2
      def once(): Double = {
        val t0 = System.nanoTime()
        val rdd = graft.index.DiskannIndex.shardAlignedNodesRdd(spark, nodes, 0 until n)
        require(rdd.getNumPartitions == n)
        (System.nanoTime() - t0) / 1e6
      }
      once()
      val ms = math.min(once(), once())
      println(f"[zipcost] shards=$n total=${ms}%.0fms perShard=${ms / n}%.2fms")
    }
    spark.stop()
  }
}
