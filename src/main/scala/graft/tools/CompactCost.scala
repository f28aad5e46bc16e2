package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.index.{DiskannIndex, DiskannParams}
import graft.streaming.StreamingIngest

/**
 * Measurement harness behind the SCALING.md manifest-generation numbers:
 * build an IVF index from sf0.1 embeddings, land a hot-spot delta in ONE
 * shard, and compact twice — `graft.compact.manifest` on and off — timing
 * the compact and weighing the bytes the new generation materializes.
 * The copy mode rewrites the whole index per compact; the manifest mode
 * writes only the rebuilt shard plus one meta row.
 */
object CompactCost {
  private def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    Seq(false, true).foreach { manifest =>
      val path = s"/tmp/graft_test_index/compact_cost_$manifest"
      graft.tools.LocalFs.deleteRec(new java.io.File(path))
      DiskannIndex.build(e, "vec_id", "embedding", None, path,
        DiskannParams(metric = "cosine", partitioner = "ivf",
          ivfSeed = Some("cc42"), shardTargetRows = 64))
      val meta0 = DiskannIndex.loadMeta(spark, path)
      val nodes0 = spark.read.parquet(s"$path/nodes")
      val sh = nodes0.select(col("shard")).head().getInt(0)
      nodes0.filter(col("shard") === sh).orderBy(col("row_id")).limit(20)
        .selectExpr("row_id + 100000 AS row_id", "vec")
        .write.mode("append").parquet(s"$path/delta")
      spark.conf.set("graft.compact.manifest", manifest.toString)
      val t0 = System.nanoTime()
      StreamingIngest.compact(spark, path)
      val ms = (System.nanoTime() - t0) / 1e6
      val gen = DiskannIndex.resolveRoot(spark, path)
      val genBytes = dirBytes(new java.io.File(gen))
      val idxBytes = dirBytes(new java.io.File(s"$path/nodes"))
      println(f"[compactcost] manifest=$manifest shards=${meta0.numShards} " +
        f"compactMs=$ms%.0f genBytes=$genBytes flatIndexBytes=$idxBytes")
      spark.conf.unset("graft.compact.manifest")
    }
    spark.stop()
  }
}
