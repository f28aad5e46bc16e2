package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.{DiskannIndex, DiskannParams}

/**
 * Freezes an on-disk index fixture for the upgrade-compatibility gate (the
 * `upgrade_test.rs:25-337` analog): a tiny deterministic index written with
 * the CURRENT format generation into `src/test/resources/fixtures/`, then
 * committed to git. `UpgradeFixtureSpec` asserts every future reader keeps
 * serving it bit-exactly — if the layout must evolve, regenerate a NEW
 * fixture dir (keep the old one!) and teach the reader the upgrade, exactly
 * like the reference's multi-version test matrix.
 *
 * Determinism: vectors are pure functions of (id, dim) via integer hashing —
 * no RNG state, so a regeneration under the same format is byte-stable.
 */
object FreezeFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/index_gen4")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.range(64).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec",
      "array(CAST(pmod(id, 4) AS SHORT)) AS labels")
    DiskannIndex.build(src, "row_id", "vec", Some("labels"), out,
      DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32))
    println(s"frozen: $out")
    println(DiskannIndex.loadMeta(spark, out))
    spark.stop()
  }
}

/**
 * Freezes the MANIFEST-era fixture (`index_gen4m`): an IVF index that went
 * through one incremental compaction, so its installed generation's meta
 * carries real cross-generation manifest references ("." entries into the
 * flat root, "" for the rebuilt shard). UpgradeFixtureSpec asserts future
 * readers keep resolving the manifest and serving the index exactly.
 */
object FreezeManifestFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/index_gen4m")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val src = spark.range(96).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec")
    DiskannIndex.build(src, "row_id", "vec", None, out,
      DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32,
        partitioner = "ivf", ivfSeed = Some("fx4m"), shardTargetRows = 32))
    // delta: twins (+1000 ids) of one shard's rows — frozen centroids route
    // them back to that shard, so the compact is a true partial rebuild
    val nodes0 = spark.read.parquet(s"$out/nodes")
    val sh0 = nodes0.select(col("shard")).head().getInt(0)
    nodes0.filter(col("shard") === sh0).orderBy(col("row_id")).limit(4)
      .selectExpr("row_id + 1000 AS row_id", "vec")
      .write.mode("append").parquet(s"$out/delta")
    graft.streaming.StreamingIngest.compact(spark, out)
    val meta = DiskannIndex.loadMeta(spark, out)
    require(meta.shardDirs.contains("") && meta.shardDirs.contains("."),
      s"fixture must carry real manifest refs, got ${meta.shardDirs.mkString(",")}")
    println(s"frozen: $out -> ${DiskannIndex.resolveRoot(spark, out)}")
    println(meta.shardDirs.mkString(","))
    spark.stop()
  }
}
