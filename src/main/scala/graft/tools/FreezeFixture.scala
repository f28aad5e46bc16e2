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
