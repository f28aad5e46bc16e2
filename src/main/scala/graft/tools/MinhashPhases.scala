package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Phase-level timing for the MinHash-LSH pipeline on the ScaleProbe ×N
  * tables — isolates which stage turns superlinear at corpus scale. */
object MinhashPhases {
  def main(args: Array[String]): Unit = {
    val f = args.headOption.getOrElse("100").toInt
    val numHashes = args.lift(1).map(_.toInt).getOrElse(64)
    val nBands = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TextAnalysis.register(spark)

    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs n=$n")
    }

    val docs = spark.read.parquet(s"/tmp/graft_scaleprobe/docs_x$f")
    val par = spark.sparkContext.defaultParallelism
    val base = Dedup.shingled(docs.repartition(par), "doc_id", "text", 3)
      .withColumn("sig", Dedup.minhashSignature(col("sh"), numHashes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("signatures")(base.count())
    // the production operator's own stages (private[graft]) — timed against
    // THIS code, not a copy that could drift
    val maxBucketSize = 200L
    val banded = Dedup.cappedBands(
      Dedup.bandTable(base, numHashes, nBands), maxBucketSize)
    t("band+cap")(banded.count())
    // bucket-width histogram AFTER the cap: where do the candidate pairs
    // actually come from?
    banded.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_buckets"),
        sum(col("w") * (col("w") - 1) / 2).as("pairs"))
      .orderBy(col("pairs").desc).limit(12).collect()
      .foreach(r => println(s"[phase] width=${r.get(0)} buckets=${r.get(1)} pairs=${r.get(2)}"))
    val candidates = Dedup.lshCandidatePairs(base, numHashes, nBands, maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("candidates")(candidates.count())
    val sets = base.select(col("id"), col("sh"))
    t("verify")(candidates
      .join(sets.as("sa"), col("id_a") === col("sa.id"))
      .join(sets.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("sa.sh"), col("sb.sh")).as("jaccard"))
      .filter(col("jaccard") >= 0.8).count())
    spark.stop()
  }
}
