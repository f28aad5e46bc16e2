package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, GraphOps, Similarity, TimeSeries}

/** PageRank (link analysis), time-decayed scoring, and shard planning. */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranksOf(maxDriverEdges: Int)(edges: (Long, Long)*): Map[Long, Double] = {
    val out = GraphOps.pageRank(edges.toDF("src", "dst"), nIter = 10,
      driverSolveMaxEdges = maxDriverEdges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    CacheScope.releaseAll()
    out
  }
  private def ranksOf(edges: (Long, Long)*): Map[Long, Double] =
    ranksOf(1000000)(edges: _*)

  test("pageRank: driver fast path == distributed, bit-identical") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    assert(ranksOf(1000000)(edges: _*) == ranksOf(0)(edges: _*))
  }

  test("pageRank: rank mass sums to ~1 and sinks absorb rank") {
    // star into 0: 1,2,3 -> 0; 0 has no out-edges (dangling)
    val r = ranksOf((1L, 0L), (2L, 0L), (3L, 0L))
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    assert(r(0L) > r(1L) && r(1L) == r(2L) && r(2L) == r(3L))
  }

  test("pageRank: symmetric cycle is uniform") {
    val r = ranksOf((0L, 1L), (1L, 2L), (2L, 0L))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6))
  }

  test("pageRank: more in-links => higher rank; deterministic across reruns") {
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L), (2L, 1L),
      (3L, 2L), (0L, 3L))
    val a = ranksOf(edges: _*)
    val b = ranksOf(edges: _*)
    assert(a == b) // fixed-point sums: bit-identical, not just close
    assert(a(0L) > a(3L))
  }

  for ((pathName, mde) <- Seq("driver fast path" -> 1000000, "distributed" -> 0)) {
    test(s"labelPropagate ($pathName): seeds win, majority spreads, ties pick smallest label") {
      // 1,2,3 seeded; 4 points at {1,2,3} (3-way tie -> label of node 1);
      // 5 points at {1,2} (tie -> smaller); 6 points only at unlabeled 7
      val edges = Seq((4L, 1L), (4L, 2L), (4L, 3L), (5L, 1L), (5L, 2L),
        (6L, 7L), (7L, 1L))
      val seeds = Seq((1L, 10L), (2L, 20L), (3L, 30L),
        (4L, 99L)) // 4 is ALSO seeded: seed must override its votes
      val got = GraphOps.labelPropagate(edges.toDF("src", "dst"),
        seeds.toDF("id", "label"), nIter = 2, driverSolveMaxEdges = mde)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toMap
      CacheScope.releaseAll()
      assert(got(1L) == ((10L, "seed")))
      assert(got(4L) == ((99L, "seed")))
      assert(got(5L) == ((10L, "propagated"))) // tie 10 vs 20 -> smallest
      // 7 reaches 10 in round 1; 6 reaches it via 7 in round 2
      assert(got(7L) == ((10L, "propagated")))
      assert(got(6L) == ((10L, "propagated")))
    }
  }

  test("labelPropagate: driver fast path == distributed on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).distinct
    val seeds = (0L until 60L by 7L).map(i => (i, (i % 4) + 100L))
    def run(mde: Int) = {
      val out = GraphOps.labelPropagate(edges.toDF("src", "dst"),
        seeds.toDF("id", "label"), nIter = 3, driverSolveMaxEdges = mde)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toSet
      CacheScope.releaseAll()
      out
    }
    assert(run(1000000) == run(0))
  }

  test("pcaTopComponent: recovers the dominant axis") {
    val rows = Seq.tabulate(40) { i =>
      val big = (if (i % 2 == 0) 1.0f else -1.0f) * (1.0f + i % 3)
      val small = (if (i % 4 < 2) 1.0f else -1.0f) * 0.05f
      Tuple1(Array(big, small))
    }
    val got = Similarity.pcaTopComponent(rows.toDF("embedding"), "embedding",
      dims = 2, nIter = 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(math.abs(math.abs(got(0L)._1) - 1.0) < 1e-3) // axis 0 dominates
    assert(math.abs(got(1L)._1) < 0.1)
    assert(got(0L)._2 > 1.0) // eigenvalue ~ variance of the big axis
  }

  test("timeDecayScores: hand-computed decay, zero-age row undecayed") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-11 00:00:00"), 2.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-11 00:00:00"), 5.0)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.timeDecayScores(df, "user_id", "ts", "value",
      lambdaPerDay = 0.1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // user 1: 2.0 (age 0) + 1.0 * exp(-1.0); user 2: 5.0 (age 0, the ref)
    val exp1 = math.floor(2.0 * 1048576.0 + 0.5) +
      math.floor(1.0 * math.exp(-0.1 * 10.0) * 1048576.0 + 0.5)
    assert(got(1L)._1 == 2L)
    assert(math.abs(got(1L)._2 -
      BigDecimal(exp1 / 1048576.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    assert(got(2L) == ((1L, 5.0)))
  }

  test("writeShards: round-trips, routes like shardPlan, manifest matches disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val df = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val manifest = Curation.writeShards(df, dir, "doc_id", nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val back = spark.read.parquet(dir)
    assert(back.count() == 200L)
    // the written shard column equals the plan's routing for every row
    val mismatch = back.withColumn("expect",
        Curation.shardBucket("doc_id", 4, "graft-shard"))
      .filter(col("shard").cast("long") =!= col("expect")).count()
    assert(mismatch == 0L)
    assert(manifest.values.sum == 200L && manifest.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    val mf = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifest.json")), "UTF-8")
    assert(mf.contains("\"shard\": 0") && mf.contains("n_rows"))
  }

  test("shardPlan: shards partition the corpus; assignment is id-stable") {
    val df = (0L until 1000L).map(i => (i, 10L)).toDF("doc_id", "w")
    val plan = Curation.shardPlan(df, "doc_id", col("w"), nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(plan.map(_._2).sum == 1000L)
    assert(plan.map(_._3).sum == 10000L)
    assert(plan.map(_._1).toSet.subsetOf((0L until 8L).toSet))
    // balance: md5 buckets of 1000 rows over 8 shards stay within ~4 sigma
    assert(plan.map(_._2).max < 200L && plan.map(_._2).min > 60L)
    // a subset routes identically (backfill stability)
    val sub = Curation.shardPlan(df.filter(col("doc_id") < 100), "doc_id",
      col("w"), nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sub.values.sum == 100L)
  }
}
