package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout + zone-map pruning: Morton key correctness, file-box
  * locality, and that pruning actually skips files a linear layout cannot. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Morton key: 2x2 lattice enumerates in Z (0,1,2,3)") {
    val df = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0))
      .toDF("x", "y")
    val got = Layout.zorderKey(df, Seq("x", "y"), bits = 1)
      .select($"x", $"y", $"zkey").collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), r.getLong(2))).toMap
    assert(got == Map((0.0, 0.0) -> 0L, (1.0, 0.0) -> 1L,
      (0.0, 1.0) -> 2L, (1.0, 1.0) -> 3L))
  }

  test("Morton key generalizes to 3 dims: 2x2x2 lattice enumerates 0..7") {
    val df = (for { x <- 0 to 1; y <- 0 to 1; z <- 0 to 1 }
      yield (x.toDouble, y.toDouble, z.toDouble)).toDF("x", "y", "z")
    val got = Layout.zorderKey(df, Seq("x", "y", "z"), bits = 1)
      .select($"x", $"y", $"z", $"zkey").collect()
      .map(r => r.getLong(3) ->
        (r.getDouble(0), r.getDouble(1), r.getDouble(2))).toMap
    // bit i of the key is dimension i's bit: zkey = x + 2y + 4z
    (for { x <- 0 to 1; y <- 0 to 1; z <- 0 to 1 } yield (x, y, z)).foreach {
      case (x, y, z) =>
        assert(got((x + 2 * y + 4 * z).toLong) ==
          ((x.toDouble, y.toDouble, z.toDouble)))
    }
  }

  test("Morton key: constant column degenerates to cell 0, no NaN") {
    val df = Seq((5.0, 1.0), (5.0, 2.0)).toDF("x", "y")
    val got = Layout.zorderKey(df, Seq("x", "y"), bits = 4)
      .select($"y", $"zkey").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // x contributes 0 bits; y=1 → cell 0, y=2 → cell 15 → bits at odd slots
    assert(got(1.0) == 0L)
    assert(got(2.0) == (0 until 4).map(b => 1L << (2 * b + 1)).sum)
  }

  test("zone-map pruning: z-ordered files skip, linear-ordered files can't") {
    val n = 40000
    // uniform grid, ids shuffled so natural order correlates with NEITHER
    // dimension (md5 order — deterministic)
    val df = spark.range(n)
      .select($"id",
        ($"id" % 200).cast("double").as("a"),
        ($"id" / 200 % 200).cast("double").as("b"))
    val zpath = "/tmp/graft_test_index/layout_z"
    val lpath = "/tmp/graft_test_index/layout_linear"
    Layout.zorderWrite(df, Seq("a", "b"), zpath, nFiles = 16)
    df.orderBy(md5($"id".cast("string"))).coalesce(4)
      .write.mode("overwrite").parquet(lpath)

    // a 10% x 10% box
    val ranges = Seq(("a", 20.0, 40.0), ("b", 20.0, 40.0))
    val expect = df.filter($"a".between(20, 40) && $"b".between(20, 40))
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq

    val zm = Layout.zonemap(spark, zpath, Seq("a", "b"))
    val zFiles = zm.count()
    assert(zFiles == 16, s"expected 16 z-ordered files, got $zFiles")
    val prunedZ = Layout.prunedRead(spark, zpath, ranges,
      precomputedZonemap = Some(zm))
    val gotZ = prunedZ.select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotZ == expect, "pruned read lost or invented rows")
    // how many files survived pruning?
    val keptZ = zm.filter($"max_a" >= 20.0 && $"min_a" <= 40.0 &&
      $"max_b" >= 20.0 && $"min_b" <= 40.0).count()
    val zmL = Layout.zonemap(spark, lpath, Seq("a", "b"))
    val keptL = zmL.filter($"max_a" >= 20.0 && $"min_a" <= 40.0 &&
      $"max_b" >= 20.0 && $"min_b" <= 40.0).count()
    val totL = zmL.count()
    // every linearly-laid file spans the full (a, b) range → zero skipped;
    // the z-order layout must skip at least half its files on a 1% box
    assert(keptL == totL, s"linear layout unexpectedly prunable: $keptL/$totL")
    assert(keptZ * 2 <= zFiles,
      s"z-order pruning too weak: kept $keptZ of $zFiles files")
    // and the pruned result equals the linear full-scan filter, rows-wise
    val gotL = Layout.prunedRead(spark, lpath, ranges)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotL == expect)
  }

  test("stored zonemap: prunedReadStored plans off the manifest") {
    val zpath = "/tmp/graft_test_index/layout_z"
    Layout.writeZonemap(spark, zpath, Seq("a", "b"))
    val ranges = Seq(("a", 20.0, 40.0), ("b", 20.0, 40.0))
    val stored = Layout.prunedReadStored(spark, zpath, ranges)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    val live = Layout.prunedRead(spark, zpath, ranges)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(stored == live && stored.nonEmpty)
  }

  test("zorderAppend: new slice clusters, manifest refreshes incrementally") {
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    val zpath = "/tmp/graft_test_index/layout_inc"
    deleteRec(new java.io.File(zpath))
    deleteRec(new java.io.File(s"${zpath}_zonemap"))
    // day 0: a grid over [0,200)²; day 1 ingest: a DISJOINT band a∈[300,400)
    val day0 = spark.range(40000)
      .select($"id", ($"id" % 200).cast("double").as("a"),
        ($"id" / 200 % 200).cast("double").as("b"))
    val day1 = spark.range(40000, 50000)
      .select($"id", (($"id" % 100) + 300).cast("double").as("a"),
        ($"id" / 100 % 100).cast("double").as("b"))
    Layout.zorderWrite(day0, Seq("a", "b"), zpath, nFiles = 16)
    Layout.writeZonemap(spark, zpath, Seq("a", "b"))
    val rowsBefore = spark.read
      .parquet(s"${zpath}_zonemap").count()
    Layout.zorderAppend(day1, Seq("a", "b"), zpath, nFiles = 4)
    val zm = spark.read.parquet(s"${zpath}_zonemap")
    // manifest gained EXACTLY the appended files' rows (old rows untouched)
    assert(zm.count() == rowsBefore + 4,
      s"manifest rows: ${zm.count()} != $rowsBefore + 4")
    // pruned reads stay correct across old+new files, both directions
    val all = day0.unionAll(day1)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"id").collect().map(_.getLong(0)).sorted.toSeq
    val oldBox = Seq(("a", 20.0, 40.0), ("b", 20.0, 40.0))
    assert(ids(Layout.prunedReadStored(spark, zpath, oldBox)) ==
      ids(all.filter($"a".between(20, 40) && $"b".between(20, 40))))
    val newBox = Seq(("a", 310.0, 330.0), ("b", 20.0, 40.0))
    assert(ids(Layout.prunedReadStored(spark, zpath, newBox)) ==
      ids(all.filter($"a".between(310, 330) && $"b".between(20, 40))))
    // a box confined to the new slice's value range must not open ANY of
    // day 0's files — the whole point of refreshing the manifest
    val kept = zm.filter($"max_a" >= 310.0 && $"min_a" <= 330.0 &&
      $"max_b" >= 20.0 && $"min_b" <= 40.0).count()
    assert(kept <= 4, s"day-0 files leaked into a day-1-only box: $kept")
  }

  test("prunedRead: disjoint box returns empty, not an error") {
    val zpath = "/tmp/graft_test_index/layout_z"
    val out = Layout.prunedRead(spark, zpath,
      Seq(("a", 1000.0, 2000.0), ("b", 1000.0, 2000.0)))
    assert(out.count() == 0)
  }
}
