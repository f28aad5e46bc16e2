package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Curation operators: connected components (pairs -> clusters), deterministic
  * stratified sampling, PII scrubbing, decontamination. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // maxDriverEdges = 0 forces the DISTRIBUTED path; default exercises the
  // adaptive driver union-find fast path — both must agree everywhere
  private def cc(maxDriverEdges: Int)(edges: (Long, Long)*): Map[Long, Long] =
    Curation.connectedComponents(edges.toDF("id_a", "id_b"),
      driverSolveMaxEdges = maxDriverEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  for ((label, mde) <- Seq("driver fast path" -> 100000, "distributed" -> 0)) {
    test(s"connectedComponents ($label): two components, chain + triangle") {
      // chain 5-4-3 and triangle 10-11-12 with an extra edge
      val got = cc(mde)((5L, 4L), (4L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      assert(got == Map(3L -> 3L, 4L -> 3L, 5L -> 3L,
        10L -> 10L, 11L -> 10L, 12L -> 10L))
    }

    test(s"connectedComponents ($label): long path needs diameter rounds, still converges") {
      // path 0-1-2-...-9: worst case for min-propagation (diameter 9)
      val got = cc(mde)((0L until 9L).map(i => (i, i + 1)): _*)
      assert(got == (0L to 9L).map(_ -> 0L).toMap)
    }

    test(s"connectedComponents ($label): duplicate + reversed edges collapse") {
      val got = cc(mde)((7L, 2L), (2L, 7L), (7L, 2L))
      assert(got == Map(2L -> 2L, 7L -> 2L))
    }
  }

  test("driver fast path == distributed on a multi-component random graph") {
    val rnd = new scala.util.Random(7)
    // several components with random internal wiring
    val edges = (0 until 5).flatMap { c =>
      val ids = (0 until 20).map(i => (c * 100 + i).toLong)
      (1 until ids.length).map(i => (ids(rnd.nextInt(i)), ids(i)))
    }
    val fast = cc(100000)(edges: _*)
    val dist = cc(0)(edges: _*)
    assert(fast == dist)
    assert(fast.values.toSet == Set(0L, 100L, 200L, 300L, 400L))
  }

  test("star-contraction: diameter-63 path converges within 15 rounds (label would need 63)") {
    // path 0-1-...-63: star-contraction is O(log n) rounds regardless of
    // diameter, so maxIter=15 forces the claim (the require() throws at 15
    // rounds without convergence; label propagation needs diameter rounds)
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Curation.connectedComponents(edges, maxIter = 15, algorithm = "star",
      driverSolveMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 63L).map(_ -> 0L).toMap)
  }

  test("star-contraction matches label propagation on a mixed random graph") {
    val rnd = new scala.util.Random(5)
    // 120 vertices, sparse random edges => several components of varying shape
    val edges = (0 until 90).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
    }.filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    def run(alg: String): Map[Long, Long] =
      Curation.connectedComponents(edges, maxIter = 40, algorithm = alg,
        driverSolveMaxEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run("star") == run("label"))
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val s1 = Curation.stratifiedSample(df, "id", "lang", Map("en" -> 0.1), 0.9)
    val s2 = Curation.stratifiedSample(df, "id", "lang", Map("en" -> 0.1), 0.9)
    assert(s1.collect().map(_.getLong(0)).sorted
      sameElements s2.collect().map(_.getLong(0)).sorted)
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 per stratum; binomial(1000, rate) stays well inside these bounds
    assert(byLang("en") > 50 && byLang("en") < 200)
    assert(byLang("de") > 800 && byLang("de") < 1000)
  }

  test("scrubPii redacts and counts emails and phones") {
    val df = Seq(
      (1L, "mail me at a.b+c@ex-ample.org or x@y.io, call 555-0142"),
      (2L, "no pii here"),
      (3L, "half@match@ and 12-3456 stay put")).toDF("id", "text")
    val got = Curation.scrubPii(df, "text").orderBy("id")
      .select("text", "n_emails", "n_phones")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got(0) == ("mail me at <EMAIL> or <EMAIL>, call <PHONE>", 2, 1))
    assert(got(1) == ("no pii here", 0, 0))
    // "half@match@" has no TLD tail; "12-3456" is not ddd-dddd
    assert(got(2)._2 == 0 && got(2)._3 == 0)
  }

  test("contaminationPairs counts distinct shared shingles") {
    val train = Seq((1L, "a b c d e"), (2L, "x y z w v")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "a b c d q")).toDF("doc_id", "text")
    // train 1 shares shingles "a b c" and "b c d" with eval 100; train 2 none
    val got = Curation.contaminationPairs(train, eval_, "doc_id", "text",
      shingleSize = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 100L, 2L)))
  }

  test("contaminationByFraction thresholds on eval-side coverage, not absolute counts") {
    // eval 100 has 3 shingles; train 1 shares 2 of them (frac 2/3), train 2
    // shares 1 (frac 1/3), train 3 none
    val train = Seq(
      (1L, "a b c d e"), // shingles: abc bcd cde -> shares abc, bcd
      (2L, "x y a b c"), // shares abc only
      (3L, "p q r s t")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "a b c d q")).toDF("doc_id", "text")
    val got = Curation.contaminationByFraction(train, eval_, "doc_id", "text",
      shingleSize = 3, minFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    graft.CacheScope.releaseAll()
    assert(got.toSeq == Seq((1L, 100L, 2L, 0.666667)))
  }

  test("packSequences: greedy first-fit sweep matches the hand-computed packing") {
    // nBuckets=1 puts everything in one sorted sweep with known token counts
    val df = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 250L), (5L, 300L),
      (6L, 10L)).toDF("doc_id", "n")
    val got = Curation.packSequences(df, "doc_id", col("n"),
      budget = 256, nBuckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // 1:100 2:+100=200 3:overflow->seq1 4:overflow->seq2 5:overflow->seq3
    // (oversized doc gets its own sequence) 6:300+10 overflows->seq4
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 4L))
  }

  test("packSequences: every sequence fits the budget unless it is one oversized doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val packed = Curation.packSequences(docs, "doc_id",
      graft.operators.TextAnalysis.tokenCount(col("text")),
      budget = 256, nBuckets = 4)
    val bad = packed.groupBy(col("bucket"), col("seq_id"))
      .agg(sum(col("n_tokens")).as("tot"), count(lit(1)).as("n"))
      .filter(col("tot") > 256 && col("n") > 1)
    assert(bad.count() == 0)
    // no document is lost or duplicated by the repartition+sweep
    assert(packed.select("doc_id").distinct().count() == docs.count())
    assert(packed.count() == docs.count())
  }

  test("mixtureSample: generous budgets keep all rows; tight budgets downsample the stratum") {
    val df = (0L until 600L).map(i => (i, if (i % 3 == 0) "big" else "small", 10L))
      .toDF("id", "src", "n")
    val all = Curation.mixtureSample(df, "id", "src", col("n"),
      budgets = Map("big" -> 1000000L), defaultBudget = 1000000L)
    assert(all.count() == 600)
    // big: 200 rows x 10 tokens = 2000 total; budget 500 => rate 0.25
    val mixed = Curation.mixtureSample(df, "id", "src", col("n"),
      budgets = Map("big" -> 500L), defaultBudget = 1000000L, seed = "t1")
    val byStratum = mixed.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("small") == 400)
    // binomial(200, 0.25): mean 50, comfortably within [20, 90]
    assert(byStratum("big") > 20 && byStratum("big") < 90)
    // deterministic: the same seed reproduces the identical sample
    val again = Curation.mixtureSample(df, "id", "src", col("n"),
      budgets = Map("big" -> 500L), defaultBudget = 1000000L, seed = "t1")
    assert(mixed.select("id").collect().toSet == again.select("id").collect().toSet)
  }

  test("mixtureSample: NULL strata sample at defaultBudget instead of vanishing") {
    val df = (0L until 300L)
      .map(i => (i, if (i % 3 == 0) null else "src", 10L))
      .toDF("id", "src", "n")
    // generous default: every NULL-stratum row must survive
    val all = Curation.mixtureSample(df, "id", "src", col("n"),
      budgets = Map("src" -> 1000000L), defaultBudget = 1000000L)
    assert(all.filter(col("src").isNull).count() == 100)
    // tight default: NULL stratum (100 rows x 10 tokens) at budget 250 =>
    // rate 0.25, binomial(100, 0.25) within [10, 45]
    val tight = Curation.mixtureSample(df, "id", "src", col("n"),
      budgets = Map("src" -> 1000000L), defaultBudget = 250L, seed = "t2")
    val nNull = tight.filter(col("src").isNull).count()
    assert(nNull > 10 && nNull < 45, s"null-stratum kept $nNull of 100")
  }

  test("epochUpsample: whole epochs replicate exactly, zero drops, fraction replays md5") {
    val df = (0L until 100L).map(i => (i, if (i < 25) "a" else if (i < 50) "b"
      else if (i < 75) "c" else "d")).toDF("id", "src")
    val out = Curation.epochUpsample(df, "id", "src",
      Map("a" -> 3.0, "b" -> 0.0, "c" -> 0.5), defaultEpochs = 1.0, seed = "t3")
      .groupBy(col("src"), col("id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.count(_._1._1 == "a") == 25 && out.filter(_._1._1 == "a").values.forall(_ == 3L))
    assert(!out.keys.exists(_._1 == "b"), "0-epoch stratum must vanish")
    assert(out.count(_._1._1 == "d") == 25 && out.filter(_._1._1 == "d").values.forall(_ == 1L))
    // fractional keeps replay the md5Uniform rule row by row
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t3:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(17, 32), 16) / 1.152921504606846976e18
    }
    (50L until 75L).foreach { id =>
      val expect = if (u(id) < 0.5) Some(1L) else None
      assert(out.get(("c", id)) == expect, s"fractional keep mismatch for id=$id")
    }
    // copy_ix enumerates 0..n-1
    val ix = Curation.epochUpsample(df, "id", "src", Map("a" -> 3.0),
        defaultEpochs = 0.0, seed = "t3")
      .filter(col("id") === 0).select(col("copy_ix")).collect().map(_.getLong(0)).sorted
    assert(ix.toSeq == Seq(0L, 1L, 2L))
  }

  test("bloomHitFrac (JVM rule) replays bloomDecontam's (SQL rule) verdicts exactly") {
    graft.operators.TextAnalysis.register(spark)
    val eval_ = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // fully contained
      (1L, "totally different words appear here now"), // disjoint
      (2L, "alpha beta gamma unrelated tail words")) // partial overlap
      .toDF("id", "text")
    val mBits = 1 << 16
    val sql = Curation.bloomDecontam(train, eval_, "id", "text", mBits = mBits)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val words = spark.sparkContext.broadcast(
      Curation.bloomFilterWords(eval_, "id", "text", mBits = mBits))
    val jvm = train.select(col("id"),
        Curation.bloomHitFrac(words, mBits)(call_function("shingle_set",
          graft.operators.TextAnalysis.tokens(col("text")), lit(3))).as("f"))
      .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e6) / 1e6).toMap
    assert(sql == jvm, s"SQL verdicts $sql != JVM verdicts $jvm")
    assert(jvm(0L) == 1.0 && jvm(1L) < 1.0)
  }

  test("adaptiveQualityGate: per-stratum cutoffs differ and gate at each stratum's quantile") {
    // stratum A scores 1..20, stratum B scores 101..120: a global cutoff
    // would pass all of B; the adaptive gate prunes the bottom quarter OF EACH
    val df = ((1 to 20).map(i => ("A", i * 1.0)) ++
      (1 to 20).map(i => ("B", 100 + i * 1.0))).toDF("src", "score")
    val kept = Curation.adaptiveQualityGate(df, "src", "score", pctl = 0.25)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val (ka, kb) = (kept.filter(_._1 == "A"), kept.filter(_._1 == "B"))
    // 25th percentile of 1..20 (linear interp) = 5.75 -> keeps 6..20
    assert(ka.map(_._2).sorted.toSeq == (6 to 20).map(_.toDouble))
    assert(kb.map(_._2).sorted.toSeq == (106 to 120).map(_.toDouble))
    assert(ka.forall(_._3 == 5.75) && kb.forall(_._3 == 105.75))
  }

  test("hashSplit: ~weights fractions, total partition, and backfill stability") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val assigned = Curation.hashSplit(ids, "id", splits, seed = "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every row lands in exactly one split; fractions near the weights
    assert(assigned.size == 2000)
    val frac = assigned.values.groupBy(identity).view.mapValues(_.size / 2000.0)
    assert(math.abs(frac("train") - 0.9) < 0.03)
    assert(math.abs(frac("val") - 0.05) < 0.02)
    assert(math.abs(frac("test") - 0.05) < 0.02)
    // backfill stability: a subset of ids gets the SAME assignments — the
    // split is a pure function of (seed, id), not of the batch contents
    val subset = Curation.hashSplit(
      ids.filter(col("id") % 3 === 0), "id", splits, seed = "t")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(subset.forall { case (id, s) => assigned(id) == s })
    // weights that don't sum to 1 are rejected
    intercept[IllegalArgumentException] {
      Curation.hashSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("urlNormalize: case, ports, fragments, tracking params, param order, root slash") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // scheme+host lowercase; PATH case preserved (case-sensitive)
      "HTTP://Example.COM/Page/One" -> "http://example.com/Page/One",
      // default ports drop only for their scheme
      "http://example.com:80/a" -> "http://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "http://example.com:443/a" -> "http://example.com:443/a",
      "http://example.com:8080/a" -> "http://example.com:8080/a",
      // fragment dropped, tracking params dropped, survivors sorted
      "http://x.com/a?b=2&utm_source=rss&a=1#top" -> "http://x.com/a?a=1&b=2",
      // query that is ONLY tracking junk vanishes entirely
      "http://x.com/a?utm_campaign=spring&gclid=Z" -> "http://x.com/a",
      // bare root slash == no path
      "http://x.com/" -> "http://x.com",
      "http://x.com" -> "http://x.com",
      // query param VALUES keep their case and their repeats
      "http://x.com/p?Q=Al&Q=aL" -> "http://x.com/p?Q=Al&Q=aL",
      // not a URL: best-effort passthrough, trimmed
      "  not a url  " -> "not a url")
    val got = cases.map(_._1).toDF("url")
      .select(Curation.urlNormalize(col("url")).as("n"))
      .collect().map(_.getString(0)).toSeq
    cases.map(_._2).zip(got).zip(cases.map(_._1)).foreach {
      case ((want, g), in) => assert(g == want, s"'$in' -> '$g', want '$want'")
    }
  }
}
