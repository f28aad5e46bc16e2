package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.Sketches.{KmvAgg, KmvState}
import graft.operators.Curation.{MinKByHashAgg, MinKState}

/** Property tests for the two bounded mergeable min-k aggregators. They run
  * as map-side partials under Spark's combine, which gives NO guarantee on
  * partition split points or merge order — so reduce/merge must agree with
  * the naive global computation for every split and be order-insensitive,
  * and KMV must dedupe (the sketch is over the distinct hash SET even when
  * fed raw occurrences). */
object SketchesPropSpec extends Properties("Sketches") {

  private val hashes: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 40L)) // small domain => many duplicates

  private def naiveKmv(xs: List[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  private def reduceAll(agg: KmvAgg, xs: List[Long]): KmvState =
    xs.foldLeft(agg.zero)(agg.reduce)

  property("KMV reduce-then-finish == distinct-sort-take") =
    forAll(hashes, Gen.chooseNum(2, 9)) { (xs, k) =>
      val agg = new KmvAgg(k)
      agg.finish(reduceAll(agg, xs)) == naiveKmv(xs, k)
    }

  property("KMV any split + merge == global; merge commutes") =
    forAll(hashes, Gen.chooseNum(2, 9), Gen.chooseNum(0, 100)) { (xs, k, cut0) =>
      val agg = new KmvAgg(k)
      val cut = if (xs.isEmpty) 0 else cut0 % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val sl = reduceAll(agg, l); val sr = reduceAll(agg, r)
      agg.finish(agg.merge(sl, sr)) == naiveKmv(xs, k) &&
        agg.finish(agg.merge(sr, sl)) == naiveKmv(xs, k)
    }

  property("KMV estimate is exact below saturation") =
    forAll(hashes) { xs =>
      val k = 64 // above the 41-value domain: sketch can never saturate
      val agg = new KmvAgg(k)
      val s = reduceAll(agg, xs)
      agg.finish(s).size == xs.distinct.size
    }

  private val rows: Gen[List[(String, Long)]] =
    Gen.listOf(Gen.zip(
      Gen.oneOf("0a", "0b", "1c", "2d", "2e"), Gen.chooseNum(0L, 20L)))

  private def naiveMinK(xs: List[(String, Long)], k: Int): Seq[Long] =
    xs.distinct.sortBy { case (h, id) => (h, id) }.take(k).map(_._2)

  property("MinKByHash reduce == naive (hash, id) sort; split+merge agrees") =
    forAll(rows, Gen.chooseNum(1, 6), Gen.chooseNum(0, 100)) { (xs, k, cut0) =>
      val agg = new MinKByHashAgg(k)
      def red(ys: List[(String, Long)]): MinKState =
        ys.foldLeft(agg.zero)(agg.reduce)
      val cut = if (xs.isEmpty) 0 else cut0 % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      agg.finish(red(xs)) == naiveMinK(xs, k) &&
        agg.finish(agg.merge(red(l), red(r))) == naiveMinK(xs, k)
    }
}
