package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._
import graft.functions.{VectorFunctions, VectorKernels}

/** Covers the operators whose queries have no SQL oracle: SimHash,
  * winnowing fingerprints, LSH recall bounds, IVF, the top-k aggregator,
  * and the multimodal plumbing. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDf = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different content about spark engines and parquet files"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
  ).toDF("doc_id", "text")

  test("native shingle_set == HOF shinglesFromTokens on real docs") {
    TextAnalysis.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    Seq(1, 2, 3, 5).foreach { n =>
      val both = docs
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__w"))
        .select(col("doc_id"),
          call_function("shingle_set", col("__w"), lit(n)).as("native"),
          Dedup.shinglesFromTokens(col("__w"), n).as("hof"))
        .filter(not(col("native") === col("hof")))
      assert(both.count() == 0, s"shingle_set mismatch at n=$n")
    }
    // degenerate inputs: empty text, single token, null-free ordering
    val edge = Seq((0L, ""), (1L, "  "), (2L, "one"), (3L, "a b")).toDF("doc_id", "text")
    val rows = edge
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__w"))
      .select(col("doc_id"),
        call_function("shingle_set", col("__w"), lit(3)).as("native"),
        Dedup.shinglesFromTokens(col("__w"), 3).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2),
      s"edge mismatch for doc ${r.getLong(0)}"))
  }

  test("simhash: exact dup -> distance 0; near-dup small; unrelated large") {
    TextAnalysis.register(spark)
    val sigs = docsDf.select($"doc_id",
      call_function("simhash64", TextAnalysis.tokens($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(3L)) == 0)
    assert(ham(sigs(0L), sigs(1L)) < ham(sigs(0L), sigs(2L)))
    assert(ham(sigs(0L), sigs(1L)) <= 16)
  }

  test("simhashNearDupPairs finds the dup cluster, not the unrelated doc") {
    val pairs = Dedup.simhashNearDupPairs(docsDf, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("doc_fingerprint: deterministic, dup-invariant, whitespace-normalized") {
    TextAnalysis.register(spark)
    val fps = docsDf.select($"doc_id", call_function("doc_fingerprint", $"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) == fps(3L))
    assert(fps(0L) != fps(2L))
    val ws = Seq((9L, "the  quick   brown fox JUMPS over the lazy dog"))
      .toDF("doc_id", "text")
      .select(call_function("doc_fingerprint", $"text")).collect()(0).getLong(0)
    assert(ws == fps(0L)) // case+whitespace normalization
  }

  test("minhash LSH finds planted near-dup pairs with exact jaccard") {
    // 20 docs, half of them near-dups of the other half (1 token changed)
    val base = (0 until 10).map { i =>
      val words = (0 until 30).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, words)
    }
    val dups = base.map { case (i, t) =>
      (i + 100L, t.split(" ").updated(15, "CHANGED").mkString(" "))
    }
    val df = (base ++ dups).toDF("doc_id", "text")
    val found = Dedup.minhashNearDupPairs(df, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach { i => assert(found.contains((i.toLong, i + 100L)), s"missed pair $i") }
    assert(found.size == 10) // no cross-pair false positives
  }

  test("cosine near-dup LSH finds planted perturbed twins") {
    val rnd = new scala.util.Random(5)
    val base = (0 until 50).map { i =>
      (i.toLong, VectorKernels.normalize(Array.fill(16)(rnd.nextGaussian().toFloat)))
    }
    val twins = base.map { case (i, v) =>
      (i + 1000L, VectorKernels.normalize(v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)))
    }
    val df = (base ++ twins).toDF("id", "vec")
    val pairs = Similarity.cosineNearDupPairs(df, "id", "vec", dim = 16,
      threshold = 0.98, nPlanes = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = (0 until 50).count(i => pairs.contains((i.toLong, i + 1000L)))
    assert(hits >= 45, s"LSH found only $hits/50 planted twins")
  }

  test("minhash maxBucketSize drops degenerate buckets but keeps planted pairs") {
    val base = (0 until 10).map(i => (i.toLong,
      s"unique document number $i with some distinguishing words ${i * 7} and ${i * 13}"))
    val dups = base.map { case (i, t) => (i + 100L, t + " x") }
    // 30 boilerplate rows that would form a giant bucket
    val noise = (0 until 30).map(i => (1000L + i, "the same boilerplate text"))
    val df = (base ++ dups ++ noise).toDF("doc_id", "text")
    val capped = Dedup.minhashNearDupPairs(df, "doc_id", "text",
      threshold = 0.7, maxBucketSize = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach { i => assert(capped.contains((i.toLong, i + 100L))) }
    assert(!capped.exists { case (a, b) => a >= 1000L && b >= 1000L },
      "boilerplate bucket should have been dropped by the cap")
  }

  test("bruteCosineTopPairs == naive all-pairs join, bit-identical doubles") {
    VectorFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // cos_raw already carries the naive form's 1-(1-dot/sqrt(na*nb)) shape
    val viaKernel = Similarity.bruteCosineTopPairs(e, "vec_id", "embedding", topN = 15)
      .select($"id_a", $"id_b", $"cos_raw".as("cosine"))
      .orderBy($"cosine".desc, $"id_a", $"id_b").limit(15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ee = e.select($"vec_id".as("id"), $"embedding".as("vec"))
    val viaJoin = ee.as("a").join(ee.as("b"), $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        (lit(1.0) - VectorFunctions.vec_cosine_dist($"a.vec", $"b.vec")).as("cosine"))
      .orderBy($"cosine".desc, $"id_a", $"id_b").limit(15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaKernel == viaJoin) // exact doubles, not approx — kernel is bit-identical
  }

  test("bruteCosineTopPairs: a zero vector never floods the top-k with NaN") {
    VectorFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 50).select($"vec_id", $"embedding")
    val dim = e.head().getAs[scala.collection.mutable.ArraySeq[Float]]("embedding").length
    val zero = spark.range(1).select(lit(9999L).as("vec_id"),
      typedlit(Array.fill(dim)(0.0f)).as("embedding"))
    val top = Similarity.bruteCosineTopPairs(e.unionByName(zero),
        "vec_id", "embedding", topN = 10)
      .orderBy($"cos_raw".desc, $"id_a", $"id_b").limit(10).collect()
    assert(top.nonEmpty)
    assert(!top.exists(r => r.getDouble(2).isNaN), "NaN cosine leaked into top-k")
    assert(!top.exists(r => r.getLong(0) == 9999L || r.getLong(1) == 9999L),
      "zero vector must be unranked, not top-ranked")
  }

  test("broadcast kernels refuse oversized corpora with the scale-path alternative named") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairsErr = intercept[IllegalArgumentException] {
      Similarity.bruteCosineTopPairs(e, "vec_id", "embedding", topN = 5,
        maxBroadcastRows = 10)
    }
    assert(pairsErr.getMessage.contains("cosineNearDupPairs") &&
      pairsErr.getMessage.contains("DiskannIndex.edges"),
      s"oversize error must name the scale path: ${pairsErr.getMessage}")
    val graphErr = intercept[IllegalArgumentException] {
      Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
        maxBroadcastRows = 10)
    }
    assert(graphErr.getMessage.contains("DiskannIndex.edges"),
      s"oversize error must name the scale path: ${graphErr.getMessage}")
  }

  test("topK aggregator knnJoin == window-ranked exact result") {
    VectorFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = e.filter($"vec_id" >= 5)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val queries = e.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val viaAgg = Similarity.knnJoin(corpus, queries, 5,
      (a, b) => VectorFunctions.vec_cosine_dist(a, b))
      .select($"qid", $"id", $"rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    import org.apache.spark.sql.expressions.Window
    val viaWindow = corpus.crossJoin(broadcast(queries))
      .select($"qid", $"id",
        VectorFunctions.vec_cosine_dist($"vec", $"qvec").as("dist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"qid").orderBy($"dist", $"id")))
      .filter($"rnk" <= 5)
      .select($"qid", $"id", $"rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(viaAgg == viaWindow)
  }

  test("IVF: full probe equals brute force; partial probe has high recall") {
    VectorFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Similarity.trainIvf(e, "embedding", nCentroids = 8)
    val clustered = Similarity.ivfAssign(e, "vec_id", "embedding", model).cache()
    val q = e.filter($"vec_id" === 0).head()
      .getAs[scala.collection.mutable.ArraySeq[Float]]("embedding").toArray
    val dist = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      VectorFunctions.vec_cosine_dist(a, b)
    val full = Similarity.ivfSearch(clustered, model, q, 10, nprobe = 8, dist)
      .collect().map(_.getLong(0)).toSeq
    val brute = e.select($"vec_id",
      dist($"embedding", typedlit(q)).as("d"))
      .orderBy($"d", $"vec_id").limit(10).collect().map(_.getLong(0)).toSeq
    assert(full == brute)
    val partial = Similarity.ivfSearch(clustered, model, q, 10, nprobe = 4, dist)
      .collect().map(_.getLong(0)).toSet
    assert(brute.toSet.intersect(partial).size >= 6)
    clustered.unpersist()
  }

  test("multimodal: stub decode deterministic; features feed the ANN index") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(docs)
    val meta1 = Multimodal.decodeMeta(media).orderBy($"media_id").collect()
    val meta2 = Multimodal.decodeMeta(media).orderBy($"media_id").collect()
    assert(meta1.sameElements(meta2))
    assert(meta1.forall(r => r.getLong(5) > 0)) // n_bytes
    val feats = Multimodal.extractFeatures(media)
    val norms = feats.select(VectorFunctions.vec_norm($"feature").as("n"))
      .agg(min($"n"), max($"n")).collect()(0)
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5 &&
      math.abs(norms.getDouble(1) - 1.0) < 1e-5)
    // end-to-end: multimodal features -> DiskANN index -> search
    val path = "/tmp/graft_test_index/mm"
    graft.index.DiskannIndex.build(feats, "media_id", "feature", None, path,
      graft.index.DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32))
    val queries = feats.limit(1).select($"media_id".as("qid"), $"feature".as("qvec"))
    val hits = graft.index.DiskannIndex.search(spark, path, queries, k = 5).collect()
    assert(hits.length == 5)
  }

  test("ImageIODecoder: real PNG/JPEG headers parsed, real raster resize; stub fallback for the rest") {
    // craft real images with the JDK encoder: a 20x10 PNG and a 16x12 JPEG
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 41 + y * 17) % 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = encode("png", 20, 10)
    val jpg = encode("jpg", 16, 12)
    val media = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(1L, "image", png),
        org.apache.spark.sql.Row(2L, "image", jpg),
        org.apache.spark.sql.Row(3L, "audio", "not an image".getBytes),
        org.apache.spark.sql.Row(4L, "image", "junk bytes".getBytes)),
      Multimodal.mediaSchema)
    val meta = Multimodal.decodeMeta(media, ImageIODecoder)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getInt(3), r.getInt(4)))).toMap
    // REAL container headers, not the size-derived stub formulas
    assert(meta(1L) == (("png", 20, 10)), s"png meta ${meta(1L)}")
    assert(meta(2L) == (("jpeg", 16, 12)), s"jpeg meta ${meta(2L)}")
    // non-image and unrecognized payloads take the stub fallback
    assert(meta(3L)._1 == "wav")
    assert(meta(4L) == ((StubDecoder.decodeMeta("image", "junk bytes".getBytes)
      ._1, StubDecoder.decodeMeta("image", "junk bytes".getBytes)._2,
      StubDecoder.decodeMeta("image", "junk bytes".getBytes)._3)))
    // real resize: output is a decodable PNG with the target raster
    val resized = Multimodal.resizeImages(media, 8, 4, ImageIODecoder)
      .filter($"media_id" === 1L).head()
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.getAs[Array[Byte]]("payload")))
    assert(back != null && back.getWidth == 8 && back.getHeight == 4)
    // the stub path is untouched: same bytes as before the SPI existed
    val stubOut = Multimodal.resizeImages(media, 8, 4)
      .filter($"media_id" === 1L).head().getAs[Array[Byte]]("payload")
    assert(stubOut.sameElements(StubDecoder.resize(png, 8, 4)))
  }

  test("JavaSoundDecoder: real WAV header parsed; image/junk delegate correctly") {
    // craft a real 16-bit mono 8kHz WAV (exactly 0.5s) with the JDK encoder
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val nFrames = 4000
    val pcm = new Array[Byte](nFrames * 2)
    (0 until nFrames).foreach { i =>
      val v = (math.sin(i * 0.05) * 1000).toInt
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    // real header: type=wave, channels in width slot, bits in height slot,
    // 4000 frames at 8kHz = exactly 500 ms
    assert(JavaSoundDecoder.decodeMeta("audio", wav) == (("wave", 1, 16, 500L)))
    // unrecognized audio payloads take the stub fallback
    assert(JavaSoundDecoder.decodeMeta("audio", "junk".getBytes) ==
      StubDecoder.decodeMeta("audio", "junk".getBytes))
    // image rows delegate to the ImageIO path
    val img = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val ibos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", ibos)
    assert(JavaSoundDecoder.decodeMeta("image", ibos.toByteArray) ==
      (("png", 6, 4, 0L)))
  }

  test("Mp4Decoder: real ISO-BMFF boxes parsed; v1 layout; junk/audio delegate") {
    // hand-assemble a minimal valid MP4: ftyp(isom) + moov(mvhd v0
    // timescale=1000 duration=5000; trak(tkhd v0 640x360 as 16.16 fixed))
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isomavc1".getBytes)
    val mvhdV0 = box("mvhd", be32(0) ++ // version 0 + flags
      be32(0) ++ be32(0) ++ // ctime, mtime
      be32(1000) ++ be32(5000) ++ // timescale, duration -> 5000 ms
      new Array[Byte](80))
    val tkhdV0 = box("tkhd", be32(0) ++
      be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(5000) ++ // through duration
      new Array[Byte](8) ++ new Array[Byte](8) ++ // reserved, layer/alt/vol/res
      new Array[Byte](36) ++ // matrix
      be32(640L << 16) ++ be32(360L << 16))
    val mp4 = ftyp ++ box("moov", mvhdV0 ++ box("trak", tkhdV0))
    assert(Mp4Decoder.decodeMeta("video", mp4) == (("isom", 640, 360, 5000L)))
    // v1 mvhd/tkhd layout (64-bit times): timescale at +20, duration u64 at
    // +24; tkhd width/height at +84/+88
    val mvhdV1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      new Array[Byte](16) ++ // ctime, mtime (u64 each)
      be32(600) ++ be32(0) ++ be32(1200) ++ // timescale, duration u64 -> 2000 ms
      new Array[Byte](80))
    val tkhdV1 = box("tkhd", Array[Byte](1, 0, 0, 0) ++
      new Array[Byte](84) ++ // through matrix (v1 times add 12 bytes vs v0)
      be32(1280L << 16) ++ be32(720L << 16))
    val mp4v1 = ftyp ++ box("moov", mvhdV1 ++ box("trak", tkhdV1))
    assert(Mp4Decoder.decodeMeta("video", mp4v1) == (("isom", 1280, 720, 2000L)))
    // non-BMFF video payloads take the stub fallback; audio delegates to
    // the JavaSound chain (stub here: not a WAV)
    assert(Mp4Decoder.decodeMeta("video", "junk".getBytes) ==
      StubDecoder.decodeMeta("video", "junk".getBytes))
    assert(Mp4Decoder.decodeMeta("audio", "junk".getBytes) ==
      StubDecoder.decodeMeta("audio", "junk".getBytes))
  }

  test("frame sampling yields ceil-ish frame counts and binary frames") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    val frames = Multimodal.sampleFrames(Multimodal.mediaFromDocuments(docs))
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Array[Byte]]("frame").length <= 64))
  }

  test("lmScore: hand-computed add-one bigram log probs; bigram-less doc scores 0") {
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    graft.CacheScope.releaseAll()
    // corpus model: c2(a,b)=3, c2(b,a)=1; c1(a)=3, c1(b)=1; V={a,b}=2
    val ab = math.log(4.0 / 5.0) // (3+1)/(3+2)
    val ba = math.log(2.0 / 3.0) // (1+1)/(1+2)
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - (2 * ab + ba) / 3) < 2e-6)
    assert(got(2L) == ((1L, math.rint(ab * 1e6) / 1e6)) ||
      math.abs(got(2L)._2 - ab) < 2e-6)
    assert(got(3L) == ((0L, 0.0)))
  }

  test("int8QuantStats: scale = max|x|/127, zero vector guarded, error <= scale/2") {
    val df = Seq((1L, Seq(1.0f, -0.5f, 0.25f)), (2L, Seq(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.int8QuantStats(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(math.abs(got(1L)._1 - 1.0 / 127) < 1e-12)
    // symmetric rounding: worst reconstruction error is half a quantization step
    assert(got(1L)._2 >= 0 && got(1L)._2 <= got(1L)._1 / 2 + 1e-12)
    assert(got(2L) == ((0.0, 0.0)))
  }

  test("dupSpanStats: shared 8-token spans counted, unrelated docs at zero") {
    val df = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "one two three four five six seven eight ten"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"),
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(df, "doc_id", "text", spanTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.CacheScope.releaseAll()
    // docs 1 and 2 share exactly their first span ("one ... eight"); their
    // second spans differ in the last token; doc 3 shares nothing
    assert(got(1L) == ((2L, 1L)))
    assert(got(2L) == ((2L, 1L)))
    assert(got(3L) == ((2L, 0L)))
  }

  test("minhashNearDupAgainst: finds only batch x corpus pairs, never corpus x corpus") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // corpus-internal dup of 0
      (2L, "completely different content about spark engines and parquet files"),
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0 and 1
      (11L, "fresh unrelated material never seen in any corpus document here"),
    ).toDF("doc_id", "text")
    val got = Dedup.minhashNearDupAgainst(corpus, batch, "doc_id", "text",
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheScope.releaseAll()
    // 10 matches both copies of its corpus near-dup; 11 matches nothing;
    // the 0~1 corpus-internal dup pair is never emitted
    assert(got == Set((10L, 0L), (10L, 1L)))
  }

  test("randomProject: deterministic, linear, and JL-distance-preserving on average") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50).select(col("vec_id"), col("embedding"))
    val p1 = Similarity.randomProject(emb, "vec_id", "embedding", dim = 64, outDim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val p2 = Similarity.randomProject(emb, "vec_id", "embedding", dim = 64, outDim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(p1.keySet == p2.keySet)
    p1.keys.foreach(k => assert(p1(k).sameElements(p2(k))))
    assert(p1.values.forall(_.length == 16))
    // JL sanity: projected squared distances correlate with original ones
    // (rank correlation over pairs of the first 20 vectors is strongly > 0)
    val vecs = emb.limit(20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = vecs.keys.toSeq.sorted
    val pairs = for (i <- ids.indices; j <- i + 1 until ids.length)
      yield (d2(vecs(ids(i)), vecs(ids(j))), d2(p1(ids(i)), p1(ids(j))))
    val n = pairs.length
    // Spearman-ish: count concordant vs discordant pairs of pairs (sampled)
    var conc = 0; var disc = 0
    for (i <- 0 until n; j <- i + 1 until n) {
      val s = math.signum(pairs(i)._1 - pairs(j)._1) *
        math.signum(pairs(i)._2 - pairs(j)._2)
      if (s > 0) conc += 1 else if (s < 0) disc += 1
    }
    // uniform-random 64-d distances CONCENTRATE (all pairs nearly
    // equidistant), so rank concordance is weak signal by construction —
    // anything clearly above the 0.5 coin-flip line means order survives;
    // structured (clustered) embeddings score far higher
    assert(conc.toDouble / (conc + disc) > 0.6,
      s"projection destroyed distance ordering: $conc concordant vs $disc")
    // planted structure is preserved robustly: a 1%-perturbed twin stays
    // far closer in projection than any unrelated vector
    val base = vecs(ids.head)
    val twin = base.zipWithIndex.map { case (x, i) => x + 0.01 * (i % 3 - 1) }
    val twinDf = Seq((900L, base.map(_.toFloat).toSeq), (901L, twin.map(_.toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val pt = Similarity.randomProject(twinDf, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val twinDist = d2(pt(900L), pt(901L))
    val unrelated = ids.tail.map(k => d2(p1(ids.head), p1(k))).min
    assert(twinDist < unrelated / 10,
      s"planted twin not preserved: twin=$twinDist unrelated-min=$unrelated")
  }

  test("gopherQuality: each rule fires on its designed violation") {
    val fixtures = Seq(
      // passes every rule: 9 tokens in [3, 100], mean len 34/9 in [3,10],
      // two distinct stopwords (the, a), all-alpha tokens
      (0L, "the quick brown foxes jump over a lazy dog"),
      (1L, "hi"), // too few tokens
      (2L, "the supercalifragilistic extraordinarily incomprehensibilities " +
        "of antidisestablishmentarianism metaphysically"), // mean len > 10
      (3L, "cat dog bird fish goat"), // zero stopwords
      (4L, "the 111 222 333 444 555 666 777 888 a 999 000"), // < 80% alpha words
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(fixtures, "doc_id", "text",
      minTokens = 3, maxTokens = 100)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6)))
    assert(got(0) == (true, true, true, true, true))
    assert(!got(1)._1 && !got(1)._5) // word count rule
    assert(!got(2)._2 && !got(2)._5) // mean token length rule
    assert(!got(3)._3 && !got(3)._5) // stopword rule
    assert(!got(4)._4 && !got(4)._5) // alpha-word rule
  }

  test("tfIdf: rare terms outscore common ones; tf scales the score") {
    val docs = Seq(
      (0L, "spark spark spark unique"),
      (1L, "spark common"),
      (2L, "spark common"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    graft.CacheScope.releaseAll()
    val n = 3.0
    def idf(df: Int) = math.log(1.0 + n / df)
    assert(math.abs(got((0L, "unique")) - idf(1)) < 1e-12)
    assert(math.abs(got((0L, "spark")) - 3.0 * idf(3)) < 1e-12)
    assert(math.abs(got((1L, "common")) - idf(2)) < 1e-12)
    // df=1 "unique" beats df=3 "spark" at equal tf
    assert(got((0L, "unique")) > got((1L, "spark")))
  }

  test("asofJoinBackward: inclusive bound, latest-prior pick, null before first right") {
    val purchases = Seq((10L, 1L, 100L), (11L, 1L, 50L), (12L, 2L, 10L))
      .toDF("purchase_id", "user_id", "ts_ms")
    val clicks = Seq((1L, 40L, 900L), (1L, 100L, 901L), (1L, 120L, 902L),
      (2L, 20L, 903L))
      .toDF("user_id", "ts_ms", "click_id")
    val got = TimeSeries.asofJoinBackward(purchases, clicks, Seq("user_id"),
        "ts_ms", Seq("click_id"), prefix = "prior_")
      .select($"purchase_id", $"prior_click_id", $"prior_ts_ms")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq(
      (10L, 901L, 100L), // equal ts is INCLUSIVE: click at 100 wins over 40
      (11L, 900L, 40L),  // latest prior, not any prior
      (12L, -1L, -1L)))  // purchase at 10 precedes user-2's first click at 20
    // NULL right ts is never a match (ASOF semantics); NULL left ts emits
    // the outer-null row
    val nullClicks = Seq((Some(1L), Option.empty[Long], Some(77L)))
      .toDF("user_id", "ts_ms", "click_id")
    val nullSafe = TimeSeries.asofJoinBackward(
        purchases, nullClicks, Seq("user_id"), "ts_ms", Seq("click_id"))
      .select($"purchase_id", $"asof_click_id").collect()
    assert(nullSafe.forall(_.isNullAt(1)), "null-ts click must never match")
    val nullLeft = TimeSeries.asofJoinBackward(
        Seq((Some(1L), Option.empty[Long], Some(5L)))
          .toDF("user_id", "ts_ms", "purchase_id"),
        clicks, Seq("user_id"), "ts_ms", Seq("click_id"))
      .select($"purchase_id", $"asof_click_id").collect()
    assert(nullLeft.length == 1 && nullLeft(0).isNullAt(1))
    // NULL-KEY right rows are never a match either (equality never matches
    // NULLs): a NULL-key left row must NOT pick up a NULL-key right row
    // just because the window groups NULL keys into one partition
    val nullKeyLeft = Seq((Option.empty[Long], Some(100L), Some(5L)))
      .toDF("user_id", "ts_ms", "purchase_id")
    val nullKeyRight = Seq((Option.empty[Long], Some(40L), Some(88L)))
      .toDF("user_id", "ts_ms", "click_id")
    val nullKey = TimeSeries.asofJoinBackward(
        nullKeyLeft, nullKeyRight, Seq("user_id"), "ts_ms", Seq("click_id"))
      .select($"purchase_id", $"asof_click_id").collect()
    assert(nullKey.length == 1 && nullKey(0).isNullAt(1),
      "NULL-key right row must never match a NULL-key left row")
    // misuse guards
    intercept[IllegalArgumentException] {
      TimeSeries.asofJoinBackward(purchases, clicks, Nil, "ts_ms", Seq("click_id"))
    }
    intercept[IllegalArgumentException] {
      TimeSeries.asofJoinBackward(purchases, clicks, Seq("user_id"), "ts_ms",
        Seq("ts_ms"))
    }
  }

  test("chunkDedup: first global occurrence survives, later copies counted out") {
    val w15 = (1 to 15).map(i => s"tok$i").mkString(" ") // one full chunk
    val docs = Seq(
      (0L, w15 + " tail one"),   // chunk0 = w15 (first), chunk1 = "tail one"
      (1L, w15 + " tail one"),   // both chunks are copies of doc 0's
      (2L, "tail one")            // copy of doc 0's chunk1? NO — chunking is
                                  // positional: doc2 chunk0 == "tail one"
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 17L), // both chunks first occurrences: 15 + 2 tokens
      (1L, 2L, 0L, 0L),  // exact positional copies of doc 0's chunks
      (2L, 1L, 0L, 0L))) // "tail one" already kept as doc 0's chunk 1
  }

  test("dupNgramCoverage: occurrence weighting counts repeats, unlike distinct spans") {
    val shared = "alpha beta gamma delta epsilon" // one shared 5-gram
    val docs = Seq(
      (0L, shared),                        // 1 gram, shared
      (1L, s"$shared $shared"),            // repeats the shared gram + bridges
      (2L, "zeta eta theta iota kappa")    // 1 gram, unique
    ).toDF("doc_id", "text")
    val got = Dedup.dupNgramCoverage(docs, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // doc1 has 10 tokens -> 6 positional 5-grams, TWO of which are the
    // shared gram (positions 0 and 5) — occurrence weighting counts both
    assert(got == Seq((0L, 1L, 1L), (1L, 6L, 2L), (2L, 1L, 0L)))
  }

  test("temperatureSample: flattens shares toward small strata; zero-token stratum kept whole") {
    val rows = (0L until 90L).map(i => (i, "big", 10L)) ++
      (90L until 100L).map(i => (i, "small", 10L)) ++
      Seq((100L, "empty", 0L), (101L, "empty", 0L))
    val df = rows.toDF("id", "stratum", "n_tok")
    val kept = Curation.temperatureSample(df, "id", "stratum", col("n_tok"),
        alpha = 0.3, seed = "t")
      .groupBy($"stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the smallest token stratum is the normalization anchor: keeps ~all;
    // the big stratum down-samples by (p_big/p_small)^(alpha-1) ~= 0.215
    assert(kept("small") >= 9, s"small kept ${kept.get("small")}")
    val bigKept = kept.getOrElse("big", 0L)
    assert(bigKept > 5 && bigKept < 40, s"big kept $bigKept of 90")
    // zero-token strata cost nothing: rate 1 (and no Infinity poisoning)
    assert(kept.getOrElse("empty", 0L) == 2, s"empty kept ${kept.get("empty")}")
    intercept[IllegalArgumentException] {
      Curation.temperatureSample(df, "id", "stratum", col("n_tok"), alpha = 0.0)
    }
  }

  test("semanticDedup: lowest id survives; cross-cluster near-dups are not compared") {
    // two tight groups + one singleton, 2 clusters: within a cluster the
    // planted twins collapse to the lowest id
    def v(base: Array[Float], eps: Float): Array[Float] =
      base.zipWithIndex.map { case (x, i) => x + (if (i == 0) eps else 0f) }
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    val rows = Seq(
      (0L, a), (1L, v(a, 0.001f)), (2L, v(a, 0.002f)), // near-dup group
      (10L, b), (11L, v(b, 0.001f)),                    // second group
      (20L, Array(0.7f, 0.7f, 0.1f, 0f))                // mid vector, own fate
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(rows, "vec_id", "embedding",
        nClusters = 2, tau = 0.99, seed = "t")
      .collect().map(_.getLong(0)).sorted.toSeq
    graft.CacheScope.releaseAll()
    // survivors: the minimum id of each tau-similar group; 20 is <0.99 to
    // both axes groups so it always survives
    assert(kept.contains(0L) && kept.contains(20L))
    assert(!kept.contains(1L) && !kept.contains(2L))
    assert(kept.count(Set(10L, 11L)) == 1 ||
      // 10/11 survive together only if the 2-centroid pick split them
      (kept.contains(10L) && kept.contains(11L)))
  }

  test("containmentTopPairs: strict-subset pair shows directional asymmetry") {
    // the pair must sit inside the LSH recall envelope (jaccard ~0.8) — a
    // tiny quote in a huge doc is the operator's DOCUMENTED miss case, so
    // the fixture extends, rather than buries, the contained text
    val small = (1 to 20).map(i => s"tok$i").mkString(" ")
    val big = small + " extraA extraB extraC extraD"
    val df = Seq((1L, small), (2L, big), (3L, "totally unrelated content here now"))
      .toDF("doc_id", "text")
    val top = Dedup.containmentTopPairs(df, "doc_id", "text", topK = 5).collect()
    graft.CacheScope.releaseAll()
    val pair = top.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.isDefined, s"subset pair missing from ${top.mkString(";")}")
    // every 3-shingle of `small` occurs in `big` (prefix containment), but
    // not vice versa — the asymmetry jaccard cannot express
    assert(pair.get.getAs[Double]("contain_a_in_b") == 1.0)
    assert(pair.get.getAs[Double]("contain_b_in_a") < 1.0)
    assert(pair.get.getAs[Double]("containment") == 1.0)
  }

  test("quality_score kernel is bit-identical to the Column specification") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, call_function}
    graft.operators.TextAnalysis.register(spark)
    val edge = Seq(
      "", " ", "\t\n", "the quick brown fox", "THE A OF", "the",
      "a b c d e f g h", "12345 67890", "word, word; word!",
      "  leading", "trailing  ", "tab\tsep\ttokens", "Tokyo 東京 note",
      "déjà vu naïve résumé", "a" * 50, ("word " * 30).trim,
      "the the the the the", "mixed 123abc tokens 456def",
      " vertical \f formfeed \r cr", "𝄞 supplementary 𝄞 chars",
      "one", "is is is is is is is is is is")
    val rnd = new scala.util.Random(11)
    val vocab = Array("the", "a", "of", "and", "to", "in", "is", "word",
      "123", "x", "longertoken", "东京", "é", ",", ".", " ", "\t", "\n",
      "UPPER", "MiXeD", "0", "supercalifragilistic")
    val fuzz = (0 until 500).map(_ =>
      (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(rnd.nextInt(3) match {
          case 0 => " "
          case 1 => "  "
          case _ => "\t"
        }))
    val diff = (edge ++ fuzz).toDF("t")
      .select(col("t"),
        graft.operators.TextAnalysis.qualityScore(col("t")).as("ref"),
        call_function("quality_score", col("t")).as("fast"))
      .filter(!(col("ref") <=> col("fast")))
      .collect()
    assert(diff.isEmpty, diff.take(5).map(r =>
      s"t=<${r.getString(0)}> ref=${r.getDouble(1)} fast=${r.getDouble(2)}")
      .mkString("\n"))
    assert(Seq[Option[String]](None).toDF("t")
      .select(call_function("quality_score", col("t"))).head().isNullAt(0))
  }

  test("quality() kernel form matches the staged-Column specification row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val edge = Seq(
      "", " ", "the quick brown fox jumps, and runs; fast!",
      "el la de y que en los", "der die und das ist", "le la et les des",
      "的 了 是 我 不 在 有", "12345 67890 111", "MiXeD case Words",
      "punct.,;:!?dense", "Tokyo 東京 note", "déjà vu 𝄞 music",
      "the el der le 的", "a of to in is and the",
      "não vou para casa em uma hora com os amigos",
      "il che di per con sono anche", "het een van niet dat zijn voor",
      "и в не на что это как", "en los para com")
    val rnd = new scala.util.Random(23)
    val vocab = Array("the", "a", "of", "el", "la", "de", "der", "die",
      "le", "et", "的", "是", "word", "123", ".", ",", "!", "x", " ",
      "\t", "é", "TOKEN", "in", "is", "und", "les", "que", "not",
      "não", "para", "com", "il", "che", "di", "het", "van", "niet",
      "и", "не", "что")
    val fuzz = (0 until 400).map(_ =>
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    val df = (edge ++ fuzz).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val fast = TextAnalysis.quality(df, "doc_id", "text")
    val spec = TextAnalysis.qualitySpec(df, "doc_id", "text")
    val joined = fast.as("f").join(spec.as("s"), Seq("doc_id"))
    val mismatch = joined.filter(
      !(col("f.lang") <=> col("s.lang")) ||
        !(col("f.n_tokens") <=> col("s.n_tokens")) ||
        !(col("f.avg_token_len") <=> col("s.avg_token_len")) ||
        !(col("f.alpha_ratio") <=> col("s.alpha_ratio")) ||
        !(col("f.digit_ratio") <=> col("s.digit_ratio")) ||
        !(col("f.punct_ratio") <=> col("s.punct_ratio")) ||
        !(col("f.stopword_ratio") <=> col("s.stopword_ratio")) ||
        !(col("f.quality_score") <=> col("s.quality_score")))
      .collect()
    assert(mismatch.isEmpty, mismatch.take(3).mkString("\n"))
    assert(fast.count() == edge.size + fuzz.size)
  }

  test("qualityClassifier: clean prose outscores digit soup; keep follows threshold") {
    val prose = "the quick brown fox is a friend of the lazy dog and " * 8
    val digits = "12345 67890 11111 22222 33333 44444 55555 66666 " * 8
    val df = Seq((1L, prose), (2L, digits)).toDF("doc_id", "text")
    val out = TextAnalysis.qualityClassifier(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("quality_prob"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L)._1 > out(2L)._1, s"prose must outscore digits: $out")
    assert(out(1L)._2, "prose passes the default threshold")
    assert(!out(2L)._2, "digit soup fails the default threshold")
  }

  test("pmiBigrams: fixed collocation tops loose co-occurrence; formula hand-checked") {
    // "san francisco" always adjacent; "data" and "lake" co-occur but never
    // adjacent to each other more than chance
    val docs = (1 to 10).map(i =>
      (i.toLong, "san francisco data point lake value data base lake shore"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiBigrams(docs, "text", minCount = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    graft.CacheScope.releaseAll()
    val sf = out.find(_._1 == "san francisco").get
    // nt=100 tokens, nb=90 bigram positions, c_ab=10, c_san=c_francisco=10:
    // pmi = ln(10 * 100 * 100 / (90 * 10 * 10)) = ln(100/9)
    assert(sf._2 == 10L)
    assert(math.abs(sf._3 - math.log(100.0 / 9.0)) < 1e-6, sf.toString)
    // perfectly-predictive pair sits at the top of the ranking
    assert(out.head._1 == "san francisco" || out.head._3 == sf._3)
  }

  test("ngramNovelty: first occurrence owns the span; verbatim repeats score zero") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // all spans first seen here
      (2L, "a b c d e f g h i j"), // exact repeat -> novelty 0
      (3L, "z y x w v u t s r q") // fresh -> novelty 1
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("novelty")).toMap
    graft.CacheScope.releaseAll()
    assert(out(1L) == 1.0 && out(2L) == 0.0 && out(3L) == 1.0, out.toString)
  }

  test("cmsNgramEstimates: never undercounts; exact when the sketch is collision-free") {
    val docs = (1 to 5).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.cmsNgramEstimates(docs, "text", n = 5,
      width = 1 << 14, depth = 4, topK = 10).collect()
    graft.CacheScope.releaseAll()
    assert(out.length == 6) // 10 tokens -> 6 distinct 5-grams, each count 5
    out.foreach { r =>
      assert(r.getLong(1) == 5L)
      // CMS is biased high, never low; at 6 grams x 4 hashes in 2^14
      // counters there are no collisions, so the estimate is exact
      assert(r.getLong(2) == r.getLong(1), r.toString)
    }
    // a deliberately tiny sketch (width 2) forces collisions: estimates
    // stay >= truth — the one-sided error CMS guarantees
    val tiny = TextAnalysis.cmsNgramEstimates(docs, "text", n = 5,
      width = 2, depth = 2, topK = 10).collect()
    graft.CacheScope.releaseAll()
    tiny.foreach(r => assert(r.getLong(2) >= r.getLong(1), r.toString))
    assert(tiny.exists(r => r.getLong(2) > r.getLong(1)),
      "width-2 sketch must collide")
  }

  test("bloomDecontam: no false negatives; saturation shows the FP trade") {
    val evalDoc = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // identical
      (2L, "one two three four five six seven eight nine"))  // disjoint
      .toDF("doc_id", "text")
    val wide = Curation.bloomDecontam(train, evalDoc, "doc_id", "text",
        mBits = 1 << 20, kHashes = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("bloom_frac"))).toMap
    // Bloom filters never miss a true member: the identical doc is fully hit
    assert(wide(1L)._3 == 1.0, wide.toString)
    // at 2^20 bits over ~6 shingles the FP odds are ~0: disjoint doc clean
    assert(wide(2L)._2 == 0L, wide.toString)
    // a SATURATED filter flags everything — the documented false-positive
    // trade, reproducible not random: ~200 shingles x 4 hashes into 64
    // bits sets every bit (P(bit clear) = e^-12.5), so the disjoint doc
    // false-positives on all its shingles
    val bigEval = Seq((200L, (1 to 200).map(i => s"ev$i").mkString(" ")))
      .toDF("doc_id", "text")
    val tiny = Curation.bloomDecontam(train, bigEval, "doc_id", "text",
        mBits = 64, kHashes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(tiny(2L) > 0L, s"64-bit filter should saturate: $tiny")
  }

  test("TopKeywordsAggregator: best-first top-k invariant under arrival order and splits") {
    val agg = new TextAnalysis.TopKeywordsAggregator(3)
    val items = Seq(("b", 2.0), ("a", 2.0), ("c", 5.0), ("d", 1.0), ("e", 3.0))
    val expected = Seq(("c", 5.0), ("e", 3.0), ("a", 2.0)) // tie a<b on token
    items.permutations.foreach { p =>
      assert(agg.finish(p.foldLeft(agg.zero)(agg.reduce)) == expected, p.toString)
    }
    (0 to items.length).foreach { cut =>
      val (l, r) = items.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(m) == expected, s"cut=$cut")
    }
  }

  test("dupSourceMatrix: near-dup pairs land in their unordered source cell") {
    val t1 = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq(
      (1L, t1, "crawl"), (2L, t1, "wiki"),            // cross-source dup
      (3L, t1 + " thirteen", "crawl"),                 // near-dup, crawl side
      (4L, "unrelated words that are completely different from the others", "wiki"))
      .toDF("doc_id", "text", "source")
    val m = Dedup.dupSourceMatrix(df, "doc_id", "text", "source", threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    graft.CacheScope.releaseAll()
    assert(m.getOrElse(("crawl", "wiki"), 0L) >= 1L, m.toString)
    assert(m.getOrElse(("crawl", "crawl"), 0L) >= 1L, m.toString)
    assert(!m.keys.exists { case (a, b) => a > b }, "matrix must be unordered-canonical")
  }

  test("slidingChunks: coverage, overlap, and the empty-doc invariant") {
    import spark.implicits._
    val df = Seq((1L, "a" * 350), (2L, ""), (3L, "xyz")).toDF("doc_id", "text")
    val ch = graft.operators.TextAnalysis
      .slidingChunks(df, "doc_id", "text", chunkSize = 200, stride = 150)
      .collect().groupBy(_.getAs[Long]("id"))
    // 350 chars → starts 0,150,300; lengths 200,200,50
    val d1 = ch(1L).sortBy(_.getAs[Long]("chunk_start"))
    assert(d1.map(_.getAs[Long]("chunk_start")).toSeq == Seq(0L, 150L, 300L))
    assert(d1.map(_.getAs[Int]("chunk_len")).toSeq == Seq(200, 200, 50))
    assert(d1.map(_.getAs[Int]("chunk_ix")).toSeq == Seq(0, 1, 2))
    // every doc survives: empty text yields exactly one empty chunk
    assert(ch(2L).length == 1 && ch(2L)(0).getAs[Int]("chunk_len") == 0)
    // short doc: one chunk, full text
    assert(ch(3L).length == 1 && ch(3L)(0).getAs[String]("chunk_text") == "xyz")
  }

  test("gopherRepetition: hand-computed fractions, ties, and edge cases") {
    val fixtures = Seq(
      // tokens [a b a b a c], joined "a b a b a c" = 11 chars.
      // 2-grams: "a b"x2, "b a"x2, "a c"x1 -> top tie resolves to the
      // lexicographically smallest "a b" (cnt 2, 3 chars) -> 6/11.
      // 5-grams: both unique -> dup fraction 0.
      (0L, "a b a b a c"),
      (1L, ""), // no tokens -> all zero
      (2L, "hello"), // 1 token < n -> fractions 0, total = 5
      // degenerate repetition: "x x x x x x" -> top 2-gram "x x" cnt 5,
      // len 3 -> 15/11; dup 5-grams: "x x x x x" cnt 2 len 9 -> 18/11 > 1
      (3L, "x x x x x x"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetition(fixtures, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    assert(got(0) == ((math.rint(6.0 / 11 * 1e6) / 1e6, 0.0)))
    assert(got(1) == ((0.0, 0.0)))
    assert(got(2) == ((0.0, 0.0)))
    assert(got(3) == ((math.rint(15.0 / 11 * 1e6) / 1e6,
      math.rint(18.0 / 11 * 1e6) / 1e6)))
  }

  test("dsirWeights: target-like docs score positive, off-target negative, " +
      "and one weight replays exactly") {
    val corpus = Seq(
      (0L, "en", "apple apple banana"),
      (1L, "en", "apple banana"),
      (2L, "xx", "zebra zebra yak"),
      (3L, "xx", "zebra yak"),
    ).toDF("doc_id", "lang", "text")
    val B = 4096
    val got = Curation.dsirWeights(corpus, "doc_id", "text",
        col("lang") === "en", buckets = B)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._2).toSeq == Seq(3L, 2L, 3L, 2L)) // n_tokens
    assert(got(0)._3 > 0 && got(1)._3 > 0, "target-slice docs must score > 0")
    assert(got(2)._3 < 0 && got(3)._3 < 0, "off-target docs must score < 0")
    assert(got(0)._3 > got(1)._3, "more target-typical tokens -> higher weight")
    // exact replay of doc 0 via the same md5-bucket + fixed-point formula
    def bucket(w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % B
    }
    val cr = Map(bucket("apple") -> 3L, bucket("banana") -> 2L,
      bucket("zebra") -> 3L, bucket("yak") -> 2L)
      .groupMapReduce(_._1)(_._2)(_ + _) // fold md5-bucket collisions, if any
    val ct = Map(bucket("apple") -> 3L, bucket("banana") -> 2L)
      .groupMapReduce(_._1)(_._2)(_ + _)
    val (tr, tt) = (10.0, 5.0)
    def lr(b: Long): Long = math.floor((
      math.log((ct.getOrElse(b, 0L) + 1.0) / (tt + B)) -
      math.log((cr.getOrElse(b, 0L) + 1.0) / (tr + B))) * 1e9 + 0.5).toLong
    val expected0 = math.rint(
      (2 * lr(bucket("apple")) + lr(bucket("banana"))) / 1e9 * 1e6) / 1e6
    assert(got(0)._3 == expected0, s"doc0 weight ${got(0)._3} != $expected0")
  }

  test("removeDupSpans: first occurrence survives, later copies lose their tokens") {
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val a = "x1 x2 x3 x4 x5 x6 x7 x8 tailA"
    val b = "x1 x2 x3 x4 x5 x6 x7 x8 tailB" // shares A's 8-token prefix span
    val c = "too short for any span" // < 8 tokens: untouched
    val dToks = (1 to 8).map(i => s"y$i")
    val dDoc = (dToks ++ dToks).mkString(" ") // within-doc repeat
    val docs = Seq((0L, a), (1L, b), (2L, c), (3L, dDoc)).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(docs, "doc_id", "text", spanTokens = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // A: the shared span's FIRST occurrence — nothing removed
    assert(got(0) == ((0L, 9L, 0L, md5(a))))
    // B: second occurrence — loses positions 0..7, keeps the tail
    assert(got(1) == ((1L, 9L, 8L, md5("tailB"))))
    // C: no spans at all
    assert(got(2) == ((2L, 5L, 0L, md5(c))))
    // D: the repeat at p0=8 is removed, the p0=0 original survives
    assert(got(3) == ((3L, 16L, 8L, md5(dToks.mkString(" ")))))
  }

  test("dsirResample: Gumbel top-k is deterministic and favors high weights") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sel = Curation.dsirResample(corpus, "doc_id", "text",
      col("lang") === "en", k = 20)
    val a = sel.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = sel.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq, "selection must be deterministic")
    assert(a.length == 20 && a.map(_._1).distinct.length == 20)
    assert(a.map(_._2).toSeq == a.map(_._2).sortBy(-_).toSeq, "sorted desc")
    // at temperature -> 0 the softmax sharpens to argmax: the Gumbel noise
    // becomes negligible next to weight/T and the selection must equal the
    // noiseless top-k by weight
    val w = Curation.dsirWeights(corpus, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cold = Curation.dsirResample(corpus, "doc_id", "text",
      col("lang") === "en", temperature = 1e-6, k = 20)
      .collect().map(_.getLong(0)).toSet
    // compare weight MULTISETS, not ids: exact-dup docs share a weight, and
    // at a boundary tie the Gumbel residue may pick either twin
    val coldW = cold.toSeq.map(w).sorted
    val top20W = w.values.toSeq.sortBy(-_).take(20).sorted
    assert(coldW == top20W, s"cold selection weights $coldW != top-20 $top20W")
  }

  test("hybrid_rrf: deterministic, bounded, and consistent with its parts") {
    val d = "/root/testdata/sf0.001"
    val run = graft.queries.PipelineQueries.queries("hybrid_rrf")
    val a = run(spark, d).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = run(spark, d).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq, "hybrid_rrf must be deterministic")
    assert(a.length == 20 && a.map(_._1).distinct.length == 20)
    // descending by score, and every score inside the RRF envelope
    assert(a.map(_._2).toSeq == a.map(_._2).sortBy(-_).toSeq)
    val maxRrf = math.rint((1.0 / 61 + 1.0 / 61) * 1e6) / 1e6
    assert(a.forall(x => x._2 > 0 && x._2 <= maxRrf))
  }

  test("bpeTrain: merge sequence, counts, and tie-break match the hand-derived run") {
    val docs = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    // word table: (aaab, 3), (ab, 1)
    // round 1: (a,a)=6 wins over (a,b)=4, (b,</w>)=4
    // round 2: (a,b)=4 ties (b,</w>)=4 -> lexicographic left wins
    // round 3: (ab,</w>)=4
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 3)
    assert(merges == Seq((1, "a", "a", 6L), (2, "a", "b", 4L),
      (3, "ab", "</w>", 4L)))
    // the learned merges segment greedily in rank order
    val pairs = merges.map(m => (m._2, m._3))
    assert(TextAnalysis.bpeSegment("aaab", pairs) == Seq("aa", "ab</w>"))
    assert(TextAnalysis.bpeSegment("ab", pairs) == Seq("ab</w>"))
    // asking for more merges than pairs exist terminates early
    val all = TextAnalysis.bpeTrain(docs, "text", nMerges = 100)
    assert(all.size < 100 && all.take(3) == merges)
  }

  test("bpeFertility: executor-side segmentation, hand-computed counts, collect-free plan") {
    val docs = Seq(
      (1L, "en", "aaab aaab aaab ab"),
      (2L, "de", "aaab zz")).toDF("doc_id", "lang", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 3)
      .map(m => (m._2, m._3))
    val fert = TextAnalysis.bpeFertility(docs, "text", "lang", merges)
    // the trained merges live in the UDF closure, the vocabulary is never
    // collected/materialized: the plan's only leaf is the input relation
    // (the old shape had a second LocalRelation carrying the whole vocab)
    assert(fert.queryExecution.optimizedPlan.collectLeaves().size == 1)
    val got = fert.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // en: aaab -> [aa, ab</w>] (2) x3, ab -> [ab</w>] (1) => 4 words, 7 subs
    // de: aaab -> 2, zz -> [z, z, </w>] (3) => 2 words, 5 subs
    assert(got == Seq(("de", 2L, 5L), ("en", 4L, 7L)))
  }

  test("winnowPairs: duplicate docs top the ranking; short docs don't crash") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about completely unrelated subject here"),
      (4L, "ab"), // shorter than one 8-gram: single-gram fallback
      (5L, "xy")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowPairs(docs, "doc_id", "text",
        maxPosting = 100, topN = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    CacheScope.releaseAll()
    assert(got.head._1 == 1L && got.head._2 == 2L) // identical docs win
    assert(got.head._3 >= 1L)
    // the two short docs share no fingerprint with anything
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L))
  }

  test("winnowPairs: posting cap drops boilerplate fingerprints") {
    // 30 docs all containing one shared sentence: with the cap below 30
    // the shared fingerprints are dropped and no pairs survive
    val shared = "every document repeats this exact boilerplate sentence verbatim"
    val docs = (1L to 30L).map(i => (i, shared)).toDF("doc_id", "text")
    val capped = TextAnalysis.winnowPairs(docs, "doc_id", "text",
      maxPosting = 10, topN = 50).count()
    CacheScope.releaseAll()
    val uncapped = TextAnalysis.winnowPairs(docs, "doc_id", "text",
      maxPosting = 1000, topN = 1000).count()
    CacheScope.releaseAll()
    assert(capped == 0L && uncapped == 30L * 29L / 2)
  }

  test("cluster-keyed split: zero near-dup leakage by construction") {
    // three duplicate families + singletons; random split WOULD leak
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine",
      "red orange yellow green blue indigo violet colors")
    val docs = (0L until 30L).map(i => (i, texts((i % 3).toInt)))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .select(col("id_a"), col("id_b"))
    val clusters = Curation.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
    val keyed = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("rep"))
    val split = Curation.hashSplit(keyed, "rep",
      Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2), seed = "nodup")
      .select(col("doc_id"), col("split"))
    val crossing = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    CacheScope.releaseAll()
    assert(crossing == 0L)
  }

  test("crossSourceLmMatrix: self-entropy lowest; unseen-heavy pair highest") {
    val docs = Seq(
      (1L, "a", "cats chase mice and cats chase birds"),
      (2L, "a", "cats chase mice often"),
      (3L, "b", "dogs fetch balls and dogs fetch sticks"),
      (4L, "b", "dogs fetch balls always")
    ).toDF("doc_id", "source", "text")
    val m = TextAnalysis.crossSourceLmMatrix(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(m.size == 4)
    // each source is better explained by its own model
    assert(m(("a", "a")) < m(("b", "a")))
    assert(m(("b", "b")) < m(("a", "b")))
  }

  test("kmvMergeCols: merging stored per-half sketches == sketching the union") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def hashed(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      docs.filter(f(col("doc_id")))
        .select(col("source"),
          explode_outer(TextAnalysis.tokens(col("text"))).as("tok"))
        .filter(col("tok").isNotNull)
        .select(col("source"), Curation.md5Low60(col("tok")).as("h"))
    val k = 64
    val even = Sketches.kmvSketches(hashed(_ % 2 === 0), "source", "h", k)
      .withColumnRenamed("sketch", "sa")
    val odd = Sketches.kmvSketches(hashed(_ % 2 === 1), "source", "h", k)
      .withColumnRenamed("sketch", "sb")
    val merged = even.join(odd, "source")
      .select(col("source"),
        Sketches.kmvMergeCols(col("sa"), col("sb"), k).as("sketch"))
    val whole = Sketches.kmvSketches(hashed(_ => lit(true)), "source", "h", k)
    val mism = merged.join(whole.withColumnRenamed("sketch", "expected"), "source")
      .filter(not(col("sketch") === col("expected"))).count()
    assert(mism == 0)
  }

  test("exactKPerStratum: aggregator path == rank-window path, exact k") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(1, 7, 100000).foreach { k =>
      val agg = Curation.exactKPerStratum(docs, "doc_id", "source", k, "t7")
        .select(col("doc_id"), col("source"))
      val win = Curation.exactKPerStratumWindowed(docs, "doc_id", "source",
          k, "t7").select(col("doc_id"), col("source"))
      assert(agg.exceptAll(win).count() == 0 && win.exceptAll(agg).count() == 0,
        s"path mismatch at k=$k")
      // exactly min(k, |stratum|) rows per stratum
      val sizes = agg.groupBy(col("source")).count()
        .join(docs.groupBy(col("source")).count()
          .withColumnRenamed("count", "total"), "source")
        .collect()
      sizes.foreach(r => assert(
        r.getLong(1) == math.min(k.toLong, r.getLong(2)),
        s"wrong stratum size at k=$k: ${r}"))
    }
    // plan shape: no Sort over the corpus in the aggregator path (the
    // window path's defining cost); the semi join must be broadcast
    val plan = Curation.exactKPerStratum(docs, "doc_id", "source", 5, "t7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected broadcast semi join:\n$plan")
  }

  test("fuzzyLinkage: blocked pairs == brute force within block; threshold DP exact") {
    val cat = Seq(
      (10L, "acme widget"), (11L, "acme widgit"),   // dist 1, same block
      (12L, "acme gadget"),                          // dist 3 from widget? verify by brute force
      (20L, "zeta widget"),                          // near "acme widget" but DIFFERENT block: must not pair
      (30L, "acme widget"),                          // exact dup: collapses, rep id = 10
      (40L, "bolt"), (41L, "bolts"),                 // dist 1
    ).toDF("id", "name")
    val out = Dedup.fuzzyLinkage(cat, "id", "name",
      n => split(n, " ").getItem(0), maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // brute force over distinct names within the same first token
    val names = cat.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).map { case (n, rs) => (rs.map(_._1).min, n) }.toSeq
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && na.split(" ")(0) == nb.split(" ")(0) && lev(na, nb) <= 2
    } yield (na, nb, lev(na, nb).toLong, ia, ib)).toSet
    assert(out == expect, s"got $out\nexpected $expect")
    // the cross-block near pair is really excluded (blocking is doing work)
    assert(!out.exists(p => p._1.startsWith("zeta") || p._2.startsWith("zeta")))
    // exact dups collapse to one representative before pairing
    assert(out.forall(p => p._4 != 30L && p._5 != 30L))
  }
}
