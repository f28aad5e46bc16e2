package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.WarcSource

/** WARC ingestion: framing parse (streamed, loud on violations), the
  * distributed read over plain and per-record-gzip-member segments, the
  * codegen'd HTML→text Column pipeline, and the crawl→documents bridge. */
class WarcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rec(warcType: String, uri: String, payload: Array[Byte],
      contentType: String = "application/http; msgtype=response",
      extra: Seq[String] = Nil): Array[Byte] = {
    val h = (s"WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-01-02T03:04:05Z\r\n" +
      extra.map(_ + "\r\n").mkString +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "WARC-Custom-Header: kept\r\n\r\n").getBytes(UTF_8)
    h ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private val html = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
    "<html><head><title>T</title><style>p{x}</style></head><body>" +
    "<!-- c --><script>var a=1;</script><p>Hello &amp; <b>world</b>!" +
    "</p>\n<p>Caf&eacute;? A&nbsp;B</p></body></html>").getBytes(UTF_8)
  private val binary = Array.tabulate[Byte](64)(i => (i * 7).toByte)

  private def threeRecords: Array[Byte] =
    rec("warcinfo", "", "crawler: graft-test".getBytes(UTF_8),
      "application/warc-fields") ++
      rec("response", "http://example.com/a", html) ++
      rec("response", "http://example.com/bin", binary,
        "application/octet-stream")

  test("parseStream: framing, headers, exact payload bytes, loud truncation") {
    val recs = WarcSource.parseStream("f",
      new ByteArrayInputStream(threeRecords)).toSeq
    assert(recs.map(_.warcType) == Seq("warcinfo", "response", "response"))
    assert(recs.map(_.offset) == Seq(0L, 1L, 2L))
    assert(recs(1).targetUri == "http://example.com/a" &&
      recs(1).date == "2026-01-02T03:04:05Z")
    assert(recs(1).headers("warc-custom-header") == "kept")
    assert(java.util.Arrays.equals(recs(2).payload, binary),
      "binary payload must roundtrip byte-exact")
    // header-only projection: lengths kept, bytes dropped
    val census = WarcSource.parseStream("f",
      new ByteArrayInputStream(threeRecords), keepPayload = false).toSeq
    assert(census.map(_.contentLength) == recs.map(_.contentLength) &&
      census.forall(_.payload.isEmpty))
    // a truncated payload fails LOUD with provenance, never a short record
    val cut = threeRecords.dropRight(binary.length / 2 + 4)
    val e = intercept[java.io.EOFException] {
      WarcSource.parseStream("seg-9", new ByteArrayInputStream(cut)).toSeq
    }
    assert(e.getMessage.contains("seg-9") && e.getMessage.contains("truncated"))
    // garbage input is a loud type error, not an empty iterator
    val g = intercept[IllegalArgumentException] {
      WarcSource.parseStream("g",
        new ByteArrayInputStream("PKzipbytes".getBytes(UTF_8))).toSeq
    }
    assert(g.getMessage.contains("not a WARC stream"))
  }

  test("readWarc: plain and multi-member-gzip segments read identically, distributed") {
    val dir = new java.io.File("/tmp/graft_test_warc")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(dir); dir.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(dir, "seg0.warc").toPath, threeRecords)
    // one gzip MEMBER per record — the Common Crawl framing; the reader
    // must cross member boundaries transparently
    val gz = new java.io.ByteArrayOutputStream()
    Seq(rec("warcinfo", "", "crawler: graft-test".getBytes(UTF_8),
        "application/warc-fields"),
      rec("response", "http://example.com/a", html),
      rec("response", "http://example.com/bin", binary,
        "application/octet-stream")).foreach { r =>
      val g = new GZIPOutputStream(gz); g.write(r); g.finish(); g.close()
    }
    java.nio.file.Files.write(
      new java.io.File(dir, "seg1.warc.gz").toPath, gz.toByteArray)

    val plain = WarcSource.readWarc(spark, s"$dir/seg0.warc", gzipped = false)
    val zipped = WarcSource.readWarc(spark, s"$dir/seg1.warc.gz")
    assert(plain.count() == 3 && zipped.count() == 3)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("offset", "warcType", "targetUri", "contentLength")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(canon(plain) == canon(zipped),
      "gzip-member framing must be invisible to the reader")

    // crawl → documents bridge: only the HTML response survives, HTTP
    // headers split off, entities decoded, whitespace collapsed
    val docs = WarcSource.warcToDocuments(zipped).collect()
    assert(docs.length == 1)
    val row = docs.head
    assert(row.getAs[String]("url") == "http://example.com/a")
    val text = row.getAs[String]("text")
    // tags become spaces (never glue adjacent words), so "</b>!" keeps one
    assert(text == "T Hello & world ! Café? A B", s"got '$text'")
    assert(!text.contains("var a=1") && !text.contains("p{x}"),
      "script/style content must not leak into text")

    // WET (pre-extracted text) twin: conversion/text-plain records pass
    // through as-is — no HTTP split, no HTML stripping, whitespace
    // normalized only
    val wet = rec("conversion", "http://example.com/a",
      "Already   extracted <not-a-tag>\n text.".getBytes(UTF_8),
      "text/plain")
    java.nio.file.Files.write(
      new java.io.File(dir, "seg2.warc").toPath, wet)
    val wetDocs = WarcSource.warcToDocuments(
      WarcSource.readWarc(spark, s"$dir/seg2.warc", gzipped = false))
      .collect()
    assert(wetDocs.length == 1 &&
      wetDocs.head.getAs[String]("text") ==
        "Already extracted <not-a-tag> text.",
      s"WET passthrough diverged: '${wetDocs.head.getAs[String]("text")}'")
  }

  test("MultiMemberGzipInputStream: exact framing on hostile streams, loud on every corruption") {
    // Hadoop input streams can legitimately answer available()=0 mid-file
    // and dole out tiny reads; the JDK GZIPInputStream's concatenation
    // heuristic silently truncates there (and silently swallows corrupt
    // next-member headers on EVERY JDK). The explicit-framing reader must
    // read both members regardless, and fail LOUD on corruption.
    class StingyStream(in: java.io.InputStream)
        extends java.io.FilterInputStream(in) {
      override def available(): Int = 0
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        super.read(b, off, math.min(len, 1))
    }
    def members(ss: String*): Array[Byte] = {
      val gz = new java.io.ByteArrayOutputStream()
      ss.foreach { s =>
        val g = new GZIPOutputStream(gz); g.write(s.getBytes(UTF_8)); g.finish(); g.close()
      }
      gz.toByteArray
    }
    def drain(in: java.io.InputStream): String = {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, UTF_8)
    }
    val two = members("first-member-payload", "second-member-payload")
    // hostile stream shape: full content anyway
    val full = drain(new WarcSource.MultiMemberGzipInputStream(
      new StingyStream(new ByteArrayInputStream(two))))
    assert(full == "first-member-payloadsecond-member-payload", s"got '$full'")
    // normal stream shape: identical
    assert(drain(new WarcSource.MultiMemberGzipInputStream(
      new ByteArrayInputStream(two))) == full)

    // SMALL trailing garbage (the case the JDK heuristic swallows after
    // buffering it into the inflater read-ahead): loud, names the magic
    val trail = intercept[java.io.IOException] {
      drain(new WarcSource.MultiMemberGzipInputStream(
        new ByteArrayInputStream(two ++ Array[Byte](0x51, 0x51, 0x51))))
    }
    assert(trail.getMessage.contains("member magic"), trail.getMessage)

    // corrupt bytes BETWEEN members: loud, second member never silently lost
    val m1 = members("first-member-payload")
    val m2 = members("second-member-payload")
    val between = intercept[java.io.IOException] {
      drain(new WarcSource.MultiMemberGzipInputStream(
        new ByteArrayInputStream(m1 ++ Array[Byte](0, 1, 2, 3) ++ m2)))
    }
    assert(between.getMessage.contains("member magic"), between.getMessage)

    // flipped payload byte: CRC mismatch is loud
    val corrupt = two.clone()
    corrupt(m1.length / 2) = (corrupt(m1.length / 2) ^ 0x40).toByte
    intercept[java.io.IOException] {
      drain(new WarcSource.MultiMemberGzipInputStream(
        new ByteArrayInputStream(corrupt)))
    }

    // truncated mid-member: loud EOF, never a short clean stream
    intercept[java.io.EOFException] {
      drain(new WarcSource.MultiMemberGzipInputStream(
        new ByteArrayInputStream(two.dropRight(m2.length / 2))))
    }

    // an EMPTY member between data members parses through
    assert(drain(new WarcSource.MultiMemberGzipInputStream(
      new ByteArrayInputStream(members("a", "", "b")))) == "ab")

    // optional header fields (FEXTRA|FNAME|FCOMMENT|FHCRC — real crawl
    // members carry FNAME routinely; the JDK writer never emits them, so
    // hand-craft the header around a raw deflate stream)
    val payload = "optional-header-member".getBytes(UTF_8)
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(payload); deflater.finish()
    val dbuf = new Array[Byte](256)
    val dlen = deflater.deflate(dbuf)
    deflater.end()
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fancy =
      Array[Byte](0x1f, 0x8b.toByte, 8, 0x1e, 0, 0, 0, 0, 0, 0) ++ // flags=FHCRC|FEXTRA|FNAME|FCOMMENT
        Array[Byte](4, 0) ++ Array[Byte](1, 2, 3, 4) ++            // FEXTRA len=4 + data
        ("name.warc".getBytes(UTF_8) :+ 0.toByte) ++             // FNAME (NUL-terminated)
        ("a comment".getBytes(UTF_8) :+ 0.toByte) ++             // FCOMMENT (NUL-terminated)
        Array[Byte](0x42, 0x43) ++                                  // FHCRC (skipped)
        dbuf.take(dlen) ++ le32(crc.getValue) ++ le32(payload.length.toLong)
    assert(drain(new WarcSource.MultiMemberGzipInputStream(
      new ByteArrayInputStream(fancy ++ members("tail")))) ==
      "optional-header-membertail")
  }

  test("warcToDocuments: raw text/html payloads are NOT split at the first blank line") {
    val dir = new java.io.File("/tmp/graft_test_warc_rawhtml")
    dir.mkdirs()
    // a blank line INSIDE the markup — under the old unconditional HTTP
    // split this dropped everything before "tail"
    val rawHtml = "<html><body><p>head part</p>\r\n\r\n<p>tail part</p></body></html>"
    java.nio.file.Files.write(new java.io.File(dir, "raw.warc").toPath,
      rec("response", "http://example.com/raw", rawHtml.getBytes(UTF_8),
        "text/html"))
    val docs = WarcSource.warcToDocuments(
      WarcSource.readWarc(spark, s"$dir/raw.warc", gzipped = false)).collect()
    assert(docs.length == 1)
    assert(docs.head.getAs[String]("text") == "head part tail part",
      s"got '${docs.head.getAs[String]("text")}'")
  }

  test("htmlText: numeric character references decode/strip; no double-decode of escaped entities") {
    import spark.implicits._
    val df = Seq(
      // &#160; / &#xA0; (nbsp), &#8217;/&#x2019; (apostrophe) decode;
      // an uncommon ref (&#9731; snowman) strips to a space;
      // &#38;/&#x26; decode to & LAST
      "A&#160;B&#xA0;C it&#8217;s it&#x2019;s x&#9731;y a&#38;b c&#x26;d " +
        "Fish&#0160;&#038;&#x026; chips&#08217;",
      // escaped entities must survive as literal text (single decode only)
      "&amp;lt; &amp;#8217; &amp;amp;").toDF("h")
      .select(WarcSource.htmlText(col("h")).as("t"))
    val got = df.collect().map(_.getString(0))
    assert(got(0) == "A B C it’s it’s x y a&b c&d Fish && chips’",
      s"got '${got(0)}'")
    assert(got(1) == "&lt; &#8217; &amp;", s"double-decode: got '${got(1)}'")
    assert(!df.queryExecution.executedPlan.toString.contains("UDF"))
  }

  test("readWarc fails loud on trailing non-gzip bytes (dropped-member defense)") {
    val dir = new java.io.File("/tmp/graft_test_warc_trail")
    dir.mkdirs()
    val gz = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(gz)
    g.write(rec("response", "http://example.com/a", html)); g.finish(); g.close()
    // SMALL garbage — small enough to sit entirely inside the inflater
    // read-ahead, the case the JDK reader's heuristic swallows silently;
    // the explicit-framing reader must fail loud regardless
    val garbage = Array.fill[Byte](24)(0x51)
    java.nio.file.Files.write(new java.io.File(dir, "trail.warc.gz").toPath,
      gz.toByteArray ++ garbage)
    val e = intercept[org.apache.spark.SparkException] {
      WarcSource.readWarc(spark, s"$dir/trail.warc.gz").count()
    }
    def mentionsMagic(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("member magic")) ||
        mentionsMagic(t.getCause))
    assert(mentionsMagic(e),
      s"expected loud member-magic failure, got: ${e.getMessage.take(200)}")
  }

  test("warcToMedia: image responses flow into the multimodal decode pass") {
    // a real 7x5 PNG, so the crawl->media->decodeMeta chain exercises the
    // actual header parse, not the stub
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val dir = new java.io.File("/tmp/graft_test_warc_media")
    dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "m.warc").toPath,
      rec("response", "http://example.com/logo.png", png, "image/png") ++
        rec("response", "http://example.com/page", html) ++
        rec("response", "http://example.com/clip", Array.fill[Byte](24)(3),
          "video/mp4"))
    val recs = WarcSource.readWarc(spark, s"$dir/m.warc", gzipped = false)
    val media = WarcSource.warcToMedia(recs)
    val rows = media.orderBy("offset").collect()
    // the HTML response is NOT media; image + video are, with provenance
    assert(rows.map(_.getAs[String]("modality")).toSeq == Seq("image", "video"))
    assert(rows.head.getAs[String]("url") == "http://example.com/logo.png" &&
      rows.head.getAs[String]("file") == "m.warc")
    val meta = graft.operators.Multimodal
      .decodeMeta(media, graft.operators.ImageIODecoder)
      .filter(col("modality") === "image").head()
    assert(meta.getAs[String]("format") == "png" &&
      meta.getAs[Int]("width") == 7 && meta.getAs[Int]("height") == 5,
      s"real PNG header must decode: $meta")
  }

  test("graft_warc TVFs: crawl segments queryable from pure SQL, plans compose") {
    val fixture = new java.io.File(
      "src/test/resources/fixtures/warc_gen12/seg-00000.warc.gz").getAbsolutePath
    val prev = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
      // header-only census through SQL: aggregation composes on the TVF
      val census = s2.sql(
        s"""SELECT warcType, count(*) AS n
           |FROM graft_warc('$fixture', false)
           |GROUP BY warcType ORDER BY warcType""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(census == Seq("conversion" -> 1L, "response" -> 4L,
        "warcinfo" -> 1L), census.toString)
      // documents bridge + predicate in the enclosing query
      val docs = s2.sql(
        s"""SELECT url FROM graft_warc_docs('$fixture')
           |WHERE text LIKE 'Graft%' ORDER BY url""".stripMargin)
        .collect().map(_.getString(0)).toSeq
      assert(docs == Seq("http://example.org/alpha", "http://example.org/alpha"))
      // media bridge
      val media = s2.sql(
        s"SELECT modality, url FROM graft_warc_media('$fixture')").collect()
      assert(media.length == 1 && media.head.getString(0) == "image")
      // revisit bridge: crawler dedup verdicts from pure SQL, aggregable
      val f13 = new java.io.File(
        "src/test/resources/fixtures/warc_gen13/seg-00000.warc.gz")
        .getAbsolutePath
      val rv = s2.sql(
        s"""SELECT count(1) AS n, count(DISTINCT payload_digest) AS d
           |FROM graft_warc_revisits('$f13')""".stripMargin).head()
      assert(rv.getLong(0) == 3 && rv.getLong(1) == 1, rv.toString)
      // disposition census from pure SQL, quality threshold as a literal
      val f14 = new java.io.File(
        "src/test/resources/fixtures/warc_gen14/seg-00000.warc.gz")
        .getAbsolutePath
      val dc = s2.sql(
        s"""SELECT disposition, count(1) AS n
           |FROM graft_warc_dispositions('$f14', 0.35)
           |WHERE disposition IN ('below_quality', 'document')
           |GROUP BY 1 ORDER BY 1""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(dc == Seq("below_quality" -> 1L, "document" -> 19L), dc.toString)
      // non-literal glob fails loud
      val e = intercept[Exception](
        s2.sql("SELECT * FROM graft_warc(concat('a', 'b'))").collect())
      assert(e.getMessage.contains("literal"))
      // NOT s2.stop(): the two sessions share one SparkContext — stopping
      // it would kill every later suite in this JVM
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
    }
  }

  test("htmlText is a pure Column pipeline (no UDF): survives codegen and nulls") {
    import spark.implicits._
    val df = Seq(
      ("<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>"),
      (null: String)).toDF("h")
      .select(WarcSource.htmlText(col("h")).as("t"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("a <tag> \"q\" 's'"))
    assert(got(1).isEmpty, "null html stays null")
    // no ScalaUDF anywhere in the plan — the extraction is codegen'd
    assert(!df.queryExecution.executedPlan.toString.contains("UDF"),
      "htmlText must stay expression-only")
  }

  test("HTTP-envelope routing: the REAL payload type drives both bridges") {
    // a real PNG so the enveloped-media path proves byte-exact body slicing
    val img = new java.awt.image.BufferedImage(9, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val dir = new java.io.File("/tmp/graft_test_warc_envelope")
    dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "e.warc").toPath,
      // enveloped PNG: media despite the application/http WARC type
      rec("response", "http://e.test/pic.png",
        ("HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n").getBytes(UTF_8)
          ++ png) ++
        // enveloped JSON: neither text nor media — silently-dropped class
        rec("response", "http://e.test/api",
          ("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n" +
            "{\"k\": [1, 2]}").getBytes(UTF_8)) ++
        // server lies octet-stream; crawler's sniffer recorded text/html —
        // WARC-Identified-Payload-Type must win
        rec("response", "http://e.test/sniffed",
          ("HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n" +
            "\r\n<html><body>Actually HTML.</body></html>").getBytes(UTF_8),
          extra = Seq("WARC-Identified-Payload-Type: text/html")) ++
        // enveloped HTML, the happy path, still routed
        rec("response", "http://e.test/page", html))
    val recs = WarcSource.readWarc(spark, s"$dir/e.warc", gzipped = false)
    val docs = WarcSource.warcToDocuments(recs)
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(docs.keySet == Set("http://e.test/sniffed", "http://e.test/page"),
      s"routing must pass html (declared or sniffed) and drop png/json: " +
        s"${docs.keySet}")
    assert(docs("http://e.test/sniffed") == "Actually HTML.")
    val media = WarcSource.warcToMedia(recs).collect()
    assert(media.length == 1 && media.head.getAs[String]("modality") == "image")
    assert(java.util.Arrays.equals(
      media.head.getAs[Array[Byte]]("payload"), png),
      "enveloped media payload must be the exact body bytes, headers sliced")
    val meta = graft.operators.Multimodal.decodeMeta(
      WarcSource.warcToMedia(recs), graft.operators.ImageIODecoder).head()
    assert(meta.getAs[String]("format") == "png" &&
      meta.getAs[Int]("width") == 9 && meta.getAs[Int]("height") == 3,
      s"enveloped PNG must decode from its body bytes: $meta")
  }

  test("charset routing: the HTTP charset= parameter drives the text decode") {
    val dir = new java.io.File("/tmp/graft_test_warc_charset")
    dir.mkdirs()
    val cp1252 = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=windows-1252\r\n\r\n").getBytes(UTF_8) ++
      "<p>Caf".getBytes(UTF_8) ++ Array(0xE9.toByte) ++
      " ".getBytes(UTF_8) ++ Array(0x93.toByte) ++ "q".getBytes(UTF_8) ++
      Array(0x94.toByte) ++ "</p>".getBytes(UTF_8)
    val sjis = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain; charset=Shift_JIS\r\n\r\nTokyo ").getBytes(UTF_8) ++
      "東京".getBytes("Shift_JIS")
    // a RAW text/html record (no HTTP headers at all) whose charset only
    // the document's own meta tag declares — the HTML5-common shape
    val rawMeta =
      "<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\"></head><body>r"
        .getBytes(UTF_8) ++ Array(0xE9.toByte) ++ "sum".getBytes(UTF_8) ++
        Array(0xE9.toByte) ++ "</body></html>".getBytes(UTF_8)
    // a RAW record whose charset lives on the WARC-LEVEL Content-Type
    // (no HTTP layer at all) — the legacy shape must still decode
    val rawWarcCs = "r".getBytes(UTF_8) ++ Array(0xE9.toByte) ++
      "el".getBytes(UTF_8)
    java.nio.file.Files.write(new java.io.File(dir, "c.warc").toPath,
      rec("response", "http://c.test/cafe", cp1252) ++
        rec("response", "http://c.test/tokyo", sjis) ++
        rec("response", "http://c.test/meta", rawMeta, "text/html") ++
        rec("response", "http://c.test/warccs", rawWarcCs,
          "text/plain; charset=windows-1252"))
    val docs = WarcSource.warcToDocuments(
        WarcSource.readWarc(spark, s"$dir/c.warc", gzipped = false))
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(docs("http://c.test/cafe") == "Café “q”",
      s"windows-1252 must decode per the charset param: " +
        s"'${docs("http://c.test/cafe")}'")
    assert(docs("http://c.test/tokyo") == "Tokyo 東京",
      "Shift_JIS (outside the built-in decode whitelist) must decode")
    assert(docs("http://c.test/meta") == "résumé",
      s"raw html must honor its meta http-equiv charset: " +
        s"'${docs("http://c.test/meta")}'")
    assert(docs("http://c.test/warccs") == "réel",
      "a raw record's WARC-level charset= parameter must drive the decode")
  }

  test("charset_decode: REPLACE on malformed bytes, UTF-8 fallback on junk labels") {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val bad = Array(0x48.toByte, 0x69.toByte, 0xC3.toByte) // "Hi" + torn UTF-8
    val rows = Seq(
      (1L, bad, "utf-8"),
      (2L, bad, "no-such-charset-label"),  // unknown label -> UTF-8, no throw
      (3L, "ok".getBytes(UTF_8), ""),      // empty label -> UTF-8
      (4L, null.asInstanceOf[Array[Byte]], "utf-8"))
      .toDF("id", "payload", "cs")
      .select(col("id"),
        graft.functions.VectorFunctions
          .charset_decode(col("payload"), col("cs")).as("t"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "Hi�",
      "malformed UTF-8 must REPLACE, never throw (ANSI decode would)")
    assert(rows(1).getString(1) == "Hi�",
      "an unknown charset label must fall back to UTF-8, never throw")
    assert(rows(2).getString(1) == "ok")
    assert(rows(3).isNullAt(1), "null payload stays null")
    // and the SQL spelling resolves through the registry
    val viaSql = spark.sql(
      "SELECT charset_decode(encode('x', 'UTF-8'), 'windows-1252')").head()
    assert(viaSql.getString(0) == "x")
  }

  test("warcToRevisits: the crawler's dedup verdicts surface, not drop") {
    val dir = new java.io.File("/tmp/graft_test_warc_revisit")
    dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "r.warc").toPath,
      rec("revisit", "http://r.test/page",
        "HTTP/1.1 304 Not Modified\r\n\r\n".getBytes(UTF_8),
        extra = Seq(
          "WARC-Refers-To-Date: 2025-12-31T00:00:00Z",
          "WARC-Payload-Digest: sha1:AAAABBBB",
          "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest")) ++
        rec("response", "http://r.test/other", html))
    val recs = WarcSource.readWarc(spark, s"$dir/r.warc", gzipped = false)
    val rv = WarcSource.warcToRevisits(recs).collect()
    assert(rv.length == 1)
    assert(rv.head.getAs[String]("url") == "http://r.test/page" &&
      rv.head.getAs[String]("original_date") == "2025-12-31T00:00:00Z" &&
      rv.head.getAs[String]("payload_digest") == "sha1:AAAABBBB")
    // and revisits never leak into the documents table
    assert(WarcSource.warcToDocuments(recs)
      .filter(col("url") === "http://r.test/page").count() == 0)
  }

  test("http_body_decode: chunked/gzip/deflate kernels, drops on junk") {
    import graft.functions.HttpBodyKernels._
    // chunked: reassembly, extension tolerance, trailer ignorance
    val ch = "5;ext=1\r\nHello\r\n7\r\n, world\r\n0\r\nX-T: v\r\n\r\n"
      .getBytes(UTF_8)
    assert(new String(dechunk(ch), UTF_8) == "Hello, world")
    // truncated tail (crawler size cap): keep what arrived
    assert(new String(dechunk("5\r\nHello\r\n7\r\n, wo".getBytes(UTF_8)),
      UTF_8) == "Hello, wo")
    // framing violation with bytes remaining: null, not garbage
    assert(dechunk("zz\r\nHello\r\n".getBytes(UTF_8)) == null)
    // gzip roundtrip + corrupt-input null
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write("payload".getBytes(UTF_8)); g.close()
    assert(new String(gunzip(bo.toByteArray), UTF_8) == "payload")
    assert(gunzip("not gzip at all".getBytes(UTF_8)) == null)
    // deflate: zlib AND the raw shape many servers send
    val zl = { val d = new java.util.zip.Deflater()
      d.setInput("zlib body".getBytes(UTF_8)); d.finish()
      val b = new Array[Byte](64); val n = d.deflate(b); b.take(n) }
    assert(new String(inflate(zl), UTF_8) == "zlib body")
    val raw = { val d = new java.util.zip.Deflater(-1, true)
      d.setInput("raw body".getBytes(UTF_8)); d.finish()
      val b = new Array[Byte](64); val n = d.deflate(b); b.take(n) }
    assert(new String(inflate(raw), UTF_8) == "raw body")
    // coding router: unknown codings are null (drop), identity passes
    def dec(body: Array[Byte], te: String, ce: String) =
      decodeBody(body, org.apache.spark.unsafe.types.UTF8String.fromString(te),
        org.apache.spark.unsafe.types.UTF8String.fromString(ce))
    assert(dec("x".getBytes(UTF_8), "", "br") == null)
    assert(dec("x".getBytes(UTF_8), "gzip, chunked", "") == null)
    assert(new String(dec("x".getBytes(UTF_8), "identity", "Identity"),
      UTF_8) == "x")
  }

  test("html_to_text: single-pass kernel is value-identical to the regex chain") {
    import spark.implicits._
    // handcrafted edges, each pinning one regex-chain behavior the kernel
    // must replicate exactly
    val edge = Seq(
      "", "plain text", "a  b\t\nc",
      "<html><body>x</body></html>",
      "<script>var a=1;</script>after",
      "<SCRIPT foo>x</sCrIpT>y", // case-insensitive open AND close
      "<scriptfoo>hidden</script>visible", // no word boundary: opens a block
      "<script>unclosed", // tag stripped by pass 2, the JS TEXT remains
      "<style>p{}</style>z",
      "<!-- comment -->x",
      "<!-- unclosed <script>y</script> tail", // interior block still removed
      "<!-- unclosed > tail", // generic tag rule eats to the first '>'
      "a<b-unclosed tail", // '<' with no '>' stays literal
      "&amp;lt; &lt; &gt; &quot; &apos; &nbsp;x",
      "&amp;amp; &AMP; &times; &unknown;", // case-sensitive; unknown stays
      "&#160;&#00160;&#x2019;&#X2013;&#038;&#x26;&#0038;",
      "&#00000160;done", // unbounded leading zeros on TABLE values
      "&#00000001;", // 8 decimal digits: over the strip cap, stays literal
      "&#1234567;", // 7 digits: stripped to a space
      "&#12345678;", // 8 digits: literal
      "&#x10FFF;", // 5 hex digits: stripped
      "&#x1234567;", // 7 hex digits: literal
      "&#;", "&#x;", "&#xGG;", "&", "&&amp;lt;", "&#38 x",
      "<p>Caf&eacute;</p>", "t &hellip;&middot;&copy;&reg;&trade;",
      "&ndash;&mdash;&lsquo;&rsquo;&ldquo;&rdquo;",
      "<b><script>x</script></b>", "<script>a <!-- b --> c</script>d",
      "<!-- <script> -->x</script>", "<script <!-- >y",
      "<script/>self-closing", "</script>stray close",
      "a\u00A0b", // RAW U+00A0 is not ASCII whitespace: preserved
      "<div title=\"a > b\">x</div>", // regex strips to the FIRST '>'
      "  leading and trailing  ", "\f\r vertical ws ")
    // seeded fuzz over html-ish building blocks — the composition space
    // where hand reasoning runs out
    val rnd = new scala.util.Random(7)
    val pieces = Array("<p>", "</p>", "<script>", "</script>", "<style>",
      "</style>", "<!--", "-->", "&amp;", "&lt;", "&#160;", "&#x2019;",
      "&#038;", "&eacute;", "&bogus;", "&#99999999;", "&#xA0;", "text",
      " ", "\n", "<", ">", "&", ";", "<b foo=1>", "word", "x<y", "5>3",
      "<scriptfoo>", "</ script>", "<!-- x", "\t", "é", "東京", "&#", "#x26;")
    val fuzz = (0 until 800).map(_ =>
      (0 until (1 + rnd.nextInt(20)))
        .map(_ => pieces(rnd.nextInt(pieces.length))).mkString)
    graft.functions.VectorFunctions.register(spark)
    val diff = (edge ++ fuzz).toDF("h")
      .select(col("h"), WarcSource.htmlText(col("h")).as("ref"),
        call_function("html_to_text", col("h")).as("fast"))
      .filter(!(col("ref") <=> col("fast")))
      .collect()
    assert(diff.isEmpty, diff.take(5).map(r =>
      s"input=<${r.getString(0)}> ref=<${r.getString(1)}> " +
        s"fast=<${r.getString(2)}>").mkString("\n"))
    // null passthrough
    assert(Seq[Option[String]](None).toDF("h")
      .select(call_function("html_to_text", col("h"))).head().isNullAt(0))
  }

  test("http_body_decode: zstd coding decodes via the classpath zstd-jni") {
    import graft.functions.HttpBodyKernels.decodeBody
    def dec(body: Array[Byte], te: String, ce: String) =
      decodeBody(body, org.apache.spark.unsafe.types.UTF8String.fromString(te),
        org.apache.spark.unsafe.types.UTF8String.fromString(ce))
    val src = "zstd payload body works".getBytes(UTF_8)
    val comp = com.github.luben.zstd.Zstd.compress(src, 3)
    assert(new String(dec(comp, "", "zstd"), UTF_8) ==
      "zstd payload body works")
    // malformed zstd bytes drop (null), never throw
    assert(dec("not a zstd frame".getBytes(UTF_8), "", "zstd") == null)
    // chunked + zstd compose like chunked + gzip
    val chunkedZstd =
      (f"${comp.length}%x\r\n".getBytes(UTF_8) ++ comp ++
        "\r\n0\r\n\r\n".getBytes(UTF_8))
    assert(new String(dec(chunkedZstd, "chunked", "zstd"), UTF_8) ==
      "zstd payload body works")
  }

  test("charset_decode strips a leading BOM (it is a signature, not content)") {
    import org.apache.spark.unsafe.types.UTF8String
    def d(bytes: Array[Byte], cs: String): String =
      graft.functions.CharsetDecodeKernel
        .decode(bytes, UTF8String.fromString(cs)).toString
    val utf8Bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    assert(d(utf8Bom ++ "hi".getBytes(UTF_8), "utf-8") == "hi")
    val le = Array(0xFF.toByte, 0xFE.toByte) ++
      "déjà".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    assert(d(le, "UTF-16LE") == "déjà")
    val be = Array(0xFE.toByte, 0xFF.toByte) ++
      "ok".getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    assert(d(be, "UTF-16BE") == "ok")
    // no BOM → nothing stripped; junk labels still fall back (and the
    // negative cache keeps repeated junk cheap — same answer every time)
    assert(d("plain".getBytes(UTF_8), "utf-8") == "plain")
    (0 until 3).foreach(_ =>
      assert(d("x".getBytes(UTF_8), "utf8mb4-nonsense") == "x"))
  }

  test("warc_gen14 fixture replays: silent-loss corpus pinned") {
    val fixture = new java.io.File(
      "src/test/resources/fixtures/warc_gen14/seg-00000.warc.gz").getAbsolutePath
    val recs = WarcSource.readWarc(spark, fixture)
    assert(recs.count() == 35)
    val docs = WarcSource.warcToDocuments(recs)
      .select("offset", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.keySet == Set(1L, 2L, 3L, 8L, 9L, 10L, 12L, 15L, 16L, 18L,
      19L, 20L, 21L, 22L, 23L, 24L, 27L, 29L, 30L, 34L),
      s"gen14 doc routing drifted: ${docs.keySet}")
    assert(docs(19L) == "XHTML page works.",
      "enveloped application/xhtml+xml must route to the text bridge")
    assert(docs(20L) == "Served as XML.",
      "XHTML served as text/xml must route via the body-head sniff")
    assert(docs(21L) == "Untyped XHTML.",
      "the untyped sniff must know the XML-prolog shape")
    assert(docs(22L) == "Zstandard coding decodes fine.",
      "Content-Encoding: zstd must decode, not drop")
    assert(docs(23L) == "UTF-16 déjà vu.",
      "a UTF-16LE BOM must drive the decode when the server is silent")
    assert(docs(24L) == "Resource capture.",
      "wget/heritrix resource records must route like responses")
    assert(docs(34L) == "BOM sniffed fine.",
      "the untyped sniff must see through a UTF-8 BOM")
    assert(docs(29L) == "Prologue café declares its own encoding.",
      "the XML prolog's encoding= must drive the decode of routed XHTML")
    assert(docs(30L) == "Méta charset inside an XML document.",
      "the meta-charset arm must fire for xml-routed types, not just html")
    assert(WarcSource.warcToMedia(recs).count() == 3,
      "raw, enveloped AND resource PNGs must all reach the media bridge")
    // the disposition census mirrors the bridges exactly — including the
    // feed NOT leaking into documents and the quality gate's view
    val disp = WarcSource.warcToDispositions(recs, minQuality = 0.35)
      .groupBy("disposition").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(disp == Map("document" -> 19L, "media" -> 3L, "revisit" -> 3L,
      "non_document_type" -> 1L, "non_text_type" -> 3L,
      "unsupported_coding" -> 1L, "malformed_envelope" -> 1L,
      "non_success_status" -> 2L, "empty_text" -> 1L,
      "below_quality" -> 1L), s"dispositions drifted: $disp")
    // the status gate: 404/301 bodies are error/redirect stubs, not text
    assert(!docs.contains(31L) && !docs.contains(32L),
      "non-2xx response bodies must never land in the documents table")
  }

  test("warc_gen15 fixture replays: WARC-Truncated captures are visible") {
    val fixture = new java.io.File(
      "src/test/resources/fixtures/warc_gen15/seg-00000.warc.gz").getAbsolutePath
    val recs = WarcSource.readWarc(spark, fixture)
    assert(recs.count() == 36)
    val docs = WarcSource.warcToDocuments(recs)
      .select("offset", "text", "truncated").collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2))))
      .toMap
    // the cut-off page LANDS (a fragment is data) but carries the reason
    assert(docs(35L) == ("Length cap hit: this capture stops mid-sent",
      Some("length")),
      "a WARC-Truncated capture must land with its reason surfaced")
    // every complete capture carries null — the column never invents flags
    assert(docs.removed(35L).values.forall(_._2.isEmpty),
      "complete captures must have truncated = null")
    // census view: the flag is orthogonal to the disposition
    val disp = WarcSource.warcToDispositions(recs)
      .filter(col("offset") === 35).select("disposition", "truncated")
      .head()
    assert(disp.getString(0) == "document" && disp.getString(1) == "length")
    // a bare WARC-Truncated header (no value) means unspecified per the
    // WARC 1.0 spec — exercised off-fixture via a synthetic record
    import spark.implicits._
    val bare = WarcSource.WarcRecord("f.warc.gz", 0L, "response",
      "http://x.test/bare", "2026-01-01T00:00:00Z", "text/html", 20L,
      Map("warc-truncated" -> ""),
      "<html><body>cut</body></html>".getBytes(UTF_8))
    assert(WarcSource.warcToDocuments(Seq(bare).toDF())
      .select("truncated").head().getString(0) == "unspecified")
  }

  test("warc_gen16 fixture replays: br coding decodes, junk br still drops") {
    val fixture = new java.io.File(
      "src/test/resources/fixtures/warc_gen16/seg-00000.warc.gz").getAbsolutePath
    val recs = WarcSource.readWarc(spark, fixture)
    assert(recs.count() == 37)
    val docs = WarcSource.warcToDocuments(recs)
      .select("offset", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs(36L) == "Brotli coding decodes natively.",
      "Content-Encoding: br must decode through BrotliKernel")
    assert(!docs.contains(17L),
      "malformed br bytes must still drop, not garble")
    val disp = WarcSource.warcToDispositions(recs)
      .filter(col("offset").isin(17, 36))
      .select("offset", "disposition").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(disp == Map(17L -> "unsupported_coding", 36L -> "document"))
  }

  test("warc_gen17 fixture replays: main_text drops chrome, text keeps it") {
    val fixture = new java.io.File(
      "src/test/resources/fixtures/warc_gen17/seg-00000.warc.gz").getAbsolutePath
    val recs = WarcSource.readWarc(spark, fixture)
    assert(recs.count() == 38)
    val row = WarcSource.warcToDocuments(recs, withMainText = true)
      .filter(col("offset") === 37).select("text", "main_text").head()
    val text = row.getString(0)
    val main = row.getString(1)
    // the full extraction keeps the chrome (deterministic, replayable)
    assert(text.contains("Home About Contact") &&
      text.contains("uses cookies") && text.contains("Privacy"),
      s"text must keep the chrome: $text")
    // main_text keeps ONLY the prose: nav (structural), cookie banner
    // (class heuristic) and link-farm footer (link density) all drop
    assert(main.startsWith("Graft extracts the main article content") &&
      main.endsWith("prose stays in the corpus."), s"main_text: $main")
    assert(!main.contains("cookies") && !main.contains("Home") &&
      !main.contains("Privacy"), s"main_text must drop the chrome: $main")
    // markup-free routes pass through as identity
    val wet = WarcSource.warcToDocuments(recs, withMainText = true)
      .filter(col("offset") === 3).select("text", "main_text").head()
    assert(wet.getString(0) == wet.getString(1))
    // flag off → no main_text column (schema stays what it always was)
    assert(!WarcSource.warcToDocuments(recs).columns.contains("main_text"))
  }

  test("bridges stay mutually exclusive: html-ish svg+xml is media, not text") {
    import spark.implicits._
    // a misconfigured server serving an HTML error page under a media
    // +xml type: exactly one bridge may claim it (double-landing a record
    // in documents AND media would double-count it corpus-wide)
    val svg = WarcSource.WarcRecord("f.warc.gz", 0L, "response",
      "http://x.test/fake.svg", "2026-01-01T00:00:00Z", "image/svg+xml",
      34L, Map.empty,
      "<html><body>error page</body></html>".getBytes(UTF_8))
    val df = Seq(svg).toDF()
    assert(WarcSource.warcToMedia(df).count() == 1)
    assert(WarcSource.warcToDocuments(df).count() == 0,
      "a media-typed record must never also land in documents")
    assert(WarcSource.warcToDispositions(df)
      .select("disposition").head().getString(0) == "media")
  }

  test("warc_gen13 fixture replays: envelope corpus pinned") {
    val fixture = new java.io.File(
      "src/test/resources/fixtures/warc_gen13/seg-00000.warc.gz").getAbsolutePath
    val recs = WarcSource.readWarc(spark, fixture)
    assert(recs.count() == 19)
    val docs = WarcSource.warcToDocuments(recs)
      .select("offset", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.keySet == Set(1L, 2L, 3L, 8L, 9L, 10L, 12L, 15L, 16L, 18L),
      s"gen13 doc routing drifted: ${docs.keySet}")
    assert(docs(18L) == "Untyped but HTML.",
      "missing Content-Type + html-ish body must route, not vanish")
    assert(docs(15L) == "Chunked body works." &&
      docs(16L) == "Gzip body works.",
      "transfer/content codings must decode before extraction")
    assert(docs(8L) == "Café “smart” – dash")
    assert(docs(10L) == "Tokyo 東京 note")
    assert(docs(12L) == "naïve résumé",
      "meta-charset fallback must decode the HTML5-common shape")
    assert(WarcSource.warcToMedia(recs).count() == 2,
      "raw AND enveloped PNG must both reach the media bridge")
    assert(WarcSource.warcToRevisits(recs).count() == 3)
  }
}
