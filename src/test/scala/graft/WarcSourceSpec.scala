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
      contentType: String = "application/http; msgtype=response"): Array[Byte] = {
    val h = (s"WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-01-02T03:04:05Z\r\n" +
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
    assert(text == "T Hello & world ! Caf&eacute;? A B", s"got '$text'")
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
}
