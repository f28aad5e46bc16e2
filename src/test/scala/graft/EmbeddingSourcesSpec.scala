package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.EmbeddingSources

class EmbeddingSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonical: null vectors dropped, labels sorted+deduped+null-stripped") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq[java.lang.Short](3.toShort, 1.toShort, 3.toShort, null)),
      (2L, null, Seq[java.lang.Short](1.toShort))
    ).toDF("id", "vec", "labels")
    val out = EmbeddingSources.canonical(df, "id", "vec", Some("labels")).collect()
    assert(out.length == 1) // null-vec row dropped (build.rs:493-498)
    assert(out(0).getAs[scala.collection.Seq[Short]]("labels").toSeq == Seq(1.toShort, 3.toShort))
  }

  test("dimension enforcement fails fast on a wrong-width vector") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f))).toDF("id", "vec")
    val ex = intercept[Exception] {
      EmbeddingSources.canonical(df, "id", "vec", None, dim = 2).count()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      Option(ex.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("csv and json round-trips yield the canonical schema") {
    val dir = s"/tmp/graft_test_sources_${System.nanoTime()}"
    Seq("id,vec", "1,0.5;1.5", "2,2.5;3.5").toDF("value")
      .coalesce(1).write.text(s"$dir/csv")
    val csv = EmbeddingSources.readCsv(spark, s"$dir/csv", dim = 2)
    assert(csv.schema.fieldNames.toSeq == Seq("id", "vec", "labels"))
    assert(csv.orderBy($"id").collect()(0).getAs[scala.collection.Seq[Float]]("vec").toSeq == Seq(0.5f, 1.5f))

    Seq("""{"id": 7, "vec": [1.0, 2.0], "labels": [5, 2, 5]}""").toDF("value")
      .coalesce(1).write.text(s"$dir/json")
    val js = EmbeddingSources.readJson(spark, s"$dir/json", labelsCol = Some("labels"), dim = 2)
    val r = js.collect()(0)
    assert(r.getLong(0) == 7L &&
      r.getAs[scala.collection.Seq[Short]]("labels").toSeq == Seq(2.toShort, 5.toShort))
  }

  test("orc round-trip and packed little-endian float32 unpack") {
    val dir = s"/tmp/graft_sources_${System.nanoTime()}"
    Seq((1L, Seq(0.25f, -2.0f)), (2L, Seq(1.0f, 3.5f)))
      .toDF("id", "vec").write.orc(s"$dir/orc")
    val orc = EmbeddingSources.readOrc(spark, s"$dir/orc", dim = 2)
    assert(orc.count() == 2)
    assert(orc.orderBy($"id").collect()(0)
      .getAs[scala.collection.Seq[Float]]("vec").toSeq == Seq(0.25f, -2.0f))

    def pack(fs: Float*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(fs.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fs.foreach(b.putFloat)
      b.array()
    }
    val bin = Seq((1L, pack(0.5f, -1.25f)), (2L, pack(2.0f, 4.0f)))
      .toDF("id", "raw")
    val got = EmbeddingSources.fromPackedFloats(bin, "id", "raw", dim = 2)
      .orderBy($"id").collect()
    assert(got(0).getAs[scala.collection.Seq[Float]]("vec").toSeq == Seq(0.5f, -1.25f))
    assert(got(1).getAs[scala.collection.Seq[Float]]("vec").toSeq == Seq(2.0f, 4.0f))
    // a 6-byte payload is not a whole number of float32s
    val bad = Seq((1L, Array[Byte](0, 0, 0, 0, 0, 0))).toDF("id", "raw")
    val err = intercept[Exception] {
      EmbeddingSources.fromPackedFloats(bad, "id", "raw").collect()
    }
    assert(err.getMessage.contains("float32") ||
      Option(err.getCause).exists(_.getMessage.contains("float32")))
  }

  test("canonical output feeds the index build directly") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c = EmbeddingSources.canonical(e, "vec_id", "embedding", None, dim = 64)
    graft.index.DiskannIndex.build(c, "id", "vec", None,
      "/tmp/graft_test_index/from_sources",
      graft.index.DiskannParams(metric = "cosine"))
    val meta = graft.index.DiskannIndex.loadMeta(spark, "/tmp/graft_test_index/from_sources")
    assert(meta.numRows == 500)
  }
}
