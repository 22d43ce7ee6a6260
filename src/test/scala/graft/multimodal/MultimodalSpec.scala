package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("feature extraction is deterministic and schema-stable") {
    val a = Multimodal.documentFeatures(spark, TestSpark.sfDir)
    assert(a.schema.fieldNames ===
      Array("id", "kind", "nBytes", "sha256", "width", "height", "frames"))
    val r1 = a.collect().sortBy(_.getLong(0))
    val r2 = Multimodal.documentFeatures(spark, TestSpark.sfDir)
      .collect().sortBy(_.getLong(0))
    assert(r1 === r2)
    assert(r1.length === 500)
  }

  test("decode stub derives stable pseudo-dimensions") {
    val bytes = "hello world, a fake image".getBytes("UTF-8")
    val (w1, h1, f1) = Multimodal.decodeStub(bytes)
    val (w2, h2, f2) = Multimodal.decodeStub(bytes)
    assert((w1, h1, f1) === (w2, h2, f2))
    assert(w1 === bytes.length % 640)
    val (w0, h0, f0) = Multimodal.decodeStub(Array.emptyByteArray)
    assert((w0, h0, f0) === (0, 0, 1))
  }

  test("resize fits the target box metadata and never grows content") {
    val media = Multimodal.fromDocuments(spark, TestSpark.sfDir)
    val before = media.collect().map(r => r.id -> r.content.length).toMap
    val resized = Multimodal.resize(media, 64, 64).collect()
    assert(resized.length === before.size)
    resized.foreach { r =>
      assert(r.declaredWidth === 64 && r.declaredHeight === 64)
      assert(r.content.length <= before(r.id))
      assert(r.content.nonEmpty)
    }
    // deterministic across runs
    val again = Multimodal.resize(
      Multimodal.fromDocuments(spark, TestSpark.sfDir), 64, 64)
      .collect().map(r => r.id -> r.content.toSeq).toMap
    assert(resized.map(r => r.id -> r.content.toSeq).toMap === again)
  }

  test("frame sampling explodes to every Nth frame and partitions bytes") {
    val media = Multimodal.fromDocuments(spark, TestSpark.sfDir)
    val everyN = 7
    val expected = media.collect().map { r =>
      val (_, _, frames) = Multimodal.decodeStub(r.content)
      r.id -> (0 until frames by everyN).size
    }.toMap
    val frames = Multimodal.sampleFrames(media, everyN).collect()
    val got = frames.groupBy(_.id).map { case (k, v) => k -> v.length }
    assert(got === expected)
    frames.foreach(f => assert(f.frameIdx % everyN === 0))
  }

  test("sha256 matches Spark's own sha2 over the same bytes") {
    import org.apache.spark.sql.functions._
    val viaSql = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("sha"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaLib = Multimodal.documentFeatures(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(viaLib === viaSql)
  }
}
