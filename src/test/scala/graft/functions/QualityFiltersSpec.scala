package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class QualityFiltersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "aa bb cc"),         // 3 tokens, mean len 200 cc
    (2L, "aaaa bbbb"),        // 2 tokens, mean len 400 cc
    (3L, ""),                 // empty
    (4L, "aaaaaa")            // 1 token, mean len 600 cc
  ).toDF("doc_id", "text")
    .withColumn("w", TextDedup.tokens(col("text")))

  test("meanTokenLenCentichars floors total-chars*100/tokens") {
    val got = docs
      .select(col("doc_id"),
        QualityFilters.meanTokenLenCentichars(col("w")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 200L, 2L -> 400L, 3L -> 0L, 4L -> 600L))
  }

  test("funnel counts are cumulative over sequential rules") {
    val out = QualityFilters.funnel(docs, Seq(
      "nonempty" -> (size(col("w")) >= 1),
      "short_tokens" -> (QualityFilters.meanTokenLenCentichars(col("w")) <= 400),
      "multi_token" -> (size(col("w")) >= 2)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, "nonempty", 3L),      // docs 1,2,4
      (2L, "short_tokens", 2L),  // docs 1,2 (4 has 600cc)
      (3L, "multi_token", 2L)))  // docs 1,2
  }

  test("funnel counts never increase down the chain") {
    val d = graft.core.Tables.documents(spark, TestSpark.sfDir)
      .withColumn("w", TextDedup.tokens(col("text")))
    val passes = QualityFilters.funnel(d, Seq(
      "r1" -> (size(col("w")) >= 5),
      "r2" -> (length(col("text")) >= 50),
      "r3" -> (col("lang") === "en")))
      .orderBy("stage").collect().map(_.getLong(2))
    assert(passes.sliding(2).forall { case Array(a, b) => b <= a })
  }
}
