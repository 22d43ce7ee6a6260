package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BloomFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloom sketch round-trip: literal form and scalar-subquery form") {
    import spark.implicits._
    BloomFunctions.register(spark)
    val df = Seq(1L, 2L, 3L).toDF("x")
    val bloom = df
      .agg(expr("graft_bloom_agg(x, CAST(100 AS BIGINT), CAST(1000 AS BIGINT))"))
      .head.getAs[Array[Byte]](0)
    val hex = BloomFunctions.sketchLiteral(bloom)
    val hits = Seq(2L, 99L).toDF("y")
      .withColumn("hit", expr(s"graft_might_contain($hex, y)"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(hits === Set((2L, true), (99L, false)))
    // scalar-subquery form: the sketch never visits the driver
    df.agg(expr("graft_bloom_agg(x, CAST(100 AS BIGINT), CAST(1000 AS BIGINT))")
        .as("sk"))
      .createOrReplaceTempView("bloom_sk")
    val probe = BloomFunctions.mightContainViaView("bloom_sk", "sk", "y")
    val hits2 = Seq(3L, 42L).toDF("y")
      .withColumn("hit", expr(probe))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(hits2 === Set((3L, true), (42L, false)))
    // no false negatives by construction: every inserted key hits
    val inserted = df.withColumn("hit", expr(s"graft_might_contain($hex, x)"))
      .filter(!col("hit")).count()
    assert(inserted === 0)
  }
}
