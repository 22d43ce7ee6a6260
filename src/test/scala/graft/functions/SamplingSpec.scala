package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Determinism and partitioning properties of the content-hash
  * sampling operators. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ids(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).toDF("id")
  }

  test("hashSample is deterministic and scales with sixteenths") {
    val df = ids(4096)
    val one = Sampling.hashSample(df, col("id"), 1).count()
    assert(one === Sampling.hashSample(df, col("id"), 1).count(),
      "same input must give the same sample")
    val eight = Sampling.hashSample(df, col("id"), 8).count()
    // md5 nibbles are uniform: 8/16 keeps ~half, 1/16 ~ a sixteenth
    assert(math.abs(eight - 2048L) < 300, s"8/16 kept $eight of 4096")
    assert(math.abs(one - 256L) < 120, s"1/16 kept $one of 4096")
    // nested property: the 1/16 sample is a subset of the 8/16 sample
    val oneSet = Sampling.hashSample(df, col("id"), 1)
      .collect().map(_.getLong(0)).toSet
    val eightSet = Sampling.hashSample(df, col("id"), 8)
      .collect().map(_.getLong(0)).toSet
    assert(oneSet.subsetOf(eightSet))
  }

  test("splitColumn partitions every row into exactly one split") {
    val df = ids(2000).withColumn("split", Sampling.splitColumn(col("id")))
    val counts = df.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 2000L)
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("stratified returns at most perStratum rows per stratum, stably") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, (i % 3).toString)).toDF("id", "grp")
    val s1 = Sampling.stratified(df, col("grp"), col("id"), 7)
    val perGroup = s1.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.values.forall(_ === 7L))
    val again = Sampling.stratified(df, col("grp"), col("id"), 7)
      .collect().map(_.getLong(0)).toSet
    assert(again === s1.collect().map(_.getLong(0)).toSet)
  }
}
