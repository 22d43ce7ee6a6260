package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SaltingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals a plain join on skewed data") {
    // 10k rows all sharing one hot key + a long tail
    val large = spark.range(10000)
      .selectExpr("CASE WHEN id < 9000 THEN 0 ELSE id END AS k", "id AS v")
    val small = spark.range(2000).selectExpr("id AS k", "id * 10 AS w")
    val plain = large.join(small, "k")
    val salted = Salting.saltedJoin(large, small, "k", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("v"), sum("w")).collect()(0) ===
      plain.agg(sum("v"), sum("w")).collect()(0))
  }

  test("saltedCount equals a plain groupBy count") {
    val df = spark.range(5000).selectExpr("id % 7 AS k")
    val plain = df.groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(df, col("k"), salts = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedSum equals a plain groupBy sum (decimal exactness)") {
    val df = spark.range(5000)
      .selectExpr("id % 3 AS k", "CAST(id AS DECIMAL(12,2)) / 100 AS v")
    val plain = df.groupBy("k").agg(sum("v").as("total"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val salted = Salting.saltedSum(df, col("k"), col("v"), salts = 8)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, v) =>
      assert(v.compareTo(plain(k)) === 0, s"key $k")
    }
  }

  test("salted join spreads a hot key over multiple partitions") {
    val large = spark.range(1000).selectExpr("0L AS k", "id AS v")
    val small = spark.range(1).selectExpr("id AS k", "id AS w")
    val salted = large.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(8)))
    assert(salted.select("_salt").distinct().count() > 1)
    assert(Salting.saltedJoin(large, small, "k", 8).count() === 1000)
  }
}
