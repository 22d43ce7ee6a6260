package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The DataSource V2 range source: split planning = the reference's
  * `Input.createReaders`, pushdown = shard-range pruning. */
class RangeSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def read(start: Long, end: Long, shards: Int) =
    spark.read.format("graft.sources.v2.RangeSource")
      .option("start", start.toString).option("end", end.toString)
      .option("shards", shards.toString).load()

  test("produces exactly [start, end) and matches spark.range") {
    val df = read(5, 1005, 8)
    assert(df.count() === 1000)
    val expected = spark.range(5, 1005).agg(org.apache.spark.sql.functions
      .sum("id")).head.getLong(0)
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      === expected)
  }

  test("plans one partition per shard, remainder spread evenly") {
    val df = read(0, 10, 4)
    assert(df.rdd.getNumPartitions === 4)
    // 10 rows over 4 shards: 3,3,2,2
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect().sorted
    assert(sizes.toSeq === Seq(2, 2, 3, 3))
  }

  test("range filters push down and prune shards before scheduling") {
    val df = read(0, 1000000, 32).where("id >= 999990 AND id < 999995")
    // pushdown tightens [start,end) to 5 rows → a single non-empty split
    assert(df.rdd.getNumPartitions === 1)
    assert(df.count() === 5)
    val descs = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.description()
    }
    assert(descs.exists(_.contains("pruned to [999990, 999995)")),
      descs.mkString("; "))
  }

  test("contradictory range yields zero partitions, not an error") {
    val df = read(0, 100, 4).where("id > 500")
    assert(df.count() === 0)
    assert(df.rdd.getNumPartitions === 0)
  }

  test("equality filter narrows to exactly one row") {
    val df = read(0, 1000, 8).where("id = 123")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(123L))
  }

  test("whole-table aggregates push completely into the source") {
    import org.apache.spark.sql.functions._
    val df = read(0, 1000000, 32).where("id < 600000")
      .agg(count(lit(1)).as("n"), min("id").as("mn"),
        max("id").as("mx"), sum("id").as("sm"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AGGREGATED"), p.take(400))
    assert(!p.contains("HashAggregate"), "no Aggregate node may remain")
    val r = df.head()
    assert(r.getLong(0) === 600000L && r.getLong(1) === 0L &&
      r.getLong(2) === 599999L && r.getLong(3) === 599999L * 600000L / 2)
  }

  test("aggregate over an empty pruned range keeps SQL null semantics") {
    import org.apache.spark.sql.functions._
    val r = read(0, 100, 4).where("id > 500")
      .agg(count(lit(1)), min("id"), max("id"), sum("id")).head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("grouped or unsupported aggregates fall back to the row scan") {
    import org.apache.spark.sql.functions._
    val grouped = read(0, 1000, 4)
      .groupBy((col("id") % 2).as("par")).agg(count(lit(1)).as("n"))
    val gp = grouped.queryExecution.executedPlan.toString
    assert(!gp.contains("AGGREGATED"), "grouping must not claim pushdown")
    assert(grouped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(0L -> 500L, 1L -> 500L))
    val sd = read(0, 1000, 4).agg(stddev(col("id")))
    assert(!sd.queryExecution.executedPlan.toString.contains("AGGREGATED"),
      "stddev is not a closed form the source claims")
    assert(math.abs(sd.head().getDouble(0) - 288.819) < 0.01)
  }

  test("SUM that overflows Long declines pushdown (ANSI error preserved)") {
    import org.apache.spark.sql.functions._
    // sum of [4e18, 4e18+10) ≈ 4e19 > Long.MaxValue: complete pushdown
    // would silently wrap; declining leaves Spark's own aggregate to
    // raise ARITHMETIC_OVERFLOW under ANSI mode.
    val big = read(4000000000000000000L, 4000000000000000010L, 2)
      .agg(sum("id").as("sm"))
    assert(!big.queryExecution.executedPlan.toString.contains("AGGREGATED"),
      "overflowing SUM must not claim complete pushdown")
    val e = intercept[Exception] { big.head() }
    assert(e.getMessage.contains("overflow") ||
      e.getMessage.contains("ARITHMETIC_OVERFLOW"), e.getMessage)
    // count/min/max over the same range still push (no overflow there)
    val ok = read(4000000000000000000L, 4000000000000000010L, 2)
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
    assert(ok.queryExecution.executedPlan.toString.contains("AGGREGATED"))
    val r = ok.head()
    assert(r.getLong(0) === 10L && r.getLong(1) === 4000000000000000000L &&
      r.getLong(2) === 4000000000000000009L)
  }

  test("avg rewrites to pushed sum/count and stays source-answered") {
    import org.apache.spark.sql.functions._
    val avg = read(0, 1000, 4).agg(org.apache.spark.sql.functions.avg("id"))
    assert(avg.queryExecution.executedPlan.toString.contains("AGGREGATED"),
      "Spark decomposes avg into sum + count, both closed-form here")
    assert(avg.head().getDouble(0) === 499.5)
  }
}
