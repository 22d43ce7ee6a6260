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
}
