package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run (the fixture
  * pattern SURVEY.md §5 adopts in place of the reference's stub
  * harness). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // 8 local slots (host has 32): the suite grew to 49 Spark-heavy
      // specs + 338 smoke queries, and at local[4] the whole run
      // overran the round harness's budget (r14: SparkContext shut
      // down mid-suite). Shuffle partitions stay at 4 — outputs that
      // depend on them are unchanged; only task slots doubled.
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
