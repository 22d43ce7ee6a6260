package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: runs the named queries (args) against
  * SPARK_GRAFT_SF_DIR twice each — cold then warm — in one JVM, so
  * cache-population cost vs steady-state cost is visible per query.
  * Dev tool only; the driver-facing surface is graft.Bench. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.split('=')).foreach {
        case Array(k, v) => builder.config(k, v)
        case _ =>
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.groupBy("l_returnflag").count().count() // warm codegen paths

    for (name <- args; round <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      printf("%-28s r%d  %6.2fs  rows=%d%n", name, round,
        (System.nanoTime() - t0) / 1e9, n)
    }
    spark.stop()
  }
}
