package graft
import org.apache.spark.sql.SparkSession
import java.util.Locale

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * A warmup pass absorbs JVM/codegen/classloading cost so per-query
  * numbers reflect steady-state execution.
  *
  * The round driver records only the LAST 2000 bytes of stdout, so the
  * printed line must fit in that window to be machine-parseable
  * (BENCH_r01/r02 both recorded `parsed: null` because the full
  * 117-query map overflows it). Strategy: the complete per-query map is
  * written to BENCH_FULL.json; the stdout line carries the total plus as
  * many of the slowest queries as fit the budget, with an `omitted`
  * count for the rest.
  */
object Bench {
  private val LineBudget = 1900 // bytes; driver tail keeps last 2000

  private def fmt(v: Double): String = "%.3f".formatLocal(Locale.US, v)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // fewer, larger post-shuffle partitions: tiny-task scheduling is
      // pure overhead at bench data sizes (measured ~5% of total) and
      // the dominant inflation when the host is concurrently loaded
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: exercise scan + shuffle + agg + join codegen paths once.
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()
    li.groupBy("l_returnflag").count().count()
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    li.join(o, li("l_orderkey") === o("o_orderkey")).count()

    // Queries persist intermediates (shingle relations, hot sets) and
    // a bench JVM runs 150+ of them: without clearing, the storage
    // pool accumulates every query's leftovers and later queries pay
    // GC/eviction churn that has nothing to do with their own plan
    // (measured: topk_per_group 0.9 s alone vs 7 s late in a full
    // run). Clearing between queries prices each query standalone —
    // a query's own persists still serve it during execution.
    // clearCache() drops DataFrame persists, but NOT localCheckpoint
    // blocks (those free only when the RDD is GC'd) — unpersist every
    // persistent RDD explicitly so the storage pool returns to zero
    // instead of ratcheting up across 170+ queries.
    def resetStorage(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // Each query runs twice back-to-back and records the MIN — declared
    // in the output line ("runs":2,"agg":"min"). This host is a shared
    // VM with ±20% run-to-run noise on identical code (measured 87.5 s
    // vs 106.9 s consecutive clean totals); the min is the query's
    // intrinsic cost, reproducible across environments, and matches a
    // warm standalone re-run of the same query. Storage is reset
    // between runs, so the second run re-pays its own persists/
    // checkpoints — only codegen/JIT warmth carries over.
    // Optional args: query names to time (local iteration only — the
    // driver's no-arg run times everything and writes BENCH_FULL.json).
    val only = args.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .map { case (name, fn) =>
      val dt = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // failures MUST be loud: a swallowed exception records as an
        // impossibly fast "min" and silently poisons the bench totals
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          -1L
        }
        val t = (System.nanoTime() - t0) / 1e9
        resetStorage()
        t
      }.min
      name -> dt
    }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    spark.stop()

    // Full-precision record for the repo (survives the tail window).
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"runs":2,"agg":"min","queries":$fullQs,"sf":"$sfDir"}"""
    if (only.isEmpty)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        (fullLine + "\n").getBytes("UTF-8"))

    // Compact stdout line: keep the slowest queries, drop the fastest
    // until the serialized line fits the driver's tail window.
    def line(kept: Seq[(String, Double)]): String = {
      val qs = kept.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"runs":2,"agg":"min","omitted":${results.size - kept.size},"full":"BENCH_FULL.json","queries":$qs,"sf":"$sfDir"}"""
    }
    var kept = results.sortBy(-_._2)
    while (kept.nonEmpty && line(kept).length > LineBudget) kept = kept.dropRight(1)
    // Print AFTER spark.stop() so no shutdown logging lands after it.
    println(line(kept))
  }
}
