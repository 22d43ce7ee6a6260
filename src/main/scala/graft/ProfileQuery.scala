package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev-only per-query profiler: runs the named queries against
  * SPARK_GRAFT_SF_DIR with a listener that records every Spark job's
  * wall time, task count and description, plus the driver-only gaps
  * between jobs — the evidence needed to tell scheduling/planning
  * overhead apart from real executor work in fixed-cost-dominated
  * lifecycle checks. Not part of the driver surface (Bench/Verify). */
object ProfileQuery {
  private case class JobRec(id: Int, desc: String, startMs: Long,
    var endMs: Long = 0L, var tasks: Int = 0, var stages: Int = 0)

  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.log.level", "ERROR")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.split('=')).foreach {
        case Array(k, v) => builder.config(k, v)
        case _ =>
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.endMs = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          // attribute the stage to the most recent unfinished job
          jobs.values.toSeq.reverse.find(_.endMs == 0L).foreach { j =>
            j.tasks += e.stageInfo.numTasks
            j.stages += 1
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm codegen paths once so the profile reflects steady state
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()

    for (name <- args; round <- 1 to 2) {
      jobs.synchronized(jobs.clear())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let the last JobEnd event drain before reading the map
      Thread.sleep(300)
      val snap = jobs.synchronized(jobs.values.toSeq)
      printf("%n=== %s r%d  wall=%.2fs rows=%d jobs=%d ===%n",
        name, round, wall, n, snap.size)
      if (round == 2) {
        var prevEnd = 0L
        var jobSum = 0.0
        var gapSum = 0.0
        snap.sortBy(_.startMs).foreach { j =>
          val dur = (j.endMs - j.startMs) / 1e3
          val gap = if (prevEnd == 0L) 0.0 else (j.startMs - prevEnd) / 1e3
          jobSum += dur
          if (gap > 0) gapSum += gap
          printf("  job %4d  %6.3fs  gap %6.3fs  stages=%d tasks=%3d  %s%n",
            j.id, dur, gap, j.stages, j.tasks, j.desc.take(80))
          prevEnd = math.max(prevEnd, j.endMs)
        }
        printf("  SUM jobs=%.2fs gaps(driver)=%.2fs wall=%.2fs%n",
          jobSum, gapSum, wall)
      }
    }
    spark.stop()
  }
}
