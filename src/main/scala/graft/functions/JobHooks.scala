package graft.functions

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Execution hooks + controller-style metric aggregation — the analogue
  * of the reference's hooks surface (python/src/mapreduce/hooks.py) and
  * the ControllerCallbackHandler counter roll-up
  * (handlers.py:1127-1211): the reference polls per-shard state every
  * ~2s and aggregates into job state; Spark pushes the same signals to a
  * SparkListener at task/stage/job completion — no polling.
  */
class JobHooks extends SparkListener {
  val stagesSubmitted = new LongAdder
  val stagesCompleted = new LongAdder
  val jobsEnded = new LongAdder
  val tasksEnded = new LongAdder
  val recordsRead = new LongAdder
  val recordsWritten = new LongAdder
  val shuffleBytesWritten = new LongAdder
  val bytesRead = new LongAdder

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
    stagesSubmitted.increment()
  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    stagesCompleted.increment()
    val m = e.stageInfo.taskMetrics
    if (m != null) {
      recordsRead.add(m.inputMetrics.recordsRead)
      bytesRead.add(m.inputMetrics.bytesRead)
      recordsWritten.add(m.outputMetrics.recordsWritten)
      shuffleBytesWritten.add(m.shuffleWriteMetrics.bytesWritten)
    }
  }
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    tasksEnded.increment()
  override def onJobEnd(e: SparkListenerJobEnd): Unit =
    jobsEnded.increment()

  def snapshot: Map[String, Long] = Map(
    "stages-submitted" -> stagesSubmitted.sum(),
    "stages-completed" -> stagesCompleted.sum(),
    "jobs-ended" -> jobsEnded.sum(),
    "tasks-ended" -> tasksEnded.sum(),
    "records-read" -> recordsRead.sum(),
    "records-written" -> recordsWritten.sum(),
    "bytes-read" -> bytesRead.sum(),
    "shuffle-bytes-written" -> shuffleBytesWritten.sum())

  /** Point-in-time progress view — the status.py-style snapshot
    * (reference python/src/mapreduce/status.py:304 renders per-job
    * shard/record progress from polled controller state; Spark pushes
    * the same signals, so this is just the listener's current sums).
    * `stagesRunning` > 0 means the job is mid-flight. */
  def progress: JobHooks.Progress = JobHooks.Progress(
    stagesSubmitted = stagesSubmitted.sum(),
    stagesCompleted = stagesCompleted.sum(),
    tasksEnded = tasksEnded.sum(),
    recordsRead = recordsRead.sum(),
    recordsWritten = recordsWritten.sum())
}

object JobHooks {
  /** Stage/record progress — MapReduceResult + status UI analogue
    * (reference java/.../MapReduceResult.java, status.py:304). */
  case class Progress(stagesSubmitted: Long, stagesCompleted: Long,
      tasksEnded: Long, recordsRead: Long, recordsWritten: Long) {
    def stagesRunning: Long = stagesSubmitted - stagesCompleted
  }

  /** Attach a fresh listener to the session's SparkContext. */
  def attach(spark: SparkSession): JobHooks = {
    val h = new JobHooks
    spark.sparkContext.addSparkListener(h)
    h
  }
  def detach(spark: SparkSession, h: JobHooks): Unit =
    spark.sparkContext.removeSparkListener(h)
}
