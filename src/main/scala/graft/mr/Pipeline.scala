package graft.mr

import org.apache.spark.sql.Dataset

/** Multi-stage job chaining — the MapreducePipeline / ChainedMapReduceJob
  * analogue (reference: python/src/mapreduce/mapreduce_pipeline.py:194-243,
  * example/.../entitycount/ChainedMapReduceJob.java).
  *
  * The reference chains jobs through a datastore-backed Pipeline DAG with
  * GCS files between stages; here a stage is a Dataset→Dataset function
  * and chaining is composition — Catalyst fuses the whole chain into one
  * plan, so "stage boundaries" cost nothing unless explicitly
  * materialized (`MaterializeStage`, the analogue of the reference's
  * between-stage GCS files, useful to cut lineage or share a stage).
  */
object Pipeline {

  /** Job result + counters + execution progress — the MapReduceResult
    * analogue (java/.../MapReduceResult.java) extended with the
    * status-UI numbers (reference status.py:304): stages and records
    * attributable to this run. */
  case class MapReduceResult[O](output: Dataset[O],
      counters: Map[String, Long],
      progress: graft.functions.JobHooks.Progress)

  /** Run a spec and capture its counters plus a progress snapshot.
    * Counters are aggregated by Spark at task completion (exactly-once
    * per successful task; retries may over-count — SURVEY.md §7.4).
    * Progress comes from a run-scoped SparkListener — the push-based
    * form of the reference's polled controller state; the listener bus
    * is drained before the snapshot so the numbers are final. */
  def runWithResult[I, K: org.apache.spark.sql.Encoder,
      V: org.apache.spark.sql.Encoder, O: org.apache.spark.sql.Encoder](
      spec: MapReduceSpecification[I, K, V, O])(
      implicit kvEnc: org.apache.spark.sql.Encoder[(K, V)]): MapReduceResult[O] = {
    val spark = spec.input.sparkSession
    val counters = new Counters(spark)
    val hooks = graft.functions.JobHooks.attach(spark)
    try {
      val out = MapReduceJob.run(spec, Some(counters))
      // force execution so counters are final when the caller reads them
      val materialized = out.localCheckpoint(true)
      // listener delivery is async — poll until the snapshot stabilizes
      // with no stage left in flight (bounded wait)
      var last = hooks.progress
      var spins = 0
      while (spins < 100 && {
        Thread.sleep(50)
        val now = hooks.progress
        val settled = now == last && now.stagesRunning == 0
        last = now
        !settled
      }) spins += 1
      MapReduceResult(materialized, counters.snapshot, last)
    } finally graft.functions.JobHooks.detach(spark, hooks)
  }

  /** Compose stages left-to-right: one fused Catalyst plan. */
  def chain[A, B, C](s1: Dataset[A] => Dataset[B],
      s2: Dataset[B] => Dataset[C]): Dataset[A] => Dataset[C] =
    s1.andThen(s2)

  /** Materialize a stage boundary (the between-stage GCS file analogue):
    * truncates lineage and lets multiple downstream stages share the
    * computed result without recomputation. */
  def materializeStage[T](ds: Dataset[T]): Dataset[T] =
    ds.localCheckpoint(true)
}
