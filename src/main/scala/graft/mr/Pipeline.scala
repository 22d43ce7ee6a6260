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

  /** Job result + counters — the MapReduceResult analogue
    * (java/.../MapReduceResult.java). */
  case class MapReduceResult[O](output: Dataset[O], counters: Map[String, Long])

  /** Run a spec and capture its counters. Counters are aggregated by
    * Spark at task completion (exactly-once per successful task; retries
    * may over-count — SURVEY.md §7.4). */
  def runWithResult[I, K: org.apache.spark.sql.Encoder,
      V: org.apache.spark.sql.Encoder, O: org.apache.spark.sql.Encoder](
      spec: MapReduceSpecification[I, K, V, O])(
      implicit kvEnc: org.apache.spark.sql.Encoder[(K, V)]): MapReduceResult[O] = {
    val counters = new Counters(spec.input.sparkSession)
    val out = MapReduceJob.run(spec, Some(counters))
    // force execution so counters are final when the caller reads them
    val materialized = out.localCheckpoint(true)
    MapReduceResult(materialized, counters.snapshot)
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
