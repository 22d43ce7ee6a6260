package graft.sinks

import org.apache.spark.sql.Dataset

/** Batched side-effect pools — the Operation / DatastoreMutationPool
  * analogue (reference: python/src/mapreduce/context.py:216-341 — 9 MB /
  * 1000-entity flush thresholds; java/.../DatastoreMutationPool.java).
  *
  * The reference routes mapper-yielded `op(context)` objects into pools
  * flushed by count/size; in Spark the same contract is a
  * `foreachPartition` with batching — side effects run inside an action
  * (exactly-once per successful task, at-least-once under retry, same as
  * the reference's semantics).
  */
object SideEffects {

  /** Apply `flush` to batches of at most `maxCount` records (or
    * `maxBytes` of estimated payload) per call, final partial batch
    * included. One flush stream per partition. */
  def foreachBatched[T](ds: Dataset[T], maxCount: Int,
      maxBytes: Long = Long.MaxValue, sizeOf: T => Long = (_: T) => 0L)(
      flush: Seq[T] => Unit): Unit = {
    require(maxCount > 0)
    ds.foreachPartition { (it: Iterator[T]) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[T]
      var bytes = 0L
      for (r <- it) {
        buf += r
        bytes += sizeOf(r)
        if (buf.size >= maxCount || bytes >= maxBytes) {
          flush(buf.toSeq); buf.clear(); bytes = 0L
        }
      }
      if (buf.nonEmpty) flush(buf.toSeq)
    }
  }
}
