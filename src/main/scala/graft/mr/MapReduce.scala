package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.LongAccumulator
import scala.collection.mutable

/** The user-facing MapReduce programming surface, re-expressed Spark-first.
  *
  * Semantics mirror the reference's contracts:
  *  - Mapper: `Mapper<I,K,V>.map(I)` + `emit(k,v)` with
  *    `beginShard/beginSlice/endSlice/endShard` lifecycle
  *    (reference: java/.../Mapper.java:19-29, Worker.java:52-108).
  *  - Reducer: called once per key with a *streamed* iterator of values,
  *    emits 0..n outputs (reference: java/.../Reducer.java:20-38,
  *    impl/MergingReader.java:37-254 — values arrive lazily).
  *  - Combiner: partial aggregation; reference runs it reduce-side
  *    incrementally (python/src/mapreduce/input_readers.py:2633-2654),
  *    Spark runs true map-side partial agg via a typed Aggregator —
  *    strictly better, same contract (combiner output type == value type).
  *  - Shuffle: group by key; values in arrival order, NOT sorted
  *    (reference: impl/Shuffling.java:104-113). We do not promise value
  *    order either; `ReduceSpec.sortedValues` opts into secondary sort.
  *
  * Execution is entirely Spark: mapPartitions (one partition == one shard,
  * lifecycle hooks at partition open/close), groupByKey for the shuffle
  * (Tungsten sort-based shuffle replaces the reference's
  * hash→sort→tiered-merge GCS pipeline, SURVEY.md §2.3), flatMapGroups for
  * the streamed reduce. Nothing here re-implements sort/merge/retry — at
  * 100 TB those come from Spark's shuffle service and AQE.
  */
trait Mapper[I, K, V] extends Serializable {
  def beginShard(): Unit = {}
  def endShard(): Unit = {}
  /** Slice hooks (reference beginSlice/endSlice, Worker.java:70-97): the
    * reference checkpoints every ~15s/180s of work; Spark needs no
    * checkpoint, so a "slice" here is a fixed record batch
    * (MapReduceSpecification.sliceSize) — the hook point for periodic
    * flushing the reference used slices for. */
  def beginSlice(): Unit = {}
  def endSlice(): Unit = {}
  def map(input: I, emit: (K, V) => Unit): Unit
}

/** Map-only worker (no shuffle), reference MapOnlyMapper.java:15. */
trait MapOnlyMapper[I, O] extends Serializable {
  def beginShard(): Unit = {}
  def endShard(): Unit = {}
  def map(input: I, emit: O => Unit): Unit
}

trait Reducer[K, V, O] extends Serializable {
  def beginShard(): Unit = {}
  def endShard(): Unit = {}
  def reduce(key: K, values: Iterator[V], emit: O => Unit): Unit
}

/** Associative/commutative partial aggregation (the combiner contract,
  * reformulated as (zero, reduce, merge) per SURVEY.md §7.4). */
trait Combiner[V, C] extends Serializable {
  def zero: C
  def reduce(acc: C, value: V): C
  def merge(a: C, b: C): C
}

/** Identity mapper (reference mappers/IdentityMapper.java). */
class IdentityMapper[K, V] extends Mapper[(K, V), K, V] {
  def map(in: (K, V), emit: (K, V) => Unit): Unit = emit(in._1, in._2)
}

/** Emit the key once per group == DISTINCT
  * (reference reducers/KeyProjectionReducer.java). */
class KeyProjectionReducer[K, V] extends Reducer[K, V, K] {
  def reduce(key: K, values: Iterator[V], emit: K => Unit): Unit = emit(key)
}

/** Emit all values, drop key (reference reducers/ValueProjectionReducer.java). */
class ValueProjectionReducer[K, V] extends Reducer[K, V, V] {
  def reduce(key: K, values: Iterator[V], emit: V => Unit): Unit =
    values.foreach(emit)
}

/** Passthrough values per key (reference reducers/IdentityReducer.java). */
class IdentityReducer[K, V] extends Reducer[K, V, (K, V)] {
  def reduce(key: K, values: Iterator[V], emit: ((K, V)) => Unit): Unit =
    values.foreach(v => emit((key, v)))
}

/** Named monotonic job counters (reference CountersMap,
  * python/src/mapreduce/model.py:228-334; CounterNames.java:19-74).
  * Backed by LongAccumulators. Semantics (demonstrated by
  * graft.RetryCheck): exactly-once under task FAILURE+retry — updates
  * from failed attempts are discarded, matching the reference's
  * per-shard aggregation — but at-least-once under lineage RECOMPUTE
  * (a second action over an uncached transformation counts again).
  * Read counters after one action, or cache the dataset.
  */
class Counters(spark: SparkSession) extends Serializable {
  private val accs = mutable.Map.empty[String, LongAccumulator]
  def counter(name: String): LongAccumulator = synchronized {
    accs.getOrElseUpdate(name, spark.sparkContext.longAccumulator(name))
  }
  def value(name: String): Long = synchronized {
    accs.get(name).map(_.value.longValue).getOrElse(0L)
  }
  def snapshot: Map[String, Long] = synchronized {
    accs.map { case (k, v) => k -> v.value.longValue }.toMap
  }
}
object CounterNames {
  // Reference: java/.../CounterNames.java:19-49
  val MapperCalls = "mapper-calls"
  val ReducerCalls = "reducer-calls"
  val CombinerCalls = "combiner-calls"
  val MapperWalltimeMs = "mapper-walltime-ms"
  val ReducerWalltimeMs = "reducer-walltime-ms"
}

/** A MapReduce job specification — the `MapreduceSpec` / `MapReduceSpecification`
  * analogue (reference: python/src/mapreduce/model.py:445-553,
  * java/.../MapReduceSpecification.java). Thin and declarative: `run`
  * compiles it to a Dataset program and lets Catalyst plan the physical
  * execution (SURVEY.md §3.4).
  *
  * @param reduceShards analogue of reduce shard count / HashingSharder
  *   fan-out (MapReduceJob.java:138-143). <=0 means "let Spark/AQE pick"
  *   — the right default at scale.
  */
case class MapReduceSpecification[I, K, V, O](
    jobName: String,
    input: Dataset[I],
    mapper: Mapper[I, K, V],
    reducer: Reducer[K, V, O],
    combiner: Option[Combiner[V, V]] = None,
    reduceShards: Int = -1,
    /** Secondary sort of values within each group. The reference never
      * guarantees value order (impl/Shuffling.java:104-113); this is the
      * explicit opt-in helper promised in SURVEY.md §7.4. */
    valueOrdering: Option[Ordering[V]] = None,
    /** Records per slice for beginSlice/endSlice hooks; <=0 disables
      * (one implicit slice per shard). */
    sliceSize: Int = -1)

object MapReduceJob {

  /** Run a full map→shuffle→reduce job. One Spark job, one shuffle:
    * the reference's map / hash / sort / merge-tier / reduce stages
    * (MapReduceJob.java:469-497) collapse into
    * exchange + sort + flatMapGroups, all Tungsten-managed.
    */
  def run[I, K: Encoder, V: Encoder, O: Encoder](
      spec: MapReduceSpecification[I, K, V, O],
      counters: Option[Counters] = None)(
      implicit kvEnc: Encoder[(K, V)]): Dataset[O] = {

    val mapperCalls = counters.map(_.counter(CounterNames.MapperCalls))
    val reducerCalls = counters.map(_.counter(CounterNames.ReducerCalls))
    val m = spec.mapper
    val sliceSize = spec.sliceSize
    val mapped: Dataset[(K, V)] = spec.input.mapPartitions { iter =>
      m.beginShard()
      m.beginSlice()
      var inSlice = 0L
      val out = mutable.ArrayBuffer.empty[(K, V)]
      // Stream: emit buffered per input record, not per partition.
      val it = iter.flatMap { rec =>
        out.clear()
        if (sliceSize > 0 && inSlice >= sliceSize) {
          m.endSlice(); m.beginSlice(); inSlice = 0L
        }
        inSlice += 1L
        mapperCalls.foreach(_.add(1L))
        m.map(rec, (k, v) => out += ((k, v)))
        out.toList
      }
      new Iterator[(K, V)] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) { m.endSlice(); m.endShard() }
          h
        }
        def next(): (K, V) = it.next()
      }
    }

    val repartitioned =
      if (spec.reduceShards > 0)
        mapped.repartition(spec.reduceShards, mapped("_1"))
      else mapped

    val grouped = repartitioned.groupByKey(_._1)
    val r = spec.reducer
    spec.combiner match {
      case Some(c) =>
        // Map-side partial agg: Spark splits this Aggregator into
        // partial(reduce) + final(merge) around the exchange — the
        // reference's combiner (input_readers.py:2633-2654) without the
        // extra GCS round-trip.
        val agg = new Aggregator[(K, V), V, V] {
          def zero: V = c.zero
          def reduce(b: V, a: (K, V)): V = c.reduce(b, a._2)
          def merge(a: V, b: V): V = c.merge(a, b)
          def finish(b: V): V = b
          def bufferEncoder: Encoder[V] = implicitly[Encoder[V]]
          def outputEncoder: Encoder[V] = implicitly[Encoder[V]]
        }
        grouped.agg(agg.toColumn).flatMap { case (k, combined) =>
          reducerCalls.foreach(_.add(1L))
          val out = mutable.ArrayBuffer.empty[O]
          r.reduce(k, Iterator.single(combined), out += _)
          out.toList
        }
      case None =>
        grouped.flatMapGroups { (k, values) =>
          reducerCalls.foreach(_.add(1L))
          val out = mutable.ArrayBuffer.empty[O]
          val vs0 = values.map(_._2)
          val vs = spec.valueOrdering match {
            case Some(ord) => vs0.toVector.sorted(ord).iterator
            case None      => vs0
          }
          r.reduce(k, vs, out += _)
          out.toList
        }
    }
  }

  /** Map-only job (reference MapSpecification.java:18-68 / `start_map`,
    * SURVEY.md §3.1): no shuffle at all. */
  def runMapOnly[I, O: Encoder](
      jobName: String,
      input: Dataset[I],
      mapper: MapOnlyMapper[I, O],
      counters: Option[Counters] = None): Dataset[O] = {
    val mapperCalls = counters.map(_.counter(CounterNames.MapperCalls))
    input.mapPartitions { iter =>
      mapper.beginShard()
      val out = mutable.ArrayBuffer.empty[O]
      val it = iter.flatMap { rec =>
        out.clear()
        mapperCalls.foreach(_.add(1L))
        mapper.map(rec, out += _)
        out.toList
      }
      new Iterator[O] {
        def hasNext: Boolean =
          { val h = it.hasNext; if (!h) mapper.endShard(); h }
        def next(): O = it.next()
      }
    }
  }
}
