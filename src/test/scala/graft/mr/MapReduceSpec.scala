package graft.mr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.util.AccumulatorV2
import graft.TestSpark

class MapReduceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wordcountSpec(combiner: Option[Combiner[Long, Long]]) = {
    val input = spark.createDataset(Seq(
      "a b a", "b c", "a", "", "c c c")).repartition(3)
    MapReduceSpecification[String, String, Long, (String, Long)](
      jobName = "wc",
      input = input,
      mapper = new Mapper[String, String, Long] {
        def map(line: String, emit: (String, Long) => Unit): Unit =
          line.split(' ').filter(_.nonEmpty).foreach(w => emit(w, 1L))
      },
      reducer = new Reducer[String, Long, (String, Long)] {
        def reduce(k: String, vs: Iterator[Long],
            emit: ((String, Long)) => Unit): Unit = emit((k, vs.sum))
      },
      combiner = combiner)
  }

  private object Sum extends Combiner[Long, Long] {
    def zero = 0L
    def reduce(a: Long, v: Long) = a + v
    def merge(a: Long, b: Long) = a + b
  }

  test("wordcount without combiner") {
    val out = MapReduceJob.run(wordcountSpec(None)).collect().toMap
    assert(out === Map("a" -> 3L, "b" -> 2L, "c" -> 4L))
  }

  test("wordcount with combiner produces identical result") {
    val out = MapReduceJob.run(wordcountSpec(Some(Sum))).collect().toMap
    assert(out === Map("a" -> 3L, "b" -> 2L, "c" -> 4L))
  }

  test("counters count mapper and reducer calls") {
    val counters = new Counters(spark)
    MapReduceJob.run(wordcountSpec(None), Some(counters)).collect()
    assert(counters.value(CounterNames.MapperCalls) === 5L)
    assert(counters.value(CounterNames.ReducerCalls) === 3L)
    assert(counters.snapshot.keySet ===
      Set(CounterNames.MapperCalls, CounterNames.ReducerCalls))
  }

  test("runWithResult returns output, counters, and a settled progress snapshot") {
    val res = Pipeline.runWithResult(wordcountSpec(None))
    assert(res.output.collect().toMap === Map("a" -> 3L, "b" -> 2L, "c" -> 4L))
    assert(res.counters(CounterNames.MapperCalls) === 5L)
    assert(res.counters(CounterNames.ReducerCalls) === 3L)
    // progress reflects a finished run: stages all completed, tasks ran
    assert(res.progress.stagesRunning === 0L)
    assert(res.progress.stagesCompleted > 0L)
    assert(res.progress.tasksEnded > 0L)
  }

  test("reduce values arrive as a streamed iterator, reducer can emit 0..n") {
    val input = spark.createDataset(Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val spec = MapReduceSpecification[Long, Long, Long, Long](
      jobName = "evens",
      input = input,
      mapper = new Mapper[Long, Long, Long] {
        def map(x: Long, emit: (Long, Long) => Unit): Unit = emit(x % 2, x)
      },
      reducer = new Reducer[Long, Long, Long] {
        def reduce(k: Long, vs: Iterator[Long], emit: Long => Unit): Unit =
          if (k == 0) vs.foreach(emit) // only the even group, all values
      })
    assert(MapReduceJob.run(spec).collect().sorted === Array(2L, 4L, 6L))
  }

  test("valueOrdering gives deterministic secondary sort") {
    val input = spark.createDataset(
      Seq(("k", 3L), ("k", 1L), ("k", 2L))).repartition(3)
    val spec = MapReduceSpecification[(String, Long), String, Long, String](
      jobName = "sorted",
      input = input,
      mapper = new IdentityMapper[String, Long],
      reducer = new Reducer[String, Long, String] {
        def reduce(k: String, vs: Iterator[Long], emit: String => Unit): Unit =
          emit(vs.mkString(","))
      },
      valueOrdering = Some(Ordering.Long))
    assert(MapReduceJob.run(spec).collect() === Array("1,2,3"))
  }

  test("KeyProjectionReducer implements DISTINCT") {
    val input = spark.createDataset(Seq(("x", 1L), ("x", 2L), ("y", 9L)))
    val spec = MapReduceSpecification[(String, Long), String, Long, String](
      "distinct", input, new IdentityMapper[String, Long],
      new KeyProjectionReducer[String, Long])
    assert(MapReduceJob.run(spec).collect().sorted === Array("x", "y"))
  }

  test("IdentityReducer passes through grouped pairs") {
    val input = spark.createDataset(Seq(("x", 1L), ("y", 2L)))
    val spec = MapReduceSpecification[(String, Long), String, Long, (String, Long)](
      "id", input, new IdentityMapper[String, Long],
      new IdentityReducer[String, Long])
    assert(MapReduceJob.run(spec).collect().sortBy(_._1) ===
      Array(("x", 1L), ("y", 2L)))
  }

  test("map-only job runs without shuffle and honors lifecycle") {
    val acc = spark.sparkContext.longAccumulator("shards")
    val input = spark.createDataset(1L to 10L).repartition(2)
    val out = MapReduceJob.runMapOnly[Long, Long]("double", input,
      new MapOnlyMapper[Long, Long] {
        override def beginShard(): Unit = acc.add(1L)
        def map(x: Long, emit: Long => Unit): Unit = emit(x * 2)
      })
    assert(out.collect().sorted === (1L to 10L).map(_ * 2).toArray)
    assert(acc.value === 2L) // one beginShard per partition
  }

  test("slice lifecycle hooks fire every sliceSize records") {
    val slices = spark.sparkContext.longAccumulator("slices")
    val input = spark.createDataset(1L to 25L).repartition(1)
    val spec = MapReduceSpecification[Long, Long, Long, (Long, Long)](
      "sliced", input,
      new Mapper[Long, Long, Long] {
        override def beginSlice(): Unit = slices.add(1L)
        def map(x: Long, emit: (Long, Long) => Unit): Unit = emit(0L, x)
      },
      new Reducer[Long, Long, (Long, Long)] {
        def reduce(k: Long, vs: Iterator[Long],
            emit: ((Long, Long)) => Unit): Unit = emit((k, vs.sum))
      },
      sliceSize = 10)
    assert(MapReduceJob.run(spec).collect() === Array((0L, 325L)))
    assert(slices.value === 3L) // 10 + 10 + 5
  }

  test("reduceShards controls shuffle partitioning") {
    val input = spark.createDataset(1L to 100L)
    val spec = MapReduceSpecification[Long, Long, Long, (Long, Long)](
      "sharded", input,
      new Mapper[Long, Long, Long] {
        def map(x: Long, emit: (Long, Long) => Unit): Unit = emit(x % 10, 1L)
      },
      new Reducer[Long, Long, (Long, Long)] {
        def reduce(k: Long, vs: Iterator[Long],
            emit: ((Long, Long)) => Unit): Unit = emit((k, vs.sum))
      },
      reduceShards = 5)
    val out = MapReduceJob.run(spec)
    assert(out.collect().toMap.values.toSet === Set(10L))
  }
}
