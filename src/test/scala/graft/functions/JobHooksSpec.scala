package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class JobHooksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("listener aggregates job/stage/task metrics like the controller") {
    val hooks = JobHooks.attach(spark)
    try {
      val n = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      assert(n > 0)
      // the listener bus is async; poll until events drain
      val deadline = System.nanoTime() + 30e9.toLong
      while (hooks.snapshot("jobs-ended") < 1L && System.nanoTime() < deadline)
        Thread.sleep(50)
      val snap = hooks.snapshot
      assert(snap("jobs-ended") >= 1L)
      assert(snap("stages-completed") >= 2L, "scan + agg stages")
      assert(snap("tasks-ended") >= 2L)
      assert(snap("records-read") >= 6000L, "lineitem rows counted as input")
      assert(snap("shuffle-bytes-written") > 0L, "groupBy shuffled")
    } finally JobHooks.detach(spark, hooks)
  }
}
