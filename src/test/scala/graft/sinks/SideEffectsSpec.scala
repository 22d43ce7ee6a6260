package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SideEffectsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatched flushes by count with a final partial batch") {
    val flushes = spark.sparkContext.longAccumulator("flushes")
    val records = spark.sparkContext.longAccumulator("records")
    val maxSeen = spark.sparkContext.longAccumulator("max")
    val ds = spark.createDataset(1 to 95).repartition(1)
    SideEffects.foreachBatched(ds, maxCount = 10) { batch =>
      flushes.add(1L); records.add(batch.size.toLong)
      maxSeen.add(0L)
      assert(batch.size <= 10)
    }
    assert(records.value === 95L)
    assert(flushes.value === 10L) // 9 full + 1 partial
  }

  test("foreachBatched flushes by byte threshold") {
    val flushes = spark.sparkContext.longAccumulator("flushes2")
    val ds = spark.createDataset(Seq.fill(8)("x" * 100)).repartition(1)
    SideEffects.foreachBatched(ds, maxCount = 1000, maxBytes = 250L,
        sizeOf = (s: String) => s.length.toLong) { batch =>
      flushes.add(1L)
      assert(batch.map(_.length).sum <= 300)
    }
    assert(flushes.value >= 3L)
  }
}
