package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Layout operators: Z-order keys, the distributed global row-number,
  * and the count-min-sketch heavy-hitter bound that LayoutSpec pins
  * against the exact `heavy_hitters` answer. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sfDir

  test("zkey column matches the driver-side reference bit-twiddle") {
    import spark.implicits._
    val xs = for (x <- 0L until 64L; y <- 0L until 64L if (x + y) % 7 == 0)
      yield (x, y)
    val got = xs.toDF("x", "y")
      .withColumn("z", Layout.zkey(col("x"), col("y"), 8))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    xs.foreach { case (x, y) =>
      assert(got((x, y)) === Layout.zkeyRef(x, y, 8), s"($x,$y)")
    }
  }

  test("zkey is a bijection on the bit grid and interleaves locality") {
    val n = 32
    val all = for (x <- 0L until n; y <- 0L until n)
      yield Layout.zkeyRef(x, y, 5)
    assert(all.distinct.size === (n * n).toInt, "must be a bijection")
    // quadrant property: the two high bits of z are the quadrant of
    // (x, y) — points in the same quadrant are contiguous in z-space,
    // which is exactly what gives min/max pruning on both dims
    for (x <- 0L until n; y <- 0L until n) {
      val z = Layout.zkeyRef(x, y, 5)
      assert((z >> 8) === ((y >> 4) << 1 | (x >> 4)),
        s"high z bits must encode the quadrant of ($x,$y)")
    }
  }

  test("globalRowNumber is the exact global rank, computed distributed") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, (i * 2654435761L) % 1000003L))
      .toDF("id", "key")
    val got = Layout.globalRowNumber(df, col("key"), col("id"), partitions = 7)
      .select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(got === want)
  }

  test("count-min sketch estimates bound the exact heavy hitters") {
    val ev = graft.core.Tables.events(spark, d)
    val eps = 0.005
    val conf = 0.99
    val sketch = ev.stat.countMinSketch(col("user_id"), eps, conf, seed = 42)
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = ev.count()
    exact.foreach { case (uid, cnt) =>
      val est = sketch.estimateCount(uid)
      assert(est >= cnt, "CMS never underestimates")
      assert(est <= cnt + (eps * total).toLong + 1,
        s"user $uid: est $est too far above exact $cnt")
    }
  }
}
