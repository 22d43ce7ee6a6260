package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.TestSpark

class KeyedTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-keyed").toString + "/t"

  private def contents(dir: String): Map[Long, String] =
    KeyedTable.read(spark, dir).as[(Long, String)].collect().toMap

  test("upsert replaces existing keys and inserts new ones") {
    val dir = freshDir()
    KeyedTable.create(
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k")
    KeyedTable.upsert(spark, dir,
      Seq((7L, "NEW7"), (101L, "NEW101")).toDF("k", "v"), "k")
    val got = contents(dir)
    assert(got.size === 101)
    assert(got(7L) === "NEW7")
    assert(got(101L) === "NEW101")
    assert(got(8L) === "v8")
  }

  test("re-applying the same batch is idempotent (retry semantics)") {
    val dir = freshDir()
    KeyedTable.create(
      (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k")
    val batch = Seq((3L, "B3"), (999L, "B999")).toDF("k", "v")
    KeyedTable.upsert(spark, dir, batch, "k")
    val once = contents(dir)
    KeyedTable.upsert(spark, dir, batch, "k")
    assert(contents(dir) === once)
  }

  test("untouched buckets' files are not rewritten") {
    val dir = freshDir()
    KeyedTable.create(
      (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k",
      numBuckets = 8)
    def fileState(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = fileState()
    KeyedTable.upsert(spark, dir, Seq((5L, "X")).toDF("k", "v"), "k",
      numBuckets = 8)
    val after = fileState()
    val touchedBucket = spark.range(1).select(
      pmod(xxhash64(lit(5L)), lit(8L)).cast("int")).as[Int].head()
    val untouchedBefore = before.filter(!_._1.contains(s"__bucket=$touchedBucket"))
    // every untouched file survives byte-identical (same path + mtime)
    untouchedBefore.foreach { case (p, m) =>
      assert(after.get(p).contains(m), s"untouched file rewritten: $p")
    }
    // and the touched bucket WAS rewritten (file set or mtimes changed)
    def bucketFiles(st: Map[String, Long]) =
      st.filter(_._1.contains(s"__bucket=$touchedBucket"))
    assert(bucketFiles(before) !== bucketFiles(after))
  }

  test("a second concurrent writer fails loudly instead of corrupting") {
    val dir = freshDir()
    KeyedTable.create(
      (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k")
    // simulate a writer mid-flight: its lock marker is present
    val lock = new org.apache.hadoop.fs.Path(dir, "_graft_write_lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(lock, false)
    out.write("pid=999 host=other t=0".getBytes("UTF-8")); out.close()
    val before = contents(dir)
    val e = intercept[IllegalStateException] {
      KeyedTable.upsert(spark, dir, Seq((1L, "CLOBBER")).toDF("k", "v"), "k")
    }
    assert(e.getMessage.contains("locked by another writer"))
    assert(e.getMessage.contains("pid=999"), "lock holder surfaces in the error")
    assert(contents(dir) === before, "failed writer must not touch the table")
    // after the stale lock is cleared, writes proceed (and the reader
    // never tripped on the marker file: '_'-prefixed files are hidden)
    KeyedTable.clearLock(spark, dir)
    KeyedTable.upsert(spark, dir, Seq((1L, "OK")).toDF("k", "v"), "k")
    assert(contents(dir)(1L) === "OK")
    assert(!fs.exists(lock), "lock released after a successful upsert")
  }

  test("the lock is released when the upsert body fails") {
    val dir = freshDir()
    KeyedTable.create(Seq((1L, "v1")).toDF("k", "v"), dir, "k")
    // mismatched schema makes the merge fail after the lock is taken
    intercept[Throwable] {
      KeyedTable.upsert(spark, dir,
        Seq((2L, "x", 1)).toDF("k", "v", "extra"), "k")
    }
    val lock = new org.apache.hadoop.fs.Path(dir, "_graft_write_lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(lock), "a failed writer must not leave the table locked")
    // and the table still accepts the next writer
    KeyedTable.upsert(spark, dir, Seq((2L, "v2")).toDF("k", "v"), "k")
    assert(contents(dir) === Map(1L -> "v1", 2L -> "v2"))
  }

  test("upsert reads only the touched buckets (partition pruning)") {
    val dir = freshDir()
    KeyedTable.create(
      (1L to 64L).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k",
      numBuckets = 8)
    // the survivors scan prunes on __bucket: verify via the plan of the
    // same filtered read the upsert issues
    val touched = Seq(5L).map(k =>
      spark.range(1).select(pmod(xxhash64(lit(k)), lit(8L)).cast("int"))
        .as[Int].head())
    val pruned = spark.read.parquet(dir)
      .filter(col("__bucket").isin(touched.map(Integer.valueOf): _*))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("__bucket"), s"no partition filter in:\n$scan")
  }
}
