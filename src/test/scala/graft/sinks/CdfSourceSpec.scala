package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import graft.TestSpark

/** The CDF as a first-class Structured Streaming source: commit
  * versions are offsets, change files are partitions, and Spark's own
  * checkpoint gives exactly-once resumption over the table's log. */
class CdfSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): String =
    Files.createTempDirectory(s"graft-cdfsrc-$name").toString + "/t"

  // parquet sink (the memory sink cannot recover from a checkpoint,
  // and checkpointed recovery is exactly what the spec pins)
  private def drain(dir: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format("graft.sinks.v2.CdfSource")
      .option("path", dir).option("keyCol", "k")
      .option("startingVersion", "1")
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("readStream over a versioned table: commits become micro-" +
      "batches of typed change rows with _commit_version, and a " +
      "checkpointed restart consumes ONLY new commits") {
    val dir = fresh("t"); val ckpt = fresh("ckpt")
    VersionedKeyedTable.create(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "v"),
      dir, "k", numBuckets = 2)
    // v2: update + insert; v3: delete
    VersionedKeyedTable.upsert(spark, dir,
      Seq((1L, "a", 11L), (3L, "c", 30L)).toDF("k", "s", "v"), "k")
    VersionedKeyedTable.delete(spark, dir, Seq(2L).toDF("k"), "k")
    val out = fresh("out1")
    drain(dir, ckpt, out)
    val got = spark.read.parquet(out)
      .select(col("k"), col("change_type"), col("s"), col("v"),
        col("s_prev"), col("v_prev"), col("_commit_version"))
      .as[(Long, String, Option[String], Option[Long], Option[String],
        Option[Long], Long)]
      .collect().toSet
    assert(got === Set(
      (1L, "update", Some("a"), Some(11L), Some("a"), Some(10L), 2L),
      (3L, "insert", Some("c"), Some(30L), None, None, 2L),
      (2L, "delete", None, None, Some("b"), Some(20L), 3L)))
    // the consumer goes down; the base commits v4; restart off the
    // SAME checkpoint — only v4's rows arrive (offset log resumption)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((4L, "d", 40L)).toDF("k", "s", "v"), "k")
    drain(dir, ckpt, out)
    val afterResume = spark.read.parquet(out)
      .select(col("k"), col("_commit_version"))
      .as[(Long, Long)].collect()
    assert(afterResume.count(_._2 == 4L) === 1,
      "exactly v4's one insert arrives on resume")
    assert(afterResume.length === got.size + 1,
      "no earlier span replays through the checkpoint")
  }

  test("admission control: maxVersionsPerTrigger=1 drains a 3-commit " +
      "backlog as 3 bounded micro-batches, one commit each, complete") {
    val dir = fresh("ac"); val ckpt = fresh("acc")
    VersionedKeyedTable.create(
      Seq((1L, "a", 10L)).toDF("k", "s", "v"), dir, "k", numBuckets = 2)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((2L, "b", 20L)).toDF("k", "s", "v"), "k") // v2
    VersionedKeyedTable.upsert(spark, dir,
      Seq((3L, "c", 30L)).toDF("k", "s", "v"), "k") // v3
    VersionedKeyedTable.delete(spark, dir, Seq(1L).toDF("k"), "k") // v4
    val batches =
      scala.collection.mutable.ArrayBuffer[(Long, Set[Long], Long)]()
    val q = spark.readStream.format("graft.sinks.v2.CdfSource")
      .option("path", dir).option("keyCol", "k")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.select(col("_commit_version")).collect()
          .map(_.getLong(0))
        batches.synchronized {
          batches += ((id, rows.toSet, rows.length.toLong)): Unit
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val nonEmpty = batches.filter(_._3 > 0)
    assert(nonEmpty.length === 3,
      s"three commits => three bounded batches (got $batches)")
    assert(nonEmpty.forall(_._2.size == 1),
      "each batch holds exactly one commit's rows")
    assert(nonEmpty.map(_._2).reduce(_ ++ _) === Set(2L, 3L, 4L),
      "the batches cover the whole backlog in order")
  }

  test("a CDF-invisible maintenance commit contributes an empty " +
      "micro-batch, and a captureChanges=false commit in range fails " +
      "the stream loudly") {
    val dir = fresh("m"); val ckpt = fresh("mc")
    VersionedKeyedTable.create(
      (1L to 40L).map(i => (i, "x", i)).toDF("k", "s", "v"),
      dir, "k", numBuckets = 2)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((1L, "y", 111L)).toDF("k", "s", "v"), "k")
    VersionedKeyedTable.compact(spark, dir, "k") // empty capture set
    val out2 = fresh("out2")
    drain(dir, ckpt, out2)
    val rows = spark.read.parquet(out2).collect()
    assert(rows.length === 1, "compaction contributes no change rows")
    // an uncaptured commit poisons the span — loud, never silent
    VersionedKeyedTable.upsert(spark, dir,
      Seq((2L, "z", 222L)).toDF("k", "s", "v"), "k",
      captureChanges = false)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(dir, ckpt, out2)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("did not capture")))
  }
}
