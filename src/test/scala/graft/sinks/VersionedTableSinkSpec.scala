package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import graft.TestSpark

/** writeStream into the versioned store: one upsert commit per
  * micro-batch, exactly-once through epoch stamps in the table's own
  * commit metadata, checkpointed restart, and the full
  * readStream → table → readStream composition. */
class VersionedTableSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): String =
    Files.createTempDirectory(s"graft-vsink-$name").toString + "/t"

  private def stage(dir: String, slices: Seq[Seq[(Long, String, Long)]],
      startIdx: Int = 0): Unit =
    slices.zipWithIndex.foreach { case (rows, i0) =>
      val i = startIdx + i0
      val tmp = s"$dir/_tmp_$i"
      rows.toDF("k", "s", "v").coalesce(1).write.parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .find(_.getPath.getName.endsWith(".parquet")).get.getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(dir, f"b$i%03d.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      Thread.sleep(5L) // strictly increasing mtimes → batch order
    }

  private def drain(src: String, table: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream.format("graft.sinks.v2.VersionedTableSink")
      .option("path", table).option("keyCol", "k")
      .option("numBuckets", "2")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("writeStream upserts one commit per micro-batch, creates the " +
      "table on the first epoch, and a checkpointed restart applies " +
      "ONLY new batches — with epoch stamps in the commit lineage") {
    val src = fresh("src"); val table = fresh("tbl"); val ckpt = fresh("ck")
    stage(src, Seq(
      Seq((1L, "a", 10L), (2L, "b", 20L)),
      Seq((3L, "c", 30L), (1L, "a2", 11L)))) // batch 2 updates k1
    drain(src, table, ckpt)
    val got = VersionedKeyedTable.read(spark, table)
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "a2", 11L), (2L, "b", 20L), (3L, "c", 30L)))
    assert(VersionedKeyedTable.completeVersions(spark, table).size === 2,
      "one commit per micro-batch, exactly")
    // consumer down; a new file arrives; restart off the checkpoint
    stage(src, Seq(Seq((4L, "d", 40L))), startIdx = 2)
    drain(src, table, ckpt)
    assert(VersionedKeyedTable.read(spark, table).count() === 4L)
    assert(VersionedKeyedTable.completeVersions(spark, table).size === 3,
      "the restart applied exactly the one new batch")
    // the epoch stamp rides the table's own commits
    val hist = VersionedKeyedTable.history(spark, table)
      .agg(max(col("meta_keys"))).head().getString(0)
    assert(hist.contains("graft.sinkEpoch."),
      s"epoch stamps must ride commit metadata (got $hist)")
  }

  test("a replayed epoch is a no-op: commit(epoch) called twice with " +
      "the same messages applies once — the stamp walk catches the " +
      "crash-after-table-commit window") {
    val table = fresh("replay")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    VersionedKeyedTable.create(
      Seq((1L, 10L)).toDF("k", "v"), table, "k", numBuckets = 2)
    val write = new graft.sinks.v2.VersionedStreamingWrite(
      table, "k", 2, true, "q-test", schema)
    def staged(): Array[org.apache.spark.sql.connector.write.WriterCommitMessage] = {
      val p = s"$table/_staging/manual-${java.util.UUID.randomUUID()}.parquet"
      val w = new graft.sinks.v2.StagingParquetWriter(p, schema)
      w.write(org.apache.spark.sql.catalyst.InternalRow(2L, 20L))
      Array(w.commit())
    }
    write.commit(7L, staged())
    assert(VersionedKeyedTable.read(spark, table).count() === 2L)
    val v = VersionedKeyedTable.completeVersions(spark, table).size
    // the replay: a fresh set of staged files for the SAME epoch
    write.commit(7L, staged())
    assert(VersionedKeyedTable.completeVersions(spark, table).size === v,
      "the replayed epoch must not commit")
    assert(VersionedKeyedTable.read(spark, table).count() === 2L)
    // and no staged files survive either path
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = new org.apache.hadoop.fs.Path(s"$table/_staging")
    assert(!fs.exists(st) || fs.listStatus(st).isEmpty)
  }

  test("composition: readStream (CdfSource) of an upstream table, " +
      "through a transform, writeStream (VersionedTableSink) into a " +
      "downstream table — commit-log in, commit-log out") {
    val up = fresh("up"); val down = fresh("down"); val ckpt = fresh("cc")
    VersionedKeyedTable.create(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), up, "k", numBuckets = 2)
    VersionedKeyedTable.upsert(spark, up,
      Seq((3L, 30L), (1L, 11L)).toDF("k", "v"), "k")
    VersionedKeyedTable.upsert(spark, up,
      Seq((4L, 40L)).toDF("k", "v"), "k")
    val q = spark.readStream.format("graft.sinks.v2.CdfSource")
      .option("path", up).option("keyCol", "k")
      .option("startingVersion", "1")
      .load()
      .where(col("change_type") =!= "delete")
      .select(col("k"), (col("v") * 100).as("cents"))
      .writeStream.format("graft.sinks.v2.VersionedTableSink")
      .option("path", down).option("keyCol", "k")
      .option("numBuckets", "2")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = VersionedKeyedTable.read(spark, down)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1100L, 3L -> 3000L, 4L -> 4000L))
  }

  test("autoCompactFilesPerBucket bounds per-bucket data files under " +
      "MoR ingest: the threshold-crossing epoch triggers a surgical " +
      "compact commit and the answer is unchanged") {
    val src = fresh("acsrc"); val table = fresh("actbl")
    val ckpt = fresh("acck")
    // 5 single-file batches, disjoint keys hitting both buckets — MoR
    // appends one data file per touched bucket per epoch
    stage(src, (0 until 5).map(i =>
      Seq((i * 2L, s"a$i", i * 10L), (i * 2L + 1, s"b$i", i * 10L + 1))))
    val schema = spark.read.parquet(src).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream.format("graft.sinks.v2.VersionedTableSink")
      .option("path", table).option("keyCol", "k")
      .option("numBuckets", "2").option("writeMode", "mor")
      .option("autoCompactFilesPerBucket", "2")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val snap = VersionedKeyedTable.snapshot(spark, table)
    assert(snap.files.valuesIterator.forall(_.size <= 2),
      s"no bucket may exceed the threshold: " +
        s"${snap.files.view.mapValues(_.size).toMap}")
    // 5 epochs = 5 data commits; extra versions are the compactions
    assert(VersionedKeyedTable.completeVersions(spark, table).size > 5,
      "the threshold crossings must have produced compact commits")
    assert(VersionedKeyedTable.read(spark, table).count() === 10L)
    // the bad option value fails loudly at stream build
    intercept[Exception] {
      spark.readStream.schema(schema).parquet(src)
        .writeStream.format("graft.sinks.v2.VersionedTableSink")
        .option("path", table).option("keyCol", "k")
        .option("autoCompactFilesPerBucket", "-1")
        .option("checkpointLocation", fresh("acbad"))
        .trigger(Trigger.AvailableNow()).start()
    }
  }

  test("a REPLAYED epoch still runs auto-compaction — the crash " +
      "window between the epoch's data commit and its compact") {
    val table = fresh("acreplay")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    VersionedKeyedTable.create(
      (1L to 8L).map(i => (i, i)).toDF("k", "v"), table, "k", 2)
    def staged(): Array[org.apache.spark.sql.connector.write.WriterCommitMessage] = {
      val p = s"$table/_staging/ac-${java.util.UUID.randomUUID()}.parquet"
      val w = new graft.sinks.v2.StagingParquetWriter(p, schema)
      (9L to 16L).foreach(i =>
        w.write(org.apache.spark.sql.catalyst.InternalRow(i, i * 10L)))
      Array(w.commit())
    }
    // "crash before compact": the data commit lands with compaction
    // OFF (the stranded state a crash between commit and compact
    // leaves), buckets now exceed the threshold
    new graft.sinks.v2.VersionedStreamingWrite(
      table, "k", 2, true, "q-ac", schema, morMode = true)
      .commit(5L, staged())
    val snapBefore = VersionedKeyedTable.snapshot(spark, table)
    assert(snapBefore.files.valuesIterator.exists(_.size > 1))
    // restart replays the SAME epoch with compaction ON: the upsert
    // must skip (epoch stamp) but the compact must run
    new graft.sinks.v2.VersionedStreamingWrite(
      table, "k", 2, true, "q-ac", schema, morMode = true,
      autoCompact = 1).commit(5L, staged())
    val snapAfter = VersionedKeyedTable.snapshot(spark, table)
    assert(snapAfter.files.valuesIterator.forall(_.size <= 1),
      "the replay must fold the stranded fragmentation")
    assert(VersionedKeyedTable.read(spark, table).count() === 16L,
      "the replayed epoch's data must not double-apply")
  }
}
