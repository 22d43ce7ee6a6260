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

  test("startingTimestamp resolves through the TIMESTAMP AS OF rule: " +
      "the stream delivers every change committed AFTER the state as " +
      "of that instant — and is mutually exclusive with " +
      "startingVersion") {
    val dir = fresh("ts-start"); val ckpt = fresh("ts-ck")
    VersionedKeyedTable.create(
      Seq((1L, 10L)).toDF("k", "v"), dir, "k", numBuckets = 1)
    Thread.sleep(1200L) // commit-instant resolution rides file mtimes
    val cut = System.currentTimeMillis()
    Thread.sleep(1200L)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((2L, 20L)).toDF("k", "v"), "k") // v2: after the cut
    VersionedKeyedTable.upsert(spark, dir,
      Seq((3L, 30L)).toDF("k", "v"), "k") // v3
    val out = fresh("ts-out")
    val q = spark.readStream.format("graft.sinks.v2.CdfSource")
      .option("path", dir).option("keyCol", "k")
      .option("startingTimestamp", cut.toString)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
      .select(col("k"), col("_commit_version"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 2L), (3L, 3L)),
      "only the post-cut commits' changes must stream")
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft.sinks.v2.CdfSource")
        .option("path", dir).option("keyCol", "k")
        .option("startingVersion", "1")
        .option("startingTimestamp", cut.toString)
        .load()
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("the engine's ReadLimit is honored with COMMITS as the unit: " +
      "maxRows(n) clamps to n commits along the lineage, composite " +
      "limits take the strictest bound, allAvailable is unbounded") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = fresh("rl")
    VersionedKeyedTable.create(
      Seq((1L, 10L)).toDF("k", "v"), dir, "k", numBuckets = 1) // v1
    (2L to 4L).foreach(i => VersionedKeyedTable.upsert(spark, dir,
      Seq((i, i * 10L)).toDF("k", "v"), "k")) // v2..v4
    val stream = new graft.sinks.v2.CdfMicroBatchStream(
      dir, "k", org.apache.spark.sql.types.StructType(Nil), Some(1L))
    def endAt(limit: ReadLimit): Long =
      stream.latestOffset(graft.sinks.v2.CdfOffset(1L), limit)
        .asInstanceOf[graft.sinks.v2.CdfOffset].version
    assert(endAt(ReadLimit.maxRows(2L)) === 3L,
      "maxRows(2) means two commits: (1, 3]")
    assert(endAt(ReadLimit.compositeLimit(Array(
      ReadLimit.allAvailable(), ReadLimit.maxRows(1L)))) === 2L,
      "a composite limit takes its strictest commit bound")
    assert(endAt(ReadLimit.allAvailable()) === 4L,
      "allAvailable drains to the latest commit")
  }

  test("timestamp data columns stream through the change reader under " +
      "BOTH parquet encodings Spark writes — INT96 (the default " +
      "outputTimestampType) and INT64 micros") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-02 03:04:05.123456")
    val t1 = java.sql.Timestamp.valueOf("2026-06-07 08:09:10.654321")
    def run(outputType: String): Set[(Long, String,
        Option[java.sql.Timestamp], Option[java.sql.Timestamp])] = {
      val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
      spark.conf.set("spark.sql.parquet.outputTimestampType", outputType)
      try {
        val dir = fresh(s"ts-$outputType"); val ckpt = fresh("tsc")
        VersionedKeyedTable.create(
          Seq((1L, t0)).toDF("k", "ts"), dir, "k", numBuckets = 1)
        // the upsert's CHANGE FILE carries ts and ts_prev — written by
        // Spark's parquet writer in the session's encoding, read back
        // by the Group reader (the very path that must decode INT96)
        VersionedKeyedTable.upsert(spark, dir,
          Seq((1L, t1), (2L, t0)).toDF("k", "ts"), "k")
        val out = fresh("tso")
        drain(dir, ckpt, out)
        spark.read.parquet(out)
          .select(col("k"), col("change_type"), col("ts"), col("ts_prev"))
          .as[(Long, String, Option[java.sql.Timestamp],
            Option[java.sql.Timestamp])]
          .collect().toSet
      } finally spark.conf.set(
        "spark.sql.parquet.outputTimestampType", prev)
    }
    val expected = Set(
      (1L, "update", Some(t1), Some(t0)),
      (2L, "insert", Some(t0), None))
    assert(run("INT96") === expected,
      "INT96-encoded change-file timestamps must decode to micros")
    assert(run("TIMESTAMP_MICROS") === expected,
      "INT64-micro change-file timestamps must decode identically")
  }

  test("BATCH change reads (the table_changes shape): the full span " +
      "in one DataFrame, endingVersion bounds it, _commit_version " +
      "predicates prune whole change files, and batch without a " +
      "starting rule refuses") {
    val dir = fresh("batch")
    VersionedKeyedTable.create(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir, "k", numBuckets = 2)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((1L, 11L), (3L, 30L)).toDF("k", "v"), "k") // v2
    VersionedKeyedTable.delete(spark, dir, Seq(2L).toDF("k"), "k") // v3
    def batch(extra: Map[String, String] = Map.empty) = {
      val r = spark.read.format("graft.sinks.v2.CdfSource")
        .option("path", dir).option("keyCol", "k")
      extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
    }
    // everything after create, one batch
    val all = batch(Map("startingVersion" -> "1"))
      .select(col("k"), col("change_type"), col("_commit_version"))
      .as[(Long, String, Long)].collect().toSet
    assert(all === Set((1L, "update", 2L), (3L, "insert", 2L),
      (2L, "delete", 3L)))
    // endingVersion bounds the feed
    assert(batch(Map("startingVersion" -> "1", "endingVersion" -> "2"))
      .select(col("_commit_version")).as[Long].collect().toSet === Set(2L))
    // a version predicate prunes commits (whole change files) BEFORE
    // rows are read — and the residual keeps rows exact; the pruning
    // evidence is read off THIS query's own scan instance
    val bq = batch(Map("startingVersion" -> "1"))
      .where(col("_commit_version") === 3L)
      .select(col("k"))
    assert(bq.collect().map(_.getLong(0)).toSeq === Seq(2L))
    val (planned, span) = graft.sinks.v2.GraftScanInspect.scans(bq)
      .collectFirst { case c: graft.sinks.v2.CdfBatchScan =>
        c.plannedCommitCounts }
      .getOrElse((-1, -1))
    assert(span === 2 && planned === 1,
      s"the = 3 predicate must plan only v3's change files ($planned/$span)")
    // batch needs an explicit starting rule (the table_changes contract)
    val e = intercept[Exception] {
      batch().collect()
    }
    assert(e.getMessage != null)
  }

  test("the catalog serves the feed as `t$changes`: SQL batch reads " +
      "with version pruning and VERSION AS OF bounding; the feed is " +
      "read-only") {
    val base = Files.createTempDirectory("graft-cdfsql").toString
    spark.conf.set("spark.sql.catalog.gcdf",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcdf.base", base)
    val dir = s"$base/t"
    VersionedKeyedTable.create(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir, "k", numBuckets = 2)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((1L, 11L), (3L, 30L)).toDF("k", "v"), "k") // v2
    VersionedKeyedTable.delete(spark, dir, Seq(2L).toDF("k"), "k") // v3
    val got = spark.sql(
        "SELECT k, change_type, _commit_version FROM gcdf.`t$changes`")
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "update", 2L), (3L, "insert", 2L),
      (2L, "delete", 3L)))
    // WHERE prunes; VERSION AS OF bounds at the named commit
    assert(spark.sql("SELECT k FROM gcdf.`t$changes` " +
        "WHERE _commit_version > 2").as[Long].collect().toSeq === Seq(2L))
    assert(spark.sql(
        "SELECT _commit_version FROM gcdf.`t$changes` VERSION AS OF 2")
      .as[Long].collect().toSet === Set(2L))
    // the feed refuses writes (no write face at all)
    intercept[Exception] {
      spark.sql("INSERT INTO gcdf.`t$changes` VALUES " +
        "(9, 'insert', 9, NULL, NULL, NULL, 9)")
    }
  }

  test("SCHEMA-EVOLUTION SEAM, pinned as a contract: a mid-stream " +
      "additive evolution keeps the stream flowing in its FIXED " +
      "start-time schema (the new column is invisible until restart, " +
      "the ALTER commit itself contributes no rows); a read started " +
      "AFTER the evolution sees the late column — null on " +
      "pre-evolution change files, valued on post-evolution ones") {
    val dir = fresh("evolve"); val ckpt = fresh("evckpt")
    VersionedKeyedTable.create(
      Seq((1L, 10L)).toDF("k", "v"), dir, "k", numBuckets = 2)
    // the stream's schema is fixed NOW, from the table's current shape
    val s1 = spark.readStream.format("graft.sinks.v2.CdfSource")
      .option("path", dir).option("keyCol", "k")
      .option("startingVersion", "1").load()
    assert(s1.columns.toSeq ===
      Seq("k", "change_type", "v", "v_prev", "_commit_version"))
    val mem = "cdf_evolve_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    val q = s1.writeStream.format("memory").queryName(mem)
      .option("checkpointLocation", ckpt).start()
    try {
      VersionedKeyedTable.upsert(spark, dir,
        Seq((2L, 20L)).toDF("k", "v"), "k") // v2: pre-evolution
      q.processAllAvailable()
      // EVOLVE BEHIND THE RUNNING STREAM: one metadata-only ALTER
      // commit (v3, empty captured change set), then a WIDER commit
      VersionedKeyedTable.addColumns(spark, dir, Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType)))
      VersionedKeyedTable.upsert(spark, dir,
        Seq((3L, 30L, 7L)).toDF("k", "v", "x"), "k") // v4: carries x
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(mem)
    assert(got.columns.toSeq ===
      Seq("k", "change_type", "v", "v_prev", "_commit_version"),
      "the stream's schema stays FIXED at start — a restart picks " +
        "up the evolved shape")
    // the post-evolution row still FLOWS (by-name resolution just
    // drops the late column); the ALTER commit contributes nothing
    assert(got.select(col("k"), col("change_type"),
        col("_commit_version")).as[(Long, String, Long)]
      .collect().toSet ===
      Set((2L, "insert", 2L), (3L, "insert", 4L)))
    // EVOLVE-AHEAD: a fresh batch read fixes the EVOLVED schema and
    // reads pre-evolution change files' late columns as null
    val post = spark.read.format("graft.sinks.v2.CdfSource")
      .option("path", dir).option("keyCol", "k")
      .option("startingVersion", "1").load()
    assert(post.columns.contains("x") && post.columns.contains("x_prev"))
    val rows = post.select(col("k"), col("x")).as[(Long, Option[Long])]
      .collect().toMap
    assert(rows === Map(2L -> None, 3L -> Some(7L)),
      "pre-evolution change files must read the late column as null")
  }

  test("table-tail evolution seam: a `readStream.table` tail started " +
      "AFTER an additive evolution projects the evolved schema — " +
      "pre-evolution post-images read the late column as null; a tail " +
      "running ACROSS the evolution keeps its fixed pruned schema") {
    val base = Files.createTempDirectory("graft-tailevolve").toString
    spark.conf.set("spark.sql.catalog.gevo",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gevo.base", base)
    val dir = s"$base/t"
    VersionedKeyedTable.create(
      Seq((1L, 10L)).toDF("k", "v"), dir, "k", numBuckets = 2)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((2L, 20L)).toDF("k", "v"), "k") // v2: pre-evolution
    spark.sql("ALTER TABLE gevo.t ADD COLUMNS (x BIGINT)") // v3
    VersionedKeyedTable.upsert(spark, dir,
      Seq((3L, 30L, 7L)).toDF("k", "v", "x"), "k") // v4
    val mem = "tail_evolve_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    val q = spark.readStream.option("startingVersion", "1")
      .table("gevo.t")
      .writeStream.format("memory").queryName(mem)
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(mem)
    assert(got.columns.toSeq === Seq("k", "v", "x"),
      "a tail started after the evolution carries the evolved schema")
    assert(got.as[(Long, Long, Option[Long])].collect().toSet ===
      Set((2L, 20L, None), (3L, 30L, Some(7L))),
      "pre-evolution post-images read the late column as null")
  }
}
