package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.TestSpark

/** The store behind Spark's catalog contract: SQL identifiers,
  * VERSION/TIMESTAMP AS OF time travel, zone-map file pruning from
  * pushed filters, column pruning, and the read-only stance. */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val base: String = {
    val b = Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.base", b)
    b
  }

  test("SQL over the catalog: identifier reads, VERSION AS OF and " +
      "TIMESTAMP AS OF resolve the same snapshots the API pins") {
    val dir = s"$base/t1"
    VersionedKeyedTable.create(
      (1L to 100L).map(i => (i, s"v$i", i * 10L)).toDF("k", "s", "v"),
      dir, "k", numBuckets = 2)
    Thread.sleep(20L)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(20L)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((1L, "NEW", 999L)).toDF("k", "s", "v"), "k")
    // current state
    assert(spark.sql("SELECT s FROM gcat.t1 WHERE k = 1")
      .as[String].head() === "NEW")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.t1")
      .as[Long].head() === 100L)
    // version time travel
    assert(spark.sql("SELECT s FROM gcat.t1 VERSION AS OF 1 WHERE k = 1")
      .as[String].head() === "v1")
    // timestamp time travel (instant between the two commits)
    val iso = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(betweenMs))
    assert(spark.sql(
        s"SELECT s FROM gcat.t1 TIMESTAMP AS OF '$iso' WHERE k = 1")
      .as[String].head() === "v1")
    // aggregate parity with the API read
    val apiSum = VersionedKeyedTable.read(spark, dir)
      .agg(sum(col("v"))).as[Long].head()
    assert(spark.sql("SELECT sum(v) FROM gcat.t1").as[Long].head()
      === apiSum)
  }

  test("pushed filters prune data files through the manifest's zone " +
      "maps before partitions are planned; residuals keep rows exact") {
    val dir = s"$base/t2"
    VersionedKeyedTable.create(
      (1L to 2000L).map(i => (i, i % 50, s"g${i % 7}"))
        .toDF("k", "x", "s").repartition(8), dir, "k", numBuckets = 2)
    VersionedKeyedTable.cluster(spark, dir, "k", targetRowsPerFile = 200L)
    val n = spark.sql(
      "SELECT count(*) AS n FROM gcat.t2 WHERE k BETWEEN 100 AND 250")
      .as[Long].head()
    assert(n === 151L)
    val (kept, total) = graft.sinks.v2.GraftScanBuilder.lastPlanned.get()
    assert(kept < total,
      s"the key range must prune clustered files ($kept/$total)")
    // string-column predicate stays exact (string envelopes)
    assert(spark.sql(
        "SELECT count(*) AS n FROM gcat.t2 WHERE s = 'g3'")
      .as[Long].head() === 2000L / 7 + (if (3 <= 2000 % 7) 1 else 0))
  }

  test("aggregate pushdown: count(*)/min/max answer from the manifest " +
      "with ZERO data files planned; a WHERE clause declines to the " +
      "ordinary scan; results stay exact either way") {
    val dir = s"$base/t3"
    VersionedKeyedTable.create(
      (1L to 500L).map(i => (i, f"s$i%04d", i * 3))
        .toDF("k", "s", "v").repartition(4), dir, "k", numBuckets = 2)
    val r = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM gcat.t3")
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((500L, 1L, 500L)))
    val (kept, total) = graft.sinks.v2.GraftScanBuilder.lastPlanned.get()
    assert(kept === 0 && total > 0,
      s"metadata aggregates must plan zero file reads ($kept/$total)")
    // string MIN/MAX fold the string envelopes
    assert(spark.sql("SELECT min(s), max(s) FROM gcat.t3")
      .as[(String, String)].head() === (("s0001", "s0500")))
    // a filter declines the fast path — the ordinary pruned scan runs
    val n2 = spark.sql(
      "SELECT count(*) AS n FROM gcat.t3 WHERE k <= 100").as[Long].head()
    assert(n2 === 100L)
    val (kept2, _) = graft.sinks.v2.GraftScanBuilder.lastPlanned.get()
    assert(kept2 > 0, "a filtered aggregate must read data files")
    // an aggregate the manifest cannot answer (sum) declines too
    assert(spark.sql("SELECT sum(v) FROM gcat.t3").as[Long].head()
      === (1L to 500L).map(_ * 3).sum)
  }

  test("DDL refuses (DROP/ALTER route through the API) and missing " +
      "tables fail as SQL expects") {
    val e = intercept[UnsupportedOperationException] {
      spark.sql("DROP TABLE gcat.t1")
    }
    assert(e.getMessage.contains("DDL routes through"))
    val miss = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gcat.nope").collect()
    }
    assert(miss.getMessage.toLowerCase.contains("cannot be found") ||
      miss.getMessage.toLowerCase.contains("not found"))
  }

  test("the row scan rides Spark's vectorized parquet scan: the " +
      "pruned read schema reaches the parquet reader (a 2-column " +
      "SELECT over a wide table decodes 2 columns) and the physical " +
      "plan is a ParquetScan") {
    val dir = s"$base/t4"
    VersionedKeyedTable.create(
      (1L to 400L).map(i => (i, i * 2, i * 3, i * 5, s"s$i", i % 7))
        .toDF("k", "a", "b", "c", "s", "m").repartition(4),
      dir, "k", numBuckets = 2)
    val q = spark.sql("SELECT sum(b) AS sb FROM gcat.t4 WHERE k <= 100")
    assert(q.as[Long].head() === (1L to 100L).map(_ * 3).sum)
    val readCols = graft.sinks.v2.GraftScanBuilder.lastReadSchema.get()
    assert(readCols.toSet === Set("k", "b"),
      s"projection must prune to the referenced columns (got $readCols)")
    assert(q.queryExecution.executedPlan.toString.contains("ParquetScan"),
      "the catalog row scan must be Spark's vectorized ParquetScan")
  }

  test("timestamp columns scan correctly through the catalog row " +
      "path under the default INT96 parquet encoding") {
    val dir = s"$base/t5"
    val t0 = java.sql.Timestamp.valueOf("2026-03-04 05:06:07.123456")
    val t1 = java.sql.Timestamp.valueOf("2026-03-05 06:07:08.654321")
    VersionedKeyedTable.create(
      Seq((1L, t0), (2L, t1)).toDF("k", "ts"), dir, "k", numBuckets = 1)
    assert(spark.sql("SELECT ts FROM gcat.t5 WHERE k = 2")
      .as[java.sql.Timestamp].head() === t1)
    assert(spark.sql(
        "SELECT count(*) AS n FROM gcat.t5 " +
          "WHERE ts >= TIMESTAMP'2026-03-05 00:00:00'")
      .as[Long].head() === 1L)
  }

  test("INSERT INTO lands as exactly one upsert commit with put " +
      "semantics (replace-by-key), stamped in commit metadata; " +
      "INSERT into a time-travel snapshot refuses") {
    val dir = s"$base/t6"
    VersionedKeyedTable.create(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "v"),
      dir, "k", numBuckets = 2)
    spark.sql(
      "INSERT INTO gcat.t6 VALUES (2, 'B2', 222), (3, 'c', 30)")
    assert(VersionedKeyedTable.completeVersions(spark, dir).size === 2,
      "one INSERT = one commit")
    val got = VersionedKeyedTable.read(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "a", 10L), (2L, "B2", 222L), (3L, "c", 30L)),
      "colliding keys replace, new keys append (put semantics)")
    assert(VersionedKeyedTable.snapshot(spark, dir).meta
      .contains("graft.sql.insert"))
    // the same rows through the catalog scan (write face = read face)
    assert(spark.sql("SELECT count(*) AS n FROM gcat.t6 WHERE v >= 30")
      .as[Long].head() === 2L)
    // history is immutable: no DML on a pinned snapshot
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcat.t6 VERSION AS OF 1 VALUES (9,'z',9)")
    }
    assert(e.getMessage.toLowerCase.contains("time-travel") ||
      e.getMessage.toLowerCase.contains("version") ||
      e.getMessage.toLowerCase.contains("not support"),
      s"unexpected error: ${e.getMessage}")
  }

  test("DELETE FROM lands as one CDF-captured delete commit (doomed " +
      "keys resolved through the pruned scan); TRUNCATE TABLE empties " +
      "the table; untranslatable conditions refuse loudly") {
    val dir = s"$base/t7"
    VersionedKeyedTable.create(
      (1L to 200L).map(i => (i, i % 10, s"s$i")).toDF("k", "m", "s"),
      dir, "k", numBuckets = 2)
    spark.sql("DELETE FROM gcat.t7 WHERE k BETWEEN 50 AND 149 AND m = 3")
    assert(VersionedKeyedTable.completeVersions(spark, dir).size === 2,
      "one DELETE = one commit")
    val left = VersionedKeyedTable.read(spark, dir)
      .select(col("k")).as[Long].collect().toSet
    val expected = (1L to 200L)
      .filterNot(i => i >= 50 && i <= 149 && i % 10 == 3).toSet
    assert(left === expected)
    // the delete is CDF-visible like every mutation
    val changes = VersionedKeyedTable.changesBetween(spark, dir, "k", 1L, 2L)
    assert(changes.where(col("change_type") === "delete").count() === 10L)
    // an expression the filter API can't carry routes through the
    // copy-on-write row-level path instead — one replace commit
    val n0 = VersionedKeyedTable.read(spark, dir).count()
    val v0 = VersionedKeyedTable.completeVersions(spark, dir).size
    spark.sql("DELETE FROM gcat.t7 WHERE k % 7 = 0")
    assert(VersionedKeyedTable.completeVersions(spark, dir).size
      === v0 + 1, "an expression DELETE is one CoW replace commit")
    val survivors = VersionedKeyedTable.read(spark, dir)
      .select(col("k")).as[Long].collect().toSet
    assert(survivors === expected.filterNot(_ % 7 == 0) &&
      survivors.size < n0)
    // TRUNCATE = delete-all through the same commit path
    spark.sql("TRUNCATE TABLE gcat.t7")
    assert(VersionedKeyedTable.read(spark, dir).count() === 0L)
    assert(spark.sql("SELECT count(*) AS n FROM gcat.t7")
      .as[Long].head() === 0L)
  }

  test("UPDATE and MERGE INTO run as copy-on-write row-level " +
      "operations: one pinned replace commit each, net CDF capture, " +
      "and the _file metadata column is queryable") {
    val dir = s"$base/t8"
    VersionedKeyedTable.create(
      (1L to 20L).map(i => (i, i % 4, i * 10L)).toDF("k", "m", "v"),
      dir, "k", numBuckets = 2)
    // UPDATE: matched rows change, the rest pass through untouched
    spark.sql("UPDATE gcat.t8 SET v = v * 2 WHERE m = 1")
    assert(VersionedKeyedTable.read(spark, dir)
      .as[(Long, Long, Long)].collect().toSet ===
      (1L to 20L).map(i =>
        (i, i % 4, if (i % 4 == 1) i * 20L else i * 10L)).toSet)
    // the replace commit captures the NET diff — exactly the 5
    // changed rows, never the 15 pass-throughs
    val cdf = VersionedKeyedTable.changesBetween(spark, dir, "k", 1L, 2L)
    assert(cdf.groupBy(col("change_type")).count()
      .as[(String, Long)].collect().toMap === Map("update" -> 5L))
    assert(VersionedKeyedTable.snapshot(spark, dir).meta
      .contains("graft.sql.update"))
    // MERGE INTO: matched update + matched-conditional delete +
    // not-matched insert, one commit
    Seq((2L, 999L), (8L, -1L), (100L, 111L)).toDF("mk", "mv")
      .createOrReplaceTempView("graft_merge_src")
    spark.sql(
      """MERGE INTO gcat.t8 t USING graft_merge_src s ON t.k = s.mk
         WHEN MATCHED AND s.mv < 0 THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = s.mv
         WHEN NOT MATCHED THEN INSERT (k, m, v) VALUES (s.mk, 0, s.mv)""")
    val got = VersionedKeyedTable.read(spark, dir)
      .where(col("k").isin(2L, 8L, 100L))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((2L, 2L, 999L), (100L, 0L, 111L)),
      "k=2 updated in place, k=8 deleted, k=100 inserted")
    assert(VersionedKeyedTable.snapshot(spark, dir).meta
      .contains("graft.sql.merge"))
    // the _file metadata column resolves like Delta/Iceberg's
    val files = spark.sql("SELECT DISTINCT _file FROM gcat.t8")
      .as[String].collect()
    assert(files.nonEmpty && files.forall(_.startsWith("data/")),
      s"_file must carry manifest-relative paths (got ${files.take(2)
        .mkString(",")})")
  }

  test("INSERT OVERWRITE replaces the whole table in ONE atomic " +
      "commit (no visible empty state), CDF-captured as the net diff") {
    val dir = s"$base/t9"
    VersionedKeyedTable.create(
      (1L to 10L).map(i => (i, i * 10L)).toDF("k", "v"),
      dir, "k", numBuckets = 2)
    spark.sql(
      "INSERT OVERWRITE gcat.t9 SELECT k, v * 100 FROM gcat.t9 WHERE k <= 3")
    assert(VersionedKeyedTable.completeVersions(spark, dir).size === 2,
      "one INSERT OVERWRITE = one commit")
    assert(VersionedKeyedTable.read(spark, dir)
      .as[(Long, Long)].collect().toSet ===
      Set((1L, 1000L), (2L, 2000L), (3L, 3000L)))
    val cdf = VersionedKeyedTable.changesBetween(spark, dir, "k", 1L, 2L)
    assert(cdf.groupBy(col("change_type")).count()
      .as[(String, Long)].collect().toMap ===
      Map("update" -> 3L, "delete" -> 7L),
      "the overwrite's CDF is the net keyed diff")
    assert(VersionedKeyedTable.snapshot(spark, dir).meta
      .contains("graft.sql.overwrite"))
    // under partitionOverwriteMode=dynamic Spark plans
    // OverwritePartitionsDynamic — on an unpartitioned keyed table it
    // must degenerate to the same full replace
    val key = "spark.sql.sources.partitionOverwriteMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try spark.sql(
      "INSERT OVERWRITE gcat.t9 SELECT k, v * 10 FROM gcat.t9 WHERE k = 1")
    finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    assert(VersionedKeyedTable.read(spark, dir)
      .as[(Long, Long)].collect().toSet === Set((1L, 10000L)),
      "dynamic-mode overwrite of an unpartitioned table replaces all")
  }

  test("replaceAll with expectedVersion fails loudly on an " +
      "intervening commit — the serializable copy-on-write conflict") {
    val dir = s"$base/t10"
    VersionedKeyedTable.create(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir, "k", numBuckets = 2)
    val pinned = VersionedKeyedTable.snapshot(spark, dir).version
    VersionedKeyedTable.upsert(spark, dir,
      Seq((3L, 30L)).toDF("k", "v"), "k") // the racer lands first
    val e = intercept[java.util.ConcurrentModificationException] {
      VersionedKeyedTable.replaceAll(spark, dir,
        Seq((9L, 90L)).toDF("k", "v"), "k",
        expectedVersion = Some(pinned))
    }
    assert(e.getMessage.contains("stale snapshot"))
    // nothing half-applied: the racer's state is intact
    assert(VersionedKeyedTable.read(spark, dir).count() === 3L)
  }
}
