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
    val q = spark.sql(
      "SELECT count(*) AS n FROM gcat.t2 WHERE k BETWEEN 100 AND 250")
    assert(q.collect()(0).getLong(0) === 151L)
    val (kept, total) =
      graft.sinks.v2.GraftScanInspect.rowScan(q).plannedFileCounts
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
    val q0 = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM gcat.t3")
    val r = q0.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((500L, 1L, 500L)))
    assert(graft.sinks.v2.GraftScanInspect.aggScans(q0)
        .exists(_.totalFiles > 0) &&
        graft.sinks.v2.GraftScanInspect.rowScans(q0).isEmpty,
      "metadata aggregates must plan zero file reads (GraftAggScan " +
        "only in the plan)")
    // string MIN/MAX fold the string envelopes
    assert(spark.sql("SELECT min(s), max(s) FROM gcat.t3")
      .as[(String, String)].head() === (("s0001", "s0500")))
    // a filter declines the fast path — the ordinary pruned scan runs
    val q2 = spark.sql(
      "SELECT count(*) AS n FROM gcat.t3 WHERE k <= 100")
    assert(q2.collect()(0).getLong(0) === 100L)
    assert(graft.sinks.v2.GraftScanInspect.rowScan(q2)
        .plannedFileCounts._1 > 0,
      "a filtered aggregate must read data files")
    // an aggregate the manifest cannot answer (sum) declines too
    assert(spark.sql("SELECT sum(v) FROM gcat.t3").as[Long].head()
      === (1L to 500L).map(_ * 3).sum)
  }

  test("SQL DDL lifecycle: CREATE TABLE fixes the layout (key + " +
      "buckets), CTAS lands the query's rows, DROP TABLE removes only " +
      "real stores; ALTER/RENAME still refuse") {
    // CREATE with the bucket transform naming the key column
    spark.sql("CREATE TABLE gcat.ddl1 (k BIGINT, s STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    assert(KeyedTable.readMeta(spark, s"$base/ddl1").get._1 === 4)
    assert(KeyedTable.readMetaKey(spark, s"$base/ddl1") === Some("k"))
    spark.sql("INSERT INTO gcat.ddl1 VALUES (1, 'a', 10), (2, 'b', 20)")
    assert(spark.sql("SELECT sum(v) FROM gcat.ddl1").as[Long].head()
      === 30L)
    // creating it again must refuse (no silent overwrite)
    intercept[org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException] {
      spark.sql("CREATE TABLE gcat.ddl1 (k BIGINT) " +
        "PARTITIONED BY (bucket(4, k))")
    }
    // a key column is MANDATORY — it is the store's layout contract
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.ddlbad (k BIGINT, v BIGINT)")
    }
    // CTAS: layout from TBLPROPERTIES, rows from the query
    spark.sql("CREATE TABLE gcat.ddl2 TBLPROPERTIES " +
      "('key'='k', 'buckets'='2') AS " +
      "SELECT k, v * 2 AS w FROM gcat.ddl1")
    assert(spark.sql("SELECT sum(w) FROM gcat.ddl2").as[Long].head()
      === 60L)
    assert(KeyedTable.readMeta(spark, s"$base/ddl2").get._1 === 2)
    // DROP removes the store; the directory is gone afterwards
    spark.sql("DROP TABLE gcat.ddl2")
    assert(!new java.io.File(s"$base/ddl2").exists())
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gcat.ddl2").collect()
    }
    // IF EXISTS on a missing table is a no-op; without it, it fails
    spark.sql("DROP TABLE IF EXISTS gcat.ddl2")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DROP TABLE gcat.ddl2")
    }
    // RENAME remains refused (layout identity is fixed at creation)
    intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE gcat.ddl1 RENAME TO gcat.ddl1b")
    }
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
    // collect() on THIS dataset finalizes ITS adaptive plan (as[]/
    // head() would spawn a separate QueryExecution and leave q's
    // AQE plan unfinalized)
    val q = spark.sql("SELECT sum(b) AS sb FROM gcat.t4 WHERE k <= 100")
    assert(q.collect()(0).getLong(0) === (1L to 100L).map(_ * 3).sum)
    val readCols =
      graft.sinks.v2.GraftScanInspect.rowScan(q).readSchemaNames
    assert(readCols.toSet === Set("k", "b"),
      s"projection must prune to the referenced columns (got $readCols)")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftRowScan"),
      "the catalog row scan must be the runtime-filterable GraftRowScan")
    assert(plan.contains("ColumnarToRow"),
      "the delegate must produce COLUMNAR (vectorized parquet) batches")
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

  test("runtime filtering: a broadcast equi join's dim keys re-prune " +
      "the fact file set at execution time through zone maps and " +
      "blooms; rows stay exact") {
    val dir = s"$base/rt1"
    VersionedKeyedTable.create(
      (1L to 4000L).map(i => (i, i * 3L)).toDF("k", "v").repartition(8),
      dir, "k", numBuckets = 2)
    // key-clustered: each file covers a narrow disjoint key range
    VersionedKeyedTable.cluster(spark, dir, "k",
      targetRowsPerFile = 250L)
    // the dim must be (a) FILE-backed — a LocalRelation constant-folds
    // its filter away and PartitionPruning sees no selective predicate
    // — and (b) filtered on a NON-key column: a predicate on the join
    // key itself is propagated onto the fact side STATICALLY by
    // InferFiltersFromConstraints and the manifest prunes at plan
    // time, leaving the runtime filter nothing to do. grp = k/50 is
    // opaque to the optimizer, so only the runtime key set can prune.
    (1L to 4000L).map(i => (i, i / 50L)).toDF("k", "grp")
      .write.parquet(s"$base/rt1dim")
    val dim = spark.read.parquet(s"$base/rt1dim")
      .where(col("grp") === 2L).select("k") // keys 100..149
    val rq = spark.table("gcat.rt1")
      .join(broadcast(dim), "k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val row = rq.collect()(0)
    assert((row.getLong(0), row.getLong(1)) ===
      ((50L, (100L to 149L).sum * 3L)))
    val scan = graft.sinks.v2.GraftScanInspect.rowScan(rq)
    assert(scan.runtimeFilterFired, "the runtime filter must have fired")
    val (rtKept, atPlan) = scan.runtimeFileCounts
    assert(rtKept < atPlan,
      s"dim keys must prune fact files at runtime ($rtKept/$atPlan)")
  }

  test("runtime filtering is conservative and exact at the edges: " +
      "absent dim keys prune everything; stats-less columns prune " +
      "nothing; results never lose rows") {
    val dir = s"$base/rt2"
    VersionedKeyedTable.create(
      (1L to 1000L).map(i => (i, s"s${i % 13}", i))
        .toDF("k", "tag", "v").repartition(4), dir, "k", numBuckets = 2)
    VersionedKeyedTable.cluster(spark, dir, "k",
      targetRowsPerFile = 125L)
    // absent keys (file-backed, filtered on the non-key grp column so
    // nothing reaches the fact statically): blooms/zones prune every
    // file at runtime, the join returns empty
    Seq((90001L, 1L), (90002L, 1L), (5L, 2L)).toDF("k", "grp")
      .write.parquet(s"$base/rt2dim")
    val ghost = spark.read.parquet(s"$base/rt2dim")
      .where(col("grp") === 1L).select("k")
    val gq = spark.table("gcat.rt2").join(broadcast(ghost), "k")
      .agg(count(lit(1)).as("n"))
    assert(gq.collect()(0).getLong(0) === 0L)
    val gscan = graft.sinks.v2.GraftScanInspect.rowScan(gq)
    assert(gscan.runtimeFilterFired, "the runtime filter must have fired")
    val (ghostKept, ghostPlan) = gscan.runtimeFileCounts
    assert(ghostPlan > 0 && ghostKept === 0,
      s"absent keys must prune every file ($ghostKept/$ghostPlan)")
    // a join on a column with NO recorded stats must not prune —
    // and must still be exact (the scan declines file pruning, the
    // join itself filters rows)
    val tagDim = Seq("s3").toDF("tag")
    val n = spark.table("gcat.rt2").join(broadcast(tagDim), "tag")
      .count()
    assert(n === (1L to 1000L).count(_ % 13 == 3))
  }

  /** ShuffleExchangeExec count across the EXECUTED adaptive plan,
    * descending into materialized query stages (where AQE hides the
    * exchanges from a plain collect). */
  private def shuffleCount(
      p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    p match {
      case a: AdaptiveSparkPlanExec => shuffleCount(a.executedPlan)
      case q: QueryStageExec => shuffleCount(q.plan)
      case s: ShuffleExchangeLike =>
        1 + s.children.map(shuffleCount).sum
      case other => other.children.map(shuffleCount).sum
    }
  }

  private def withSpj[A](f: => A): A = {
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "true")
    spark.conf.set(keys(1), "true")
    spark.conf.set(keys(2), "-1") // force a non-broadcast join
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("storage-partitioned join: two co-bucketed store tables join " +
      "on the key with NO shuffle on either side; groupBy(key) " +
      "aggregates with NO exchange at all; results stay exact") {
    VersionedKeyedTable.create(
      (1L to 3000L).map(i => (i, i * 2L)).toDF("k", "v").repartition(4),
      s"$base/spj1", "k", numBuckets = 4)
    VersionedKeyedTable.create(
      (1L to 3000L).filter(_ % 3 != 0).map(i => (i, i * 5L))
        .toDF("k", "w").repartition(4),
      s"$base/spj2", "k", numBuckets = 4)
    withSpj {
      val j = spark.table("gcat.spj1").join(spark.table("gcat.spj2"), "k")
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
      // collect j ITSELF so its adaptive plan finalizes (an .as[]
      // view would execute a separate QueryExecution)
      val row = j.collect()(0)
      val expect = (1L to 3000L).filter(_ % 3 != 0)
      assert((row.getLong(0), row.getLong(1)) ===
        ((expect.size.toLong, expect.map(i => i * 7L).sum)))
      // exactly ONE shuffle: the final single-partition fold of the
      // aggregate — the JOIN itself moved nothing
      assert(shuffleCount(j.queryExecution.executedPlan) === 1,
        j.queryExecution.executedPlan.toString.take(2000))
      // groupBy on the bucket key: partial+final collapse in place,
      // zero exchanges anywhere
      val g = spark.table("gcat.spj1").groupBy(col("k"))
        .agg(sum(col("v")).as("sv"))
      assert(g.collect().length === 3000)
      assert(shuffleCount(g.queryExecution.executedPlan) === 0,
        g.queryExecution.executedPlan.toString.take(2000))
    }
    // with v2 bucketing OFF (the default), the same join still answers
    // exactly — partitions stay split-planned, Spark shuffles as usual
    val off = spark.table("gcat.spj1").join(spark.table("gcat.spj2"), "k")
      .agg(sum(col("v") + col("w")).as("s")).as[Long].head()
    assert(off === (1L to 3000L).filter(_ % 3 != 0).map(_ * 7L).sum)
  }

  test("SQL maintenance procedures: CALL cluster tightens the layout " +
      "(range scans prune), CALL compact merges fragments, CALL " +
      "vacuum runs without committing; unknown procedures refuse") {
    val dir = s"$base/proc1"
    VersionedKeyedTable.create(
      (1L to 1000L).filter(_ % 2 == 0).map(i => (i, i * 3L))
        .toDF("k", "v").repartition(4), dir, "k", numBuckets = 2)
    VersionedKeyedTable.upsert(spark,
      dir, (1L to 1000L).filter(_ % 2 == 1).map(i => (i, i * 3L))
        .toDF("k", "v").repartition(4), "k")
    // fragmented: 2 commits × 4 parts × 2 buckets
    val r1 = spark.sql(
      "CALL gcat.compact(tbl => 'proc1', max_files_per_bucket => 1)")
      .collect()(0)
    assert(r1.getString(0) === "proc1")
    assert(r1.getLong(2) === r1.getLong(1) + 1, "one layout commit")
    assert(r1.getInt(4) <= 2 && r1.getInt(4) < r1.getInt(3),
      s"compaction must merge to <=1 file/bucket " +
        s"(${r1.getInt(3)} -> ${r1.getInt(4)})")
    val r2 = spark.sql(
      "CALL gcat.cluster(tbl => 'proc1', target_rows_per_file => 100)")
      .collect()(0)
    assert(r2.getInt(4) > r2.getInt(3), "clustering splits at targets")
    // the clustered layout prunes a key-range scan
    val pq = spark.sql(
      "SELECT count(*) AS n FROM gcat.proc1 WHERE k BETWEEN 100 AND 250")
    assert(pq.collect()(0).getLong(0) === 151L)
    val (kept, total) =
      graft.sinks.v2.GraftScanInspect.rowScan(pq).plannedFileCounts
    assert(kept < total,
      s"the CALLed clustering must make zone maps selective ($kept/$total)")
    // vacuum reclaims without committing; rows intact
    val r3 = spark.sql(
      "CALL gcat.vacuum(tbl => 'proc1', keep_versions => 1)").collect()(0)
    assert(r3.getLong(2) === r3.getLong(1), "vacuum commits nothing")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.proc1")
      .as[Long].head() === 1000L)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("CALL gcat.nope(tbl => 'proc1')")
    }
    intercept[Exception] {
      spark.sql("CALL gcat.compact(tbl => 'missing_table')").collect()
    }
    // declared parameter DEFAULTS bind when omitted
    val r4 = spark.sql("CALL gcat.compact(tbl => 'proc1')").collect()(0)
    assert(r4.getString(0) === "proc1")
  }

  test("metadata tables: `t$history` walks the commit log and " +
      "`t$files` lists the snapshot's layout with manifest stats — " +
      "metadata scale, VERSION AS OF pins both") {
    val dir = s"$base/meta1"
    VersionedKeyedTable.create(
      (1L to 100L).map(i => (i, i * 3L)).toDF("k", "v"), dir, "k",
      numBuckets = 2)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((200L, 600L)).toDF("k", "v"), "k")
    val hist = spark.sql("SELECT version, captured_changes, " +
        "n_files FROM gcat.`meta1$history` ORDER BY version").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(!hist(0).getBoolean(1) && hist(1).getBoolean(1),
      "create does not capture changes; the upsert does")
    // VERSION AS OF bounds the history
    assert(spark.sql(
        "SELECT count(*) FROM gcat.`meta1$history` VERSION AS OF 1")
      .as[Long].head() === 1L)
    // files: every snapshot file with its rows + key envelope
    val files = spark.sql("SELECT bucket, file, rows, key_min, key_max " +
      "FROM gcat.`meta1$files`").collect()
    val snap = VersionedKeyedTable.snapshot(spark, dir)
    assert(files.length === snap.files.valuesIterator.map(_.size).sum)
    assert(files.map(_.getLong(2)).sum === 101L,
      "manifest row counts must cover the table")
    // the pinned v1 listing excludes the upsert's files
    assert(spark.sql(
        "SELECT sum(rows) FROM gcat.`meta1$files` VERSION AS OF 1")
      .as[Long].head() === 100L)
    // metadata relations plan as local scans — no file reads at all
    val plan = spark.sql("SELECT * FROM gcat.`meta1$files`")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan.take(500))
  }

  test("one-sided storage-partitioned join: a PLAIN relation joined " +
      "to a store table shuffles BY THE SERVED BUCKET FUNCTION while " +
      "the store side never moves; rows stay exact") {
    VersionedKeyedTable.create(
      (1L to 3000L).map(i => (i, i * 2L)).toDF("k", "v").repartition(4),
      s"$base/spjone", "k", numBuckets = 4)
    (1L to 3000L).filter(_ % 3 == 0).map(i => (i, i * 5L))
      .toDF("k", "w").write.parquet(s"$base/spjone_dim")
    val dim = spark.read.parquet(s"$base/spjone_dim")
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.shuffle.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.take(2).foreach(spark.conf.set(_, "true"))
    spark.conf.set(keys(2), "-1")
    try {
      val q = spark.table("gcat.spjone").join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
      val row = q.collect()(0)
      val expect = (1L to 3000L).filter(_ % 3 == 0)
      assert((row.getLong(0), row.getLong(1)) ===
        ((expect.size.toLong, expect.map(_ * 7L).sum)))
      // exactly TWO shuffles: the dim re-clustered by the store's own
      // bucket function (produceResult evaluated per row) + the final
      // scalar fold — the store side reads in place
      assert(shuffleCount(q.queryExecution.executedPlan) === 2,
        q.queryExecution.executedPlan.toString.take(2000))
      val finalPlan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(finalPlan.contains("keygroupedpartitioning(") &&
        finalPlan.contains("GraftBucketBound"),
        "the dim exchange must hash with the catalog-served bucket " +
          "function, not Spark's murmur3 — the store's placement IS " +
          "the distribution:\n" + finalPlan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("the served bucket function matches the store's placement " +
      "rule exactly, for long AND string keys") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val fLong = new graft.sinks.v2.GraftBucketBound(
      org.apache.spark.sql.types.LongType)
    val fStr = new graft.sinks.v2.GraftBucketBound(
      org.apache.spark.sql.types.StringType)
    val n = 7
    // the store's own rule, computed by Spark SQL
    val viaSql = spark.range(1, 500).toDF("k")
      .select(col("k"),
        pmod(xxhash64(col("k")), lit(n.toLong)).cast("int").as("b"),
        pmod(xxhash64(concat(lit("s"), col("k"))), lit(n.toLong))
          .cast("int").as("bs"))
      .collect()
    viaSql.foreach { r =>
      val k = r.getLong(0)
      assert(fLong.produceResult(InternalRow(n, k)) === r.getInt(1),
        s"long key $k")
      assert(fStr.produceResult(
          InternalRow(n, UTF8String.fromString(s"s$k"))) === r.getInt(2),
        s"string key s$k")
    }
    // the catalog serves it
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.FunctionCatalog]
    val fn = cat.loadFunction(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "bucket"))
    assert(fn.name() === "bucket")
  }

  test("readStream.table tails the table as post-images; a delete " +
      "fails the stream loudly; ignoreDeletes skips it; time-travel " +
      "snapshots refuse streaming") {
    val dir = s"$base/tail1"
    VersionedKeyedTable.create(
      (1L to 20L).map(i => (i, i * 10L)).toDF("k", "v"), dir, "k", 2)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((1L, 999L), (21L, 210L)).toDF("k", "v"), "k")
    VersionedKeyedTable.upsert(spark, dir,
      Seq((22L, 220L)).toDF("k", "v"), "k")
    def tail(mem: String, ignoreDeletes: Boolean = false): Unit = {
      val r = spark.readStream.option("startingVersion", "1")
      val q = (if (ignoreDeletes) r.option("ignoreDeletes", "true")
               else r).table("gcat.tail1")
        .writeStream.format("memory").queryName(mem)
        .option("checkpointLocation",
          Files.createTempDirectory("graft-tailck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    tail("tail_a")
    // post-images of the two commits after v1, table schema, no CDF cols
    val got = spark.table("tail_a").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 999L), (21L, 210L), (22L, 220L)))
    assert(spark.table("tail_a").columns.toSeq === Seq("k", "v"))
    // a delete commit fails the tail loudly...
    VersionedKeyedTable.delete(spark, dir, Seq(21L).toDF("k"), "k")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      tail("tail_b")
    }
    assert(ex.getMessage.contains("DELETE") ||
      Option(ex.getCause).exists(_.getMessage.contains("DELETE")))
    // ...and ignoreDeletes skips it (same span, deletes dropped)
    tail("tail_c", ignoreDeletes = true)
    assert(spark.table("tail_c").as[(Long, Long)].collect().toSet ===
      Set((1L, 999L), (21L, 210L), (22L, 220L)))
    // startingTimestamp resolves through the TIMESTAMP AS OF rule:
    // starting "now" tails only commits after the current instant —
    // the already-landed history must NOT replay
    val memTs = "tail_ts"
    val qTs = spark.readStream
      .option("startingTimestamp",
        System.currentTimeMillis().toString)
      .table("gcat.tail1")
      .writeStream.format("memory").queryName(memTs)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-tailtsck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try qTs.processAllAvailable() finally qTs.stop()
    assert(spark.table(memTs).count() === 0L)
    // both starting rules together refuse loudly (the failure lands
    // on the stream thread, so it surfaces as the query's exception)
    val qBoth = spark.readStream.option("startingVersion", "1")
      .option("startingTimestamp", "0")
      .table("gcat.tail1")
      .writeStream.format("memory").queryName("tail_both")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-tailbk").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val exBoth = intercept[Exception] {
      try qBoth.processAllAvailable() finally qBoth.stop()
    }
    assert(exBoth.toString.contains("mutually exclusive") ||
      Option(exBoth.getCause)
        .exists(_.toString.contains("mutually exclusive")))
    // a pinned snapshot refuses streaming (history is immutable)
    val pinned = new graft.sinks.v2.GraftSqlTable(dir, "tail1", Some(1L))
    val sb = pinned.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
    intercept[UnsupportedOperationException] {
      sb.build().toMicroBatchStream("/tmp/graft-tail-tt")
    }
  }

  test("ALTER TABLE ADD COLUMNS: one additive METADATA-ONLY commit — " +
      "no data file touched, existing rows read null, SQL INSERT sees " +
      "the evolved schema, time travel keeps each version's shape; " +
      "collisions (key column, any live column, any case) and " +
      "non-additive changes refuse") {
    spark.sql("CREATE TABLE gcat.alt1 (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(2, k))")
    spark.sql("INSERT INTO gcat.alt1 VALUES (1, 10), (2, 20)")
    val dir = s"$base/alt1"
    val before = VersionedKeyedTable.snapshot(spark, dir)
    spark.sql("ALTER TABLE gcat.alt1 ADD COLUMNS (x BIGINT, s STRING)")
    val after = VersionedKeyedTable.snapshot(spark, dir)
    assert(after.version === before.version + 1,
      "ADD COLUMNS is exactly one commit (even for several columns)")
    assert(after.files === before.files,
      "metadata-only: no data file moved, added, or rewritten")
    assert(after.schema.get.fieldNames.toSeq ===
      Seq("k", "v", "x", "s"))
    // pre-evolution rows read the late columns as null
    val r = spark.sql("SELECT x, s FROM gcat.alt1 WHERE k = 1")
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    // SQL INSERT analyzes against the evolved schema — the SQL-only
    // user can now land wider rows
    spark.sql("INSERT INTO gcat.alt1 VALUES (3, 30, 7, 'c')")
    assert(spark.sql(
        "SELECT k, v, x, s FROM gcat.alt1 WHERE k = 3")
      .collect()(0).toSeq === Seq(3L, 30L, 7L, "c"))
    // time travel keeps the pre-evolution shape at the old version
    assert(spark.sql(
        s"SELECT * FROM gcat.alt1 VERSION AS OF ${before.version}")
      .columns.toSeq === Seq("k", "v"))
    // the change feed serves the evolved schema; pre-evolution change
    // rows read the late columns as null
    val cdf = spark.sql("SELECT k, x FROM gcat.`alt1$changes`")
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    assert(cdf === Map(1L -> None, 2L -> None, 3L -> Some(7L)))
    // collisions refuse — the key column, a live column, ANY case
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.alt1 ADD COLUMNS (k BIGINT)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.alt1 ADD COLUMNS (V BIGINT)")
    }
    // non-additive evolution refuses (drop / rename / retype)
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.alt1 DROP COLUMN v")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.alt1 RENAME COLUMN v TO w")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.alt1 ALTER COLUMN v TYPE STRING")
    }
    // the refusals left no commit behind
    assert(VersionedKeyedTable.snapshot(spark, dir).schema.get
      .fieldNames.toSeq === Seq("k", "v", "x", "s"))
  }

  test("write.mode=mor table property: SQL DELETE defers as delete " +
      "files and SQL INSERT appends merge-on-read — no bucket " +
      "rewrite; truncate-shaped deletes stay copy-on-write; UNSET " +
      "restores CoW; the session conf overrides the property") {
    spark.sql("CREATE TABLE gcat.wm (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(2, k)) " +
      "TBLPROPERTIES ('write.mode'='mor')")
    val dir = s"$base/wm"
    spark.sql("INSERT INTO gcat.wm VALUES (1, 10), (2, 20), (3, 30)")
    val files1 = VersionedKeyedTable.snapshot(spark, dir).files
      .values.flatten.toSet
    // a keyed SQL DELETE writes a delete file; EVERY data file stays
    spark.sql("DELETE FROM gcat.wm WHERE k = 2")
    val snap2 = VersionedKeyedTable.snapshot(spark, dir)
    assert(snap2.files.values.flatten.toSet === files1,
      "write.mode=mor must leave the data file set identical")
    assert(snap2.deletes.valuesIterator.flatten.nonEmpty)
    assert(spark.sql("SELECT count(*) AS n FROM gcat.wm")
      .collect()(0).getLong(0) === 2L)
    // INSERT appends (put semantics preserved); prior files survive
    spark.sql("INSERT INTO gcat.wm VALUES (1, 11), (4, 40)")
    val snap3 = VersionedKeyedTable.snapshot(spark, dir)
    assert(files1.subsetOf(snap3.files.values.flatten.toSet),
      "mor INSERT appends — no pre-existing file is replaced")
    assert(spark.sql("SELECT v FROM gcat.wm WHERE k = 1")
      .collect()(0).getLong(0) === 11L, "put semantics survive mor")
    // SHOW TBLPROPERTIES surfaces the regimen
    val props = spark.sql("SHOW TBLPROPERTIES gcat.wm").collect()
      .map(p => p.getString(0) -> p.getString(1)).toMap
    assert(props.get("write.mode").contains("mor"))
    // the session conf OVERRIDES the property (cow wins here)
    spark.conf.set("spark.graft.delete.mode", "cow")
    try spark.sql("DELETE FROM gcat.wm WHERE k = 3")
    finally spark.conf.unset("spark.graft.delete.mode")
    val snap4 = VersionedKeyedTable.snapshot(spark, dir)
    assert(snap4.files.values.flatten.toSet !== files1,
      "the cow override must rewrite the touched bucket")
    // truncate-shaped delete stays CoW even under mor (a delete file
    // holding every key would be strictly worse)
    spark.sql("DELETE FROM gcat.wm")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.wm")
      .collect()(0).getLong(0) === 0L)
    // UNSET restores copy-on-write for future DML
    spark.sql("ALTER TABLE gcat.wm UNSET TBLPROPERTIES ('write.mode')")
    spark.sql("INSERT INTO gcat.wm VALUES (7, 70)")
    spark.sql("DELETE FROM gcat.wm WHERE k = 7")
    assert(VersionedKeyedTable.snapshot(spark, dir)
      .deletes.valuesIterator.flatten.isEmpty,
      "after UNSET a keyed DELETE rewrites copy-on-write (no delete " +
        "file)")
  }
}
