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
    // non-additive evolution refuses (rename / retype); DROP COLUMN
    // is its own metadata-only operation — see the dedicated test
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

  test("pushed LIMIT plans a row-count-sufficient file prefix; " +
      "residual filters and pending MoR deletes decline truncation") {
    val dir = s"$base/lim"
    VersionedKeyedTable.create(
      (1L to 2000L).map(i => (i, i * 10L)).toDF("k", "v")
        .repartition(8), dir, "k", numBuckets = 2)
    val total = VersionedKeyedTable.snapshot(spark, dir)
      .files.valuesIterator.map(_.size).sum
    assert(total > 2, s"fixture needs several files, got $total")
    val peek = spark.sql(
      "SELECT count(*) AS n FROM (SELECT * FROM gcat.lim LIMIT 3)")
    assert(peek.collect()(0).getLong(0) === 3L)
    val ev = graft.sinks.v2.GraftScanInspect.rowScan(peek).limitFileCounts
    assert(ev.isDefined, "pushed LIMIT must reach file planning")
    val (planned, before) = ev.get
    assert(planned === 1 && before === total,
      s"LIMIT 3 over ${total} counted files must plan a one-file " +
        s"prefix ($planned/$before)")
    // rows stay exact: Spark's own limit rides on top (partial push)
    assert(spark.sql("SELECT count(*) AS n FROM (SELECT * FROM " +
        "gcat.lim LIMIT 999999)").collect()(0).getLong(0) === 2000L)
    // a residual filter between scan and limit declines truncation
    val filtered = spark.sql("SELECT count(*) AS n FROM (SELECT * " +
      "FROM gcat.lim WHERE v % 20 = 0 LIMIT 100000)")
    assert(filtered.collect()(0).getLong(0) === 1000L)
    assert(graft.sinks.v2.GraftScanInspect.rowScans(filtered)
      .forall(_.limitFileCounts.isEmpty),
      "a scan under a residual filter must decline limit truncation")
    // pending MoR deletes decline (counts overstate live rows)
    VersionedKeyedTable.deleteMor(spark, dir,
      Seq(1L, 2L).toDF("k"), "k")
    val morPeek = spark.sql(
      "SELECT count(*) AS n FROM (SELECT * FROM gcat.lim LIMIT 1999)")
    assert(morPeek.collect()(0).getLong(0) === 1998L,
      "LIMIT past the live row count must see deletes applied")
    assert(graft.sinks.v2.GraftScanInspect.rowScans(morPeek)
      .forall(_.limitFileCounts.isEmpty),
      "pending MoR deletes must decline limit truncation")
  }

  test("pushed ORDER BY key LIMIT prunes files via zone maps on a " +
      "clustered table, both directions, numeric and string keys") {
    val dir = s"$base/topn"
    VersionedKeyedTable.create(
      (1L to 2000L).map(i => (i, i * 10L)).toDF("k", "v")
        .repartition(8), dir, "k", numBuckets = 2)
    VersionedKeyedTable.cluster(spark, dir, "k", targetRowsPerFile = 200L)
    val asc = spark.sql("SELECT k FROM gcat.topn ORDER BY k LIMIT 5")
    assert(asc.as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    val (aKept, aBefore) = graft.sinks.v2.GraftScanInspect.rowScan(asc)
      .limitFileCounts.getOrElse(fail("ASC top-N evidence missing"))
    assert(aKept < aBefore,
      s"ASC top-5 must prune clustered files ($aKept/$aBefore)")
    val desc = spark.sql(
      "SELECT k FROM gcat.topn ORDER BY k DESC LIMIT 4")
    assert(desc.as[Long].collect().toSeq ===
      Seq(2000L, 1999L, 1998L, 1997L))
    val (dKept, dBefore) = graft.sinks.v2.GraftScanInspect.rowScan(desc)
      .limitFileCounts.getOrElse(fail("DESC top-N evidence missing"))
    assert(dKept < dBefore,
      s"DESC top-4 must prune clustered files ($dKept/$dBefore)")
    // a sort on a NON-key column must not push (no stats contract)
    val byV = spark.sql("SELECT k, v FROM gcat.topn ORDER BY v LIMIT 3")
    assert(byV.select("k").as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    assert(graft.sinks.v2.GraftScanInspect.rowScan(byV)
      .limitFileCounts.isEmpty,
      "top-N on a non-key column must decline")
    // string keys prune in UTF-8 binary order (the envelopes' own)
    val sdir = s"$base/topns"
    VersionedKeyedTable.create(
      (1 to 500).map(i => (f"k$i%04d", i)).toDF("k", "n")
        .repartition(4), sdir, "k", numBuckets = 2)
    VersionedKeyedTable.cluster(spark, sdir, "k",
      targetRowsPerFile = 100L)
    val sAsc = spark.sql("SELECT k FROM gcat.topns ORDER BY k LIMIT 2")
    assert(sAsc.as[String].collect().toSeq === Seq("k0001", "k0002"))
    val (sKept, sBefore) = graft.sinks.v2.GraftScanInspect.rowScan(sAsc)
      .limitFileCounts.getOrElse(fail("string top-N evidence missing"))
    assert(sKept < sBefore,
      s"string-key top-N must prune ($sKept/$sBefore)")
  }

  test("maintained-view serving: grouped count/sum/min/max answered " +
      "from the registered view's files while fresh; stale, filtered " +
      "or unmatched shapes fall back to the real aggregation") {
    val dir = s"$base/mvb"
    // x is NULLABLE (no actual nulls): count(x) must then translate
    // as Count(x), not count(*) — the fallback case below is real.
    // (On a non-null column Spark itself proves count(x) == count(*)
    // and serving the view's cnt would be correct anyway.)
    VersionedKeyedTable.create(
      (1L to 1000L).map(i => (i, i % 10, i * 2)).toDF("k", "g", "x0")
        .select(col("k"), col("g"),
          when(col("k") > 0, col("x0")).as("x")),
      dir, "k", numBuckets = 2)
    spark.sql("CALL gcat.create_agg_view(tbl => 'mvb', " +
      "view => 'mvb_by_g', group_col => 'g', value_col => 'x')")
    def viewScans(df: org.apache.spark.sql.DataFrame) =
      graft.sinks.v2.GraftScanInspect.viewAggScans(df)
    val q = spark.sql("SELECT g, count(*) AS c, sum(x) AS s, " +
      "min(x) AS mn, max(x) AS mx FROM gcat.mvb GROUP BY g")
    val rows = q.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(viewScans(q).nonEmpty, "fresh view must serve")
    assert(rows(3L) === ((100L, (3L to 993L by 10L).map(_ * 2).sum,
      6L, 1986L)))
    assert(rows.size === 10)
    // select order independent of scan layout (group col not first)
    val q2 = spark.sql("SELECT max(x) AS mx, g, count(*) AS c " +
      "FROM gcat.mvb GROUP BY g")
    assert(viewScans(q2).nonEmpty)
    assert(q2.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
      .apply(0L) === 2000L)
    // unmatched shapes fall back and stay correct: count(col),
    // sum(DISTINCT), avg, a second grouping column, a filter
    val fallbacks = Seq(
      "SELECT g, count(x) AS c FROM gcat.mvb GROUP BY g",
      "SELECT g, sum(DISTINCT x) AS s FROM gcat.mvb GROUP BY g",
      "SELECT g, avg(x) AS a FROM gcat.mvb GROUP BY g",
      "SELECT g, k % 2 AS h, count(*) AS c FROM gcat.mvb GROUP BY g, k % 2",
      "SELECT g, count(*) AS c FROM gcat.mvb WHERE x > 10 GROUP BY g")
    fallbacks.foreach { sqlText =>
      val df = spark.sql(sqlText)
      df.collect()
      assert(viewScans(df).isEmpty, s"must not serve: $sqlText")
    }
    // t$views: the registration is observable, and fresh right now
    val v0 = spark.sql("SELECT * FROM gcat.`mvb$views`").collect()
    assert(v0.map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getBoolean(4))).toSeq === Seq(("mvb_by_g", "g", "x", true)))
    // staleness: ANY base commit stops serving until a refresh
    VersionedKeyedTable.upsert(spark, dir,
      Seq((2000L, 3L, 9000L)).toDF("k", "g", "x"), "k")
    assert(!spark.sql("SELECT fresh FROM gcat.`mvb$views`")
      .collect()(0).getBoolean(0), "t$views must report staleness")
    val stale = spark.sql("SELECT g, count(*) AS c, max(x) AS mx " +
      "FROM gcat.mvb GROUP BY g")
    val staleRows = stale.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viewScans(stale).isEmpty, "stale view must not serve")
    assert(staleRows(3L) === ((101L, 9000L)))
    spark.sql("CALL gcat.refresh_view(tbl => 'mvb', view => 'mvb_by_g')")
    val again = spark.sql("SELECT g, count(*) AS c, max(x) AS mx " +
      "FROM gcat.mvb GROUP BY g")
    val againRows = again.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viewScans(again).nonEmpty, "refreshed view must serve again")
    assert(againRows(3L) === ((101L, 9000L)),
      "served rows must reflect the refreshed state")
    // deregistration: the aggregate returns to the base, still exact
    spark.sql("CALL gcat.drop_agg_view(tbl => 'mvb', view => 'mvb_by_g')")
    val dropped = spark.sql("SELECT g, count(*) AS c FROM gcat.mvb " +
      "GROUP BY g")
    dropped.collect()
    assert(viewScans(dropped).isEmpty, "deregistered view must not serve")
  }

  test("limit/top-N truncation model check: random layouts, limits " +
      "and directions always return exactly the untruncated answer") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 6) {
      val dir = s"$base/tnm$trial"
      val n = 200 + rnd.nextInt(1800)
      // keys shuffled, sometimes negative, sometimes sparse
      val keys = rnd.shuffle(
        (1 to n).map(i => i.toLong * (1 + rnd.nextInt(3)) -
          (if (trial % 2 == 0) 1000 else 0)).distinct.toVector)
      VersionedKeyedTable.create(
        keys.map(k => (k, k * 3)).toDF("k", "v").repartition(5),
        dir, "k", numBuckets = 1 + rnd.nextInt(4))
      if (trial % 3 != 0) // clustered AND unclustered layouts
        VersionedKeyedTable.cluster(spark, dir, "k",
          targetRowsPerFile = 50L + rnd.nextInt(200))
      if (trial % 2 == 1) // sometimes with pending MoR deletes
        VersionedKeyedTable.deleteMor(spark, dir,
          rnd.shuffle(keys).take(20).toDF("k"), "k")
      val live = if (trial % 2 == 1) {
        val surviving = VersionedKeyedTable.read(spark, dir)
          .select("k").as[Long].collect().toSet // read() applies deletes
        keys.filter(surviving)
      } else keys
      val sorted = live.sorted
      for (_ <- 0 until 4) {
        val lim = 1 + rnd.nextInt(60)
        val asc = rnd.nextBoolean()
        val got = spark.sql(s"SELECT k FROM gcat.tnm$trial ORDER BY " +
            s"k ${if (asc) "ASC" else "DESC"} LIMIT $lim")
          .as[Long].collect().toSeq
        val want =
          if (asc) sorted.take(lim) else sorted.reverse.take(lim)
        assert(got === want, s"trial=$trial lim=$lim asc=$asc")
        val peek = spark.sql(
          s"SELECT count(*) AS c FROM (SELECT * FROM gcat.tnm$trial " +
            s"LIMIT $lim)").collect()(0).getLong(0)
        assert(peek === math.min(lim, live.size).toLong)
      }
    }
  }

  test("manifest statistics reach the planner: exact row counts and " +
      "per-column min/max/null-count with zero file reads; pending " +
      "MoR deletes withdraw them") {
    val dir = s"$base/stats"
    VersionedKeyedTable.create(
      (1L to 500L).map(i => (i, i * 2, s"s$i")).toDF("k", "v", "s")
        .repartition(4), dir, "k", numBuckets = 2)
    VersionedKeyedTable.clusterBy(spark, dir, "k", "v",
      targetRowsPerFile = 100L)
    val q = spark.sql("SELECT k, v FROM gcat.stats")
    val st = graft.sinks.v2.GraftScanInspect.rowScan(q)
      .estimateStatistics()
    assert(st.numRows().getAsLong === 500L,
      "numRows must be the manifest's exact count")
    val cs = st.columnStats()
    assert(cs.size() >= 2, s"key + clusterBy column stats expected, " +
      s"got ${cs.size()}")
    import scala.jdk.CollectionConverters._
    val byName = cs.asScala.map { case (ref, c) =>
      ref.fieldNames()(0) -> c }.toMap
    assert(byName("k").min().get() === Long.box(1L))
    assert(byName("k").max().get() === Long.box(500L))
    assert(byName("k").nullCount().getAsLong === 0L,
      "the key is non-null by the write invariant")
    assert(byName("v").min().get() === Long.box(2L))
    assert(byName("v").max().get() === Long.box(1000L))
    assert(!byName("v").nullCount().isPresent,
      "non-key null counts are unknown (envelopes skip nulls)")
    // pending MoR deletes make counts/envelopes unsound — withdrawn
    VersionedKeyedTable.deleteMor(spark, dir, Seq(1L).toDF("k"), "k")
    val q2 = spark.sql("SELECT k FROM gcat.stats")
    val st2 = graft.sinks.v2.GraftScanInspect.rowScan(q2)
      .estimateStatistics()
    assert(st2.columnStats().isEmpty,
      "pending deletes must withdraw column stats")
  }

  test("DROP COLUMN: metadata-only narrow, tombstoned name, guarded " +
      "refusals, and the implicit-widening paths honor the tombstone") {
    val dir = s"$base/drop"
    VersionedKeyedTable.create(
      (1L to 100L).map(i => (i, i * 10L, i % 5, s"t$i"))
        .toDF("k", "v", "aux", "lbl"), dir, "k", numBuckets = 2)
    // a constraint referencing the column blocks the drop
    VersionedKeyedTable.addConstraint(spark, dir, "aux_ok", "aux >= 0")
    val cErr = intercept[IllegalArgumentException] {
      VersionedKeyedTable.dropColumn(spark, dir, "aux")
    }
    assert(cErr.getMessage.contains("aux_ok"))
    assert(VersionedKeyedTable.dropConstraint(spark, dir, "aux_ok"))
    // the drop: one commit, files untouched, schema narrowed
    val before = VersionedKeyedTable.snapshot(spark, dir)
    spark.sql("ALTER TABLE gcat.drop DROP COLUMN aux")
    val after = VersionedKeyedTable.snapshot(spark, dir)
    assert(after.version === before.version + 1)
    assert(after.files === before.files, "metadata-only")
    assert(spark.sql("SELECT * FROM gcat.drop").columns.toSeq ===
      Seq("k", "v", "lbl"))
    // rows and values unaffected
    assert(spark.sql("SELECT sum(v) AS s FROM gcat.drop")
      .collect()(0).getLong(0) === (1L to 100L).map(_ * 10L).sum)
    // IF EXISTS on a missing column is a no-op; plain drop errors
    spark.sql("ALTER TABLE gcat.drop DROP COLUMN IF EXISTS ghost")
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.drop DROP COLUMN ghost")
    }
    // the tombstone holds on EVERY evolution surface, not just ALTER:
    // an implicit-widening upsert carrying the dropped name refuses
    val widen = intercept[IllegalArgumentException] {
      VersionedKeyedTable.upsert(spark, dir,
        Seq((101L, 1010L, 9L, "t101")).toDF("k", "v", "aux", "lbl"), "k")
    }
    assert(widen.getMessage.contains("previously dropped"))
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.drop ADD COLUMNS (aux BIGINT)")
    }
    // a DIFFERENT name evolves fine
    spark.sql("ALTER TABLE gcat.drop ADD COLUMNS (aux2 BIGINT)")
    assert(spark.sql("SELECT * FROM gcat.drop").columns.toSeq ===
      Seq("k", "v", "lbl", "aux2"))
    // time travel reads the pre-drop schema and values
    assert(spark.sql(s"SELECT aux FROM gcat.drop VERSION AS OF " +
        s"${before.version} WHERE k = 7").collect()(0).getLong(0) === 2L)
    // dropping a clusterBy stats column strips its carried zone maps
    VersionedKeyedTable.clusterBy(spark, dir, "k", "v",
      targetRowsPerFile = 20L)
    assert(VersionedKeyedTable.snapshot(spark, dir).extraStats
      .valuesIterator.exists(_.contains("v")))
    VersionedKeyedTable.dropColumn(spark, dir, "v")
    assert(!VersionedKeyedTable.snapshot(spark, dir).extraStats
      .valuesIterator.exists(_.contains("v")),
      "a dropped column's named stats must not survive in the manifest")
  }
}
