package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sinks.VersionedKeyedTable

/** Round 13: the versioned store's SQL surface grows up — the catalog
  * ROW scan rides Spark's own vectorized parquet reader (projection +
  * row-group pruning + columnar decode inside the kept-file set the
  * manifest pruned), and SQL `INSERT INTO` lands as one optimistic
  * upsert commit. The incremental-view family gains multi-aggregate
  * views (several value columns maintained in ONE refresh pass over
  * ONE CDF read).
  */
object StorageQueries4 {
  import QueryDef._

  private val CheckBuckets = 4

  private def scratch(prefix: String): String =
    sys.props("java.io.tmpdir") + "/graft_" + prefix + "_" +
      java.util.UUID.randomUUID().toString

  private def freshCat(s: org.apache.spark.sql.SparkSession,
      baseDir: String): String = {
    val cat = "g" + java.util.UUID.randomUUID().toString.replace("-", "")
      .take(10)
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.base", baseDir)
    cat
  }

  /** The 20 derived wide columns: c%02d = (cents*(i+1) + ck*i) mod
    * 1000003 — BIGINT arithmetic both engines compute identically. */
  private def wideColSql(i: Int): String =
    f"(cents * ${i + 1} + ck * $i) %% 1000003 AS c$i%02d"

  /** WIDE-TABLE CATALOG SCAN WITH PROJECTION PUSHDOWN: a 21-column
    * table read through the SQL catalog with a 2-column SELECT and a
    * key-range WHERE. Three physical facts are require-pinned in-row:
    * (a) the manifest zone maps pruned DATA FILES before planning
    * (kept < total), (b) the scan's read schema is EXACTLY the 2
    * referenced columns — the other 19 columns' chunks are never
    * decoded (the round-12 Group reader decoded all 21 row-at-a-time),
    * and (c) the physical scan is Spark's own ParquetScan (vectorized
    * columnar decode). At 100 TB a wide-table SELECT-few pays for the
    * columns it asks for — the whole point of a columnar store. */
  val versionedSqlWideScan = sql("versioned_sql_wide_scan",
    s"""WITH m AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents,
           o_custkey AS ck
         FROM orders),
       w AS (
         SELECT k, ${(0 until 20).map(wideColSql).mkString(",\n           ")}
         FROM m)
       SELECT count(*) AS n, CAST(sum(c03) AS BIGINT) AS s3,
         min(c17) AS mn17
       FROM w WHERE k BETWEEN 2000 AND 6000""") { (s, d) =>
    val baseDir = scratch("widescan")
    val cat = freshCat(s, baseDir)
    val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"),
      col("o_custkey").as("ck"))
    val wide = base.select(col("k") +: (0 until 20).map(i =>
      ((col("cents") * (i + 1) + col("ck") * i) % 1000003L)
        .as(f"c$i%02d")): _*)
    val n = wide.count()
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(wide.repartition(8),
        s"$baseDir/w", "k", CheckBuckets)
      VersionedKeyedTable.cluster(s, s"$baseDir/w", "k",
        targetRowsPerFile = math.max(100L, n / 32))
    }
    val q = s.sql(
      s"""SELECT count(*) AS n, CAST(sum(c03) AS BIGINT) AS s3,
            min(c17) AS mn17
          FROM $cat.w WHERE k BETWEEN 2000 AND 6000""")
    q.localCheckpoint(true) // execute NOW: prune + read schema are real
    // scoped evidence: THIS query's own scan instance, off its
    // executed plan — not process-wide state
    val scan = graft.sinks.v2.GraftScanInspect.rowScan(q)
    val (kept, total) = scan.plannedFileCounts
    require(kept < total,
      s"the key-range WHERE must prune files ($kept/$total)")
    val readCols = scan.readSchemaNames
    require(readCols.toSet == Set("k", "c03", "c17"),
      s"projection must reach the parquet scan: a 3-column query over " +
        s"a 21-column table decoded ${readCols.mkString(",")}")
    val planStr = q.queryExecution.executedPlan.toString
    require(planStr.contains("GraftRowScan"),
      "the catalog row scan must be the runtime-filterable " +
        "GraftRowScan (whose delegate is Spark's vectorized parquet " +
        "scan — pinned by the read-schema require above and the " +
        "ColumnarToRow assertion in GraftCatalogSpec)")
    q // the live plan (the audited evidence), not the checkpoint RDD
  }

  /** SQL `INSERT INTO` THROUGH THE CATALOG (GraftCatalog DML): the
    * insert lands as EXACTLY ONE optimistic upsert commit carrying
    * the `graft.sql.insert` stamp — and because the table is keyed,
    * it has PUT semantics (replace-by-key): the inserted slice's
    * colliding keys overwrite, new keys append (the oracle's
    * full-outer coalesce). Readback goes through BOTH faces — the
    * catalog SQL scan and the programmatic read — which must agree
    * row-for-row (one more way a staged file lost in the commit, or
    * a double-applied one, breaks the hash). In-row requires pin the
    * commit count (create + 1) and the stamp. */
  val versionedSqlInsert = sql("versioned_sql_insert",
    """WITH base AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey % 4 = 0),
       ins AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 300 AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey % 8 = 1 OR o_orderkey % 20 = 0),
       final AS (
         SELECT coalesce(i.k, b.k) AS k,
           coalesce(i.cents, b.cents) AS cents
         FROM base b FULL OUTER JOIN ins i ON b.k = i.k)
       SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
         min(k) AS mn, max(k) AS mx
       FROM final""") { (s, d) =>
    val baseDir = scratch("sqlins")
    val cat = freshCat(s, baseDir)
    val money = (col("o_totalprice").cast("decimal(12,2)") * 100)
      .cast("long")
    val base = Tables.orders(s, d).filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey").as("k"), money.as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(base.repartition(4),
        s"$baseDir/t", "k", CheckBuckets)
    }
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 8 === 1 || col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey").as("k"), (money * 3).as("cents"))
      .createOrReplaceTempView("graft_sql_ins_src")
    s.sql(s"INSERT INTO $cat.t SELECT k, cents FROM graft_sql_ins_src")
    val versions = VersionedKeyedTable.completeVersions(s, s"$baseDir/t")
    require(versions.size == 2,
      s"one INSERT must be exactly one commit (got ${versions.size})")
    val snap = VersionedKeyedTable.snapshot(s, s"$baseDir/t")
    require(snap.meta.contains("graft.sql.insert"),
      "the insert commit must carry its graft.sql.insert stamp")
    val viaSql = s.sql(
      s"""SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
            min(k) AS mn, max(k) AS mx
          FROM $cat.t""").head()
    val viaApi = VersionedKeyedTable.read(s, s"$baseDir/t")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
        min(col("k")).as("mn"), max(col("k")).as("mx"))
    require(viaApi.head() == viaSql,
      "the catalog scan and the programmatic read must agree")
    viaApi
  }

  /** MULTI-AGGREGATE IVM (r12 verdict ask #7): ONE view maintains a
    * shared count plus per-column (sum, min, max) for TWO value
    * columns, refreshed in ONE pass per span over ONE CDF read — the
    * same 4-commit extremum-deleting history as `ivm_refresh_minmax`,
    * but the delete (cents-ranged) breaks envelopes on BOTH columns
    * simultaneously (a deleted row may carry its group's cents max
    * AND weight min), so the bounded re-derive must recover BOTH
    * columns' runner-ups for exactly the affected groups. The oracle
    * recomputes the final multi-aggregate state relationally. */
  val ivmRefreshMulti = sql("ivm_refresh_multi",
    """WITH m AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             * CASE WHEN o_orderkey % 10 = 1 THEN 2 ELSE 1 END AS cents,
           (o_orderkey * 7 + o_custkey) % 100000 AS weight
         FROM orders),
       f AS (SELECT * FROM m WHERE cents <= 25000000)
       SELECT g, count(*) AS cnt,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         min(cents) AS mn_cents, max(cents) AS mx_cents,
         CAST(sum(weight) AS BIGINT) AS total_weight,
         min(weight) AS mn_weight, max(weight) AS mx_weight
       FROM f GROUP BY g""") { (s, d) =>
    import graft.sinks.IncrementalView
    val baseDir = scratch("ivmmulti_base")
    val viewDir = scratch("ivmmulti_view")
    val rows = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_custkey").as("g"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"),
      ((col("o_orderkey") * 7 + col("o_custkey")) % 100000L)
        .as("weight"))
    // v1: the on-time slice; the multi view created off it
    val watermark = graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.filter(col("k") % 3 =!= 2),
        baseDir, "k", CheckBuckets)
      IncrementalView.createFromFullMulti(
        s, baseDir, viewDir, "g", Seq("cents", "weight"),
        numBuckets = CheckBuckets)
    }
    // v2: the late slice (extension tier on both columns)
    VersionedKeyedTable.upsert(s, baseDir,
      rows.filter(col("k") % 3 === 2), "k")
    IncrementalView.refreshToLatestFullMulti(
      s, baseDir, viewDir, "k", "g", Seq("cents", "weight"), watermark)
    // v3: the correction doubles cents of %10=1 rows (weight keeps) —
    // updates whose OLD cents may have been a group extremum
    VersionedKeyedTable.upsert(s, baseDir,
      rows.filter(col("k") % 10 === 1)
        .withColumn("cents", col("cents") * 2), "k")
    // v4: delete every row above $250k — both columns' extrema break
    VersionedKeyedTable.delete(s, baseDir,
      VersionedKeyedTable.read(s, baseDir)
        .filter(col("cents") > 25000000L).select(col("k")), "k")
    IncrementalView.refreshFromCommittedFullMulti(
      s, baseDir, viewDir, "k", "g", Seq("cents", "weight"))
    VersionedKeyedTable.read(s, viewDir)
      .select(col("g"), col("cnt"),
        col("total_cents"), col("mn_cents"), col("mx_cents"),
        col("total_weight"), col("mn_weight"), col("mx_weight"))
  }

  /** SQL `DELETE FROM` THROUGH THE CATALOG: the doomed keys resolve
    * through the zone-map-pruned scan (a key-ranged DELETE on the
    * clustered layout plans only covering files — require-pinned) and
    * die in ONE CDF-captured delete commit. The oracle recomputes the
    * surviving state relationally; a half-applied delete, a key that
    * escaped the range, or a collateral kill breaks the hash. */
  val versionedSqlDelete = sql("versioned_sql_delete",
    """WITH m AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders),
       kept AS (
         SELECT * FROM m
         WHERE NOT (k BETWEEN 150 AND 900 AND cents > 10000000))
       SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
         min(k) AS mn, max(k) AS mx
       FROM kept""") { (s, d) =>
    val baseDir = scratch("sqldel")
    val cat = freshCat(s, baseDir)
    val rows = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_custkey").as("g"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"))
    val n = rows.count()
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.repartition(8),
        s"$baseDir/t", "k", CheckBuckets)
      VersionedKeyedTable.cluster(s, s"$baseDir/t", "k",
        targetRowsPerFile = math.max(100L, n / 32))
    }
    // the physical pin BEFORE the mutation: the snapshot the DELETE's
    // doomed-key scan reads prunes its key range through the clustered
    // zone maps (the delete rewrite then replaces touched buckets)
    val (keptR, totalR) = VersionedKeyedTable.rangeFiles(
      s, s"$baseDir/t", "k", 150L, 900L)
    require(keptR.size < totalR,
      s"the DELETE's key range must prune clustered files " +
        s"(${keptR.size}/$totalR)")
    // cluster may no-op at tiny SFs (already-clustered layout commits
    // nothing) — pin the DELETE itself as exactly ONE commit
    val nvBefore =
      VersionedKeyedTable.completeVersions(s, s"$baseDir/t").size
    s.sql(s"""DELETE FROM $cat.t
              WHERE k BETWEEN 150 AND 900 AND cents > 10000000""")
    val nvAfter =
      VersionedKeyedTable.completeVersions(s, s"$baseDir/t").size
    require(nvAfter == nvBefore + 1,
      s"one DELETE must be exactly one commit ($nvBefore -> $nvAfter)")
    s.sql(s"""SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
              FROM $cat.t""")
  }

  /** SQL `MERGE INTO` THROUGH THE CATALOG — the copy-on-write
    * row-level path: matched rows update, matched negatives delete,
    * unmatched source rows insert, in ONE replace commit pinned to
    * the snapshot the rewrite read (a racer would fail the statement,
    * never silently lose writes). The oracle recomputes the merged
    * state relationally with the same three clauses. */
  val versionedSqlMerge = sql("versioned_sql_merge",
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey % 3 <> 2),
       src AS (
         SELECT o_orderkey AS mk,
           CASE WHEN o_orderkey % 5 = 0 THEN -1
                ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 200
                  AS BIGINT) END AS mv,
           o_custkey AS mg
         FROM orders WHERE o_orderkey % 2 = 0),
       merged AS (
         SELECT b.k, b.g,
           CASE WHEN s.mk IS NOT NULL AND s.mv >= 0 THEN s.mv
                ELSE b.cents END AS cents
         FROM base b LEFT JOIN src s ON b.k = s.mk
         WHERE s.mk IS NULL OR s.mv >= 0
         UNION ALL
         SELECT s.mk AS k, s.mg AS g, s.mv AS cents
         FROM src s LEFT JOIN base b ON b.k = s.mk
         WHERE b.k IS NULL AND s.mv >= 0)
       SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
         min(k) AS mn, max(k) AS mx
       FROM merged""") { (s, d) =>
    val baseDir = scratch("sqlmerge")
    val cat = freshCat(s, baseDir)
    val money = (col("o_totalprice").cast("decimal(12,2)") * 100)
      .cast("long")
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(
        Tables.orders(s, d).filter(col("o_orderkey") % 3 =!= 2)
          .select(col("o_orderkey").as("k"), col("o_custkey").as("g"),
            money.as("cents")).repartition(4),
        s"$baseDir/t", "k", CheckBuckets)
    }
    Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("mk"),
        when(col("o_orderkey") % 5 === 0, lit(-1L))
          .otherwise((money * 2)).as("mv"),
        col("o_custkey").as("mg"))
      .createOrReplaceTempView("graft_sql_merge_src")
    val v0 = VersionedKeyedTable.completeVersions(s, s"$baseDir/t").size
    s.sql(
      s"""MERGE INTO $cat.t t USING graft_sql_merge_src s ON t.k = s.mk
          WHEN MATCHED AND s.mv < 0 THEN DELETE
          WHEN MATCHED THEN UPDATE SET cents = s.mv
          WHEN NOT MATCHED AND s.mv >= 0 THEN
            INSERT (k, g, cents) VALUES (s.mk, s.mg, s.mv)""")
    require(VersionedKeyedTable.completeVersions(s, s"$baseDir/t").size
      == v0 + 1, "one MERGE must be exactly one commit")
    val snap = VersionedKeyedTable.snapshot(s, s"$baseDir/t")
    require(snap.meta.contains("graft.sql.merge"),
      "the merge commit must carry its stamp")
    s.sql(s"""SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
              FROM $cat.t""")
  }

  /** SQL `INSERT OVERWRITE` THROUGH THE CATALOG: the whole table
    * replaced in ONE atomic commit (the nightly batch-refresh shape),
    * CDF-captured as the NET keyed diff so downstream views/streams
    * consume the overwrite like any other commit — the in-row require
    * pins one commit and a CDF whose inserts/updates/deletes
    * reconcile exactly with the old and new row counts. */
  val versionedSqlOverwrite = sql("versioned_sql_overwrite",
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders),
       replaced AS (
         SELECT k, g, cents * 3 AS cents FROM base WHERE k % 2 = 0)
       SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
         min(k) AS mn, max(k) AS mx
       FROM replaced""") { (s, d) =>
    val baseDir = scratch("sqlover")
    val cat = freshCat(s, baseDir)
    val money = (col("o_totalprice").cast("decimal(12,2)") * 100)
      .cast("long")
    val rows = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_custkey").as("g"), money.as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.repartition(4),
        s"$baseDir/t", "k", CheckBuckets)
    }
    val nOld = rows.count()
    s.sql(s"""INSERT OVERWRITE $cat.t
              SELECT k, g, cents * 3 AS cents FROM $cat.t
              WHERE k % 2 = 0""")
    val versions = VersionedKeyedTable.completeVersions(s, s"$baseDir/t")
    require(versions.size == 2,
      s"one INSERT OVERWRITE must be exactly one commit " +
        s"(got ${versions.size})")
    // the CDF reconciles: every even key updates (×3), every odd
    // key deletes — net diff, not a blind remove-all/add-all
    val cdf = VersionedKeyedTable
      .changesBetween(s, s"$baseDir/t", "k", 1L, versions.max)
      .groupBy(col("change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nNew = VersionedKeyedTable.read(s, s"$baseDir/t").count()
    require(cdf.getOrElse("delete", 0L) == nOld - nNew &&
        cdf.getOrElse("update", 0L) == nNew &&
        cdf.getOrElse("insert", 0L) == 0L,
      s"the overwrite CDF must be the net keyed diff (got $cdf for " +
        s"$nOld -> $nNew rows)")
    s.sql(s"""SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
                min(k) AS mn, max(k) AS mx
              FROM $cat.t""")
  }

  val all: Seq[QueryDef] = Seq(versionedSqlWideScan, versionedSqlInsert,
    ivmRefreshMulti, versionedSqlDelete, versionedSqlMerge,
    versionedSqlOverwrite)
}
