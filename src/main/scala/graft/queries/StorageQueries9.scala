package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sinks.VersionedKeyedTable

/** Round 14 (continued): pushed LIMIT / ORDER-BY-KEY TOP-N become
  * FILE-PLANNING inputs on the catalog scan — the "peek at a 100 TB
  * table" queries (`SELECT * … LIMIT n`, `ORDER BY key LIMIT n`) plan
  * a handful of files instead of the fleet-wide scan. Reference
  * analogue: the reference's readers expose bounded slices of an
  * input (input_readers.py's shard boundaries) precisely so a
  * consumer can stop early; here early-stop is planned from manifest
  * row counts and zone maps before any byte is read.
  */
object StorageQueries9 {
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

  private def cents = (col("o_totalprice").cast("decimal(12,2)") * 100)
    .cast("long")

  /** PUSHED `LIMIT n` AS FILE-PREFIX PLANNING (GraftScanBuilder
    * pushLimit): a bare `SELECT * FROM t LIMIT 5` plans the shortest
    * manifest-ordered file prefix whose EXACT per-file row counts
    * cover 5 rows — the in-row require pins "planned files == 1 out
    * of 8" off the executed scan instance, and `isPartiallyPushed`
    * keeps Spark's own row-level limit on top, so truncation is pure
    * I/O avoidance. A filtered variant on the same table must DECLINE
    * truncation (the filter stays residual, so a file prefix could
    * starve it) — pinned by its evidence being absent while the
    * filtered count still matches. At 100 TB: a peek query reads one
    * file, not the table. */
  val versionedLimitPushdown = sql("versioned_limit_pushdown",
    """SELECT CAST(LEAST(5, count(*)) AS BIGINT) AS n_limited,
         count(*) AS n_total,
         count(CASE WHEN o_orderkey % 3 = 0 THEN 1 END) AS n_filtered
       FROM orders""") { (s, d) =>
    val baseDir = scratch("limpush")
    val cat = freshCat(s, baseDir)
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), cents.as("cents"))
    graft.BenchProbe.time("index_build") {
      rows.createOrReplaceTempView("graft_limpush_src")
      s.sql(s"""CREATE TABLE $cat.t (k BIGINT, cents BIGINT)
        TBLPROPERTIES ('key'='k', 'buckets'='$CheckBuckets')""")
      // two commits -> two files per bucket = 8 data files
      s.sql(s"INSERT INTO $cat.t SELECT k, cents " +
        "FROM graft_limpush_src WHERE k % 2 = 0")
      s.sql(s"INSERT INTO $cat.t SELECT k, cents " +
        "FROM graft_limpush_src WHERE k % 2 = 1")
    }
    val peek = s.sql(
      s"SELECT count(*) AS n FROM (SELECT * FROM $cat.t LIMIT 5)")
    peek.localCheckpoint(true) // execute: evidence is plan+run state
    val scan = graft.sinks.v2.GraftScanInspect.rowScan(peek)
    scan.limitFileCounts match {
      case Some((planned, before)) =>
        require(planned == 1 && before > 1,
          s"LIMIT 5 must plan a one-file prefix ($planned/$before)")
      case None => throw new IllegalStateException(
        "pushed LIMIT must reach the scan's file planning")
    }
    // a residual filter blocks limit truncation — never starve it
    val filtered = s.sql(s"SELECT count(*) AS n FROM (SELECT * FROM " +
      s"$cat.t WHERE k % 3 = 0 LIMIT 1000000)")
    filtered.localCheckpoint(true)
    val fScans = graft.sinks.v2.GraftScanInspect.rowScans(filtered)
    require(fScans.forall(_.limitFileCounts.isEmpty),
      "a scan under a residual filter must decline limit truncation")
    val nLim = peek.collect()(0).getLong(0)
    s.sql(
      s"""SELECT CAST($nLim AS BIGINT) AS n_limited,
            (SELECT count(*) FROM $cat.t) AS n_total,
            (SELECT count(*) FROM $cat.t WHERE k % 3 = 0) AS n_filtered
          FROM (SELECT 1) AS one""")
  }

  /** PUSHED `ORDER BY key LIMIT n` AS ZONE-MAP TOP-N PRUNING
    * (GraftScanBuilder pushTopN): on a cluster()ed table — each file
    * a narrow disjoint key interval — the n-th smallest key is
    * bounded by folding per-file (count, max) envelopes, and every
    * file whose interval lies wholly beyond the bound is skipped
    * before planning. The require pins planned < kept/2 for ASC and
    * the mirrored DESC, plus DESC's first row being the table max
    * (served metadata-only). Spark still sorts: the pushdown is
    * partial by contract, so a wrong bound could only cost I/O —
    * but the oracle would catch a dropped row anyway. At 100 TB:
    * "latest 10 by key" reads the few files covering the extreme
    * interval. */
  val versionedTopnPushdown = sql("versioned_topn_pushdown",
    """SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           AS cents
       FROM orders ORDER BY k LIMIT 10""") { (s, d) =>
    val baseDir = scratch("topnpush")
    val cat = freshCat(s, baseDir)
    val dir = s"$baseDir/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), cents.as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.repartition(8), dir, "k",
        CheckBuckets)
      // ~8 files per bucket, each covering a narrow key interval
      s.sql(s"CALL $cat.cluster(tbl => 't', target_rows_per_file => " +
        s"${math.max(16L, rows.count() / (CheckBuckets * 8))})")
    }
    val asc = s.sql(s"SELECT k, cents FROM $cat.t ORDER BY k LIMIT 10")
    asc.localCheckpoint(true)
    val (aKept, aBefore) = graft.sinks.v2.GraftScanInspect.rowScan(asc)
      .limitFileCounts.getOrElse(throw new IllegalStateException(
        "pushed top-N must reach the scan's file planning"))
    require(aKept * 2 < aBefore,
      s"ASC top-10 must prune most files via zone maps ($aKept/$aBefore)")
    val desc = s.sql(
      s"SELECT k, cents FROM $cat.t ORDER BY k DESC LIMIT 7")
    val descRows = desc.collect()
    val (dKept, dBefore) = graft.sinks.v2.GraftScanInspect.rowScan(desc)
      .limitFileCounts.getOrElse(throw new IllegalStateException(
        "pushed DESC top-N must reach the scan's file planning"))
    require(dKept * 2 < dBefore,
      s"DESC top-7 must prune most files ($dKept/$dBefore)")
    // DESC's head is the table max — served by the metadata-only
    // aggregate path, so the two pushdowns cross-check each other
    val mx = s.sql(s"SELECT max(k) AS mx FROM $cat.t")
    require(graft.sinks.v2.GraftScanInspect.aggScans(mx).nonEmpty,
      "max(k) must ride the metadata-only aggregate scan")
    require(descRows.length == 7 &&
      descRows.head.getLong(0) == mx.collect()(0).getLong(0),
      "DESC top-N head must equal the metadata max")
    s.sql(s"SELECT k, cents FROM $cat.t ORDER BY k LIMIT 10")
  }

  /** SQL `ALTER TABLE … DROP COLUMN` (GraftCatalog.alterTable →
    * VersionedKeyedTable.dropColumn): ONE metadata-only commit
    * narrows the per-version schema — the in-row requires pin the
    * physical contract (exactly one commit, data file set IDENTICAL
    * to the parent), the tombstone contract (re-ADDING the dropped
    * name is refused — by-name parquet resolution would resurrect
    * stale values out of pre-drop files), the key column staying
    * undroppable, and time travel still reading the column at the
    * pre-drop version. Post-drop INSERTs analyze against the narrowed
    * schema. Oracle: the final two-column state over both eras. At
    * 100 TB: dropping a column costs one manifest write; the bytes
    * fall out at the next natural rewrite. */
  val versionedSqlDropCol = sql("versioned_sql_drop_col",
    """SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           AS cents
       FROM orders""") { (s, d) =>
    val baseDir = scratch("dropcol")
    val cat = freshCat(s, baseDir)
    val dir = s"$baseDir/t"
    Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), cents.as("cents"),
        (col("o_orderkey") % 7).as("tag"))
      .createOrReplaceTempView("graft_dropcol_src")
    graft.BenchProbe.time("index_build") {
      s.sql(s"""CREATE TABLE $cat.t (k BIGINT, cents BIGINT,
        tag BIGINT) TBLPROPERTIES ('key'='k',
        'buckets'='$CheckBuckets')""")
      s.sql(s"INSERT INTO $cat.t SELECT k, cents, tag " +
        "FROM graft_dropcol_src WHERE k % 2 = 0")
    }
    val before = VersionedKeyedTable.snapshot(s, dir)
    s.sql(s"ALTER TABLE $cat.t DROP COLUMN tag")
    val after = VersionedKeyedTable.snapshot(s, dir)
    require(after.version == before.version + 1,
      "DROP COLUMN must be exactly one commit")
    require(after.files == before.files,
      "DROP COLUMN must be metadata-only: no data file moved, " +
        "added, or rewritten")
    require(s.sql(s"SELECT * FROM $cat.t").columns.toSeq ==
        Seq("k", "cents"),
      "the live schema must narrow immediately")
    // time travel keeps each version's own schema
    require(s.sql(s"SELECT * FROM $cat.t VERSION AS OF " +
          s"${before.version}").columns.toSeq ==
        Seq("k", "cents", "tag"),
      "the pre-drop version must still read the column")
    // the tombstone: re-adding the name must refuse (pre-drop files
    // still carry the bytes — by-name reads would resurrect them)
    val readdRefused =
      try { s.sql(s"ALTER TABLE $cat.t ADD COLUMNS (tag BIGINT)"); false }
      catch { case _: Exception => true }
    require(readdRefused,
      "re-adding a dropped column name must refuse (tombstone)")
    // the key column is the layout — never droppable
    val keyRefused =
      try { s.sql(s"ALTER TABLE $cat.t DROP COLUMN k"); false }
      catch { case _: Exception => true }
    require(keyRefused, "dropping the key column must refuse")
    // post-drop INSERT analyzes against the narrowed schema
    s.sql(s"INSERT INTO $cat.t SELECT k, cents " +
      "FROM graft_dropcol_src WHERE k % 2 = 1")
    s.sql(s"SELECT k, cents FROM $cat.t")
  }

  /** MAINTAINED-VIEW SERVING (`CALL cat.create_agg_view` +
    * GraftViewAggScan): a grouped count/sum/min/max over the base
    * table is answered COMPLETE from the registered incremental
    * view's files — O(groups) instead of O(table) — seated in DSv2's
    * own aggregate-pushdown contract, and ONLY while the view's
    * durable watermark equals the scan's snapshot version. The row
    * walks the whole lifecycle: served (pinned via the scan type) →
    * base mutates → the SAME query silently falls back to the real
    * aggregation (results include the new rows — staleness can never
    * leak) → `CALL refresh_view` advances the view from the CDF →
    * served again. A filtered variant is never served. Oracle: the
    * final grouped state over both eras. At 100 TB this is the
    * dashboard story: the rollup query reads the view's few files,
    * freshness anchored to the snapshot the plan already promised. */
  val ivmServeAgg = sql("ivm_serve_agg",
    """WITH m AS (
         SELECT o_orderkey AS k, o_custkey % 41 AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders
         UNION ALL
         SELECT o_orderkey + 10000000 AS k, 977 AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey % 100 = 7)
       SELECT g, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS total,
         min(cents) AS mn, max(cents) AS mx
       FROM m GROUP BY g""") { (s, d) =>
    val baseDir = scratch("ivmserve")
    val cat = freshCat(s, baseDir)
    val rows = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      (col("o_custkey") % 41).as("g"), cents.as("cents"))
    rows.createOrReplaceTempView("graft_ivmserve_src")
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.repartition(8), s"$baseDir/t",
        "k", CheckBuckets)
      s.sql(s"CALL $cat.create_agg_view(tbl => 't', view => 't_by_g', " +
        "group_col => 'g', value_col => 'cents')")
    }
    val q = s"""SELECT g, count(*) AS cnt,
        sum(cents) AS total, min(cents) AS mn, max(cents) AS mx
      FROM $cat.t GROUP BY g"""
    val served = s.sql(q)
    served.localCheckpoint(true)
    val vScans = graft.sinks.v2.GraftScanInspect.viewAggScans(served)
    require(vScans.nonEmpty,
      "a fresh registered view must serve the grouped aggregate")
    require(vScans.head.servedBaseVersion ==
        VersionedKeyedTable.snapshot(s, s"$baseDir/t").version,
      "the serve must anchor to the base snapshot version")
    // base mutates -> the same query MUST fall back (and see the rows)
    s.sql(s"INSERT INTO $cat.t SELECT k + 10000000 AS k, " +
      "CAST(977 AS BIGINT) AS g, cents " +
      "FROM graft_ivmserve_src WHERE k % 100 = 7")
    val stale = s.sql(q)
    stale.localCheckpoint(true)
    require(graft.sinks.v2.GraftScanInspect.viewAggScans(stale).isEmpty,
      "a stale view must never serve — fall back to the base scan")
    require(stale.where(col("g") === 977).count() == 1L,
      "the fallback must see the fresh rows")
    // refresh from the CDF -> served again, one new group included
    s.sql(s"CALL $cat.refresh_view(tbl => 't', view => 't_by_g')")
    val again = s.sql(q)
    again.localCheckpoint(true)
    require(graft.sinks.v2.GraftScanInspect.viewAggScans(again).nonEmpty,
      "a refreshed view must serve again")
    // a filter blocks serving (the residual could starve the view)
    val filtered = s.sql(s"SELECT g, count(*) AS cnt FROM $cat.t " +
      "WHERE cents > 0 GROUP BY g")
    filtered.localCheckpoint(true)
    require(graft.sinks.v2.GraftScanInspect.viewAggScans(filtered)
        .isEmpty, "a filtered aggregate must never serve from the view")
    again
  }

  val all: Seq[QueryDef] = Seq(
    versionedLimitPushdown, versionedTopnPushdown, versionedSqlDropCol,
    ivmServeAgg)
}
