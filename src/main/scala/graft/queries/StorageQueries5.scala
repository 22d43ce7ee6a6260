package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sinks.VersionedKeyedTable

/** Round 13 (continued): the catalog becomes a full planning citizen —
  * RUNTIME file pruning from join keys (the dynamic-partition-pruning
  * analogue for the manifest's zone maps and blooms) and SQL DDL
  * (CREATE TABLE / CTAS / DROP TABLE), so a star join against the
  * store reads only the fact files the dim side's keys can live in,
  * and a table's whole lifecycle is expressible from SQL.
  */
object StorageQueries5 {
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

  /** RUNTIME FILE PRUNING (DSv2 SupportsRuntimeFiltering — the
    * Iceberg/Delta dynamic-partition-pruning shape): the store table
    * is the FACT side of a broadcast equi join whose dim side is
    * filtered on a NON-key column (one customer's orders) — the
    * star-join case no static mechanism covers, because a dim
    * predicate on the join key itself would be copied onto the fact
    * statically by InferFiltersFromConstraints and pruned at plan
    * time. Here the surviving dim KEYS only exist at execution time:
    * Spark's PartitionPruning rule injects a dynamic subquery on the
    * join key, the broadcast dim's key set arrives at the scan as an
    * `In` filter, and the scan re-prunes its manifest file set through
    * the zone maps and bloom sidecars BEFORE reading anything. In-row
    * requires pin that the runtime filter FIRED and DROPPED files —
    * the physical fact the 100 TB star join stands on: `fact JOIN dim
    * WHERE dim.x = …` reads only the fact files that can hold the
    * surviving dim keys. */
  val versionedRuntimeFilter = sql("versioned_runtime_filter",
    """WITH f AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders),
       d AS (
         SELECT o_orderkey AS k FROM orders
         WHERE o_custkey = (SELECT min(o_custkey) FROM orders)),
       j AS (SELECT f.cents FROM f JOIN d ON f.k = d.k)
     SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s FROM j""") {
      (s, d) =>
    val baseDir = scratch("rtfilter")
    val cat = freshCat(s, baseDir)
    val fact = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"))
    val n = fact.count()
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(fact.repartition(8),
        s"$baseDir/f", "k", CheckBuckets)
      // key-clustered: each data file covers a narrow disjoint range,
      // so a bounded key set can exclude most files
      VersionedKeyedTable.cluster(s, s"$baseDir/f", "k",
        targetRowsPerFile = math.max(50L, n / 64))
    }
    // ONE customer's orders: a handful of key values scattered across
    // the key space, selected by a predicate the fact side can never
    // see statically (o_custkey is not a fact column)
    val minCk = Tables.orders(s, d)
      .agg(min(col("o_custkey")).cast("long")).head().getLong(0)
    val dim = Tables.orders(s, d)
      .where(col("o_custkey").cast("long") === minCk)
      .select(col("o_orderkey").as("k"))
    val q = s.table(s"$cat.f").join(broadcast(dim), "k")
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).cast("long").as("s"))
    q.localCheckpoint(true) // execute NOW: the runtime filter is real
    // scoped evidence: THIS join's own fact scan, off its executed plan
    val scan = graft.sinks.v2.GraftScanInspect.rowScan(q)
    require(scan.runtimeFilterFired,
      "the dynamic subquery must reach the scan (runtime filter fired)")
    val (rtKept, atPlan) = scan.runtimeFileCounts
    require(atPlan > 0 && rtKept < atPlan,
      s"the dim keys must prune fact files at runtime " +
        s"($rtKept/$atPlan kept)")
    q // the live plan (the audited evidence), not the checkpoint RDD
  }

  /** SQL DDL LIFECYCLE: CTAS creates a versioned table (layout from
    * TBLPROPERTIES — the key column and bucket count are the store's
    * create-time contract), INSERT INTO lands one more upsert commit,
    * the readback aggregates through the catalog scan, and DROP TABLE
    * removes the store (pinned by a require on the directory). A
    * reference user's `CREATE TABLE … AS SELECT` + load + teardown
    * story, expressible entirely from SQL. */
  val versionedSqlDdl = sql("versioned_sql_ddl",
    """WITH base AS (
         SELECT l_orderkey AS k,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
             AS BIGINT)) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS lines
         FROM lineitem GROUP BY l_orderkey),
       upserted AS (
         SELECT k, cents + 7 AS cents, lines FROM base
         WHERE k % 100 = 1
         UNION ALL
         SELECT k, cents, lines FROM base WHERE k % 100 <> 1)
     SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s,
       CAST(sum(lines) AS BIGINT) AS l, min(k) AS mn, max(k) AS mx
     FROM upserted""") { (s, d) =>
    val baseDir = scratch("sqlddl")
    val cat = freshCat(s, baseDir)
    Tables.lineitem(s, d).createOrReplaceTempView("graft_ddl_lineitem")
    graft.BenchProbe.time("index_build") {
      s.sql(s"""CREATE TABLE $cat.agg
          TBLPROPERTIES ('key'='k', 'buckets'='$CheckBuckets') AS
        SELECT l_orderkey AS k,
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
            AS BIGINT)) AS BIGINT) AS cents,
          CAST(count(*) AS BIGINT) AS lines
        FROM graft_ddl_lineitem GROUP BY l_orderkey""")
    }
    // layout honoured: a keyed commit history exists under the dir
    require(VersionedKeyedTable.completeVersions(s, s"$baseDir/agg")
      .nonEmpty, "CTAS must land as versioned-store commits")
    // one more commit through SQL: bump a slice of rows (put-by-key).
    // The slice is MATERIALIZED before the write so the insert never
    // reads the table it is mutating mid-commit.
    s.table(s"$cat.agg").where(col("k") % 100 === 1)
      .select(col("k"), (col("cents") + 7).as("cents"), col("lines"))
      .localCheckpoint(true)
      .createOrReplaceTempView("graft_ddl_bump")
    s.sql(s"INSERT INTO $cat.agg SELECT * FROM graft_ddl_bump")
    val q = s.sql(s"""SELECT count(*) AS n,
        CAST(sum(cents) AS BIGINT) AS s,
        CAST(sum(lines) AS BIGINT) AS l, min(k) AS mn, max(k) AS mx
      FROM $cat.agg""").localCheckpoint(true)
    // teardown from SQL; the directory must actually be gone
    s.sql(s"DROP TABLE $cat.agg")
    require(!new java.io.File(s"$baseDir/agg").exists(),
      "DROP TABLE must remove the store directory")
    q
  }

  /** ShuffleExchange count across an EXECUTED adaptive plan,
    * descending into the query stages AQE hides exchanges in. */
  private def shuffleCount(
      p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    p match {
      case a: AdaptiveSparkPlanExec => shuffleCount(a.executedPlan)
      case q: QueryStageExec => shuffleCount(q.plan)
      case s: ShuffleExchangeLike => 1 + s.children.map(shuffleCount).sum
      case other => other.children.map(shuffleCount).sum
    }
  }

  /** STORAGE-PARTITIONED JOIN (DSv2 SupportsReportPartitioning +
    * KeyGroupedPartitioning + the catalog-served `bucket` function —
    * Spark's v2 evolution of bucketed joins, the Iceberg SPJ shape):
    * two store tables bucketed by the SAME key count cluster
    * identically — `pmod(xxhash64(key), n)` — so their key equi join
    * moves NOTHING (in-row require: exactly ONE shuffle in the whole
    * plan, the final scalar fold), and a groupBy(key) aggregation
    * needs no exchange before the aggregate either. At 100 TB this is
    * the fact-fact story: the day's events joined to the entity table
    * on the shared key layout reads both sides in place — the shuffle
    * that dominates every co-located join pipeline simply isn't in
    * the plan. Opt-in through Spark's own
    * spark.sql.sources.v2.bucketing.enabled (set and RESTORED here);
    * plain scans keep split-level parallelism. */
  val versionedSpj = sql("versioned_spj",
    """WITH t1 AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders),
       t2 AS (
         SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS lines
         FROM lineitem GROUP BY l_orderkey),
       j AS (SELECT t1.cents * t2.lines AS x
             FROM t1 JOIN t2 ON t1.k = t2.k),
       g AS (SELECT k, CAST(sum(cents) AS BIGINT) AS sc
             FROM t1 GROUP BY k)
     SELECT (SELECT count(*) FROM j) AS n,
       (SELECT CAST(sum(x) AS BIGINT) FROM j) AS s,
       (SELECT max(sc) FROM g) AS mx""") { (s, d) =>
    import s.implicits._
    val baseDir = scratch("spj")
    val cat = freshCat(s, baseDir)
    val t1 = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"))
    val t2 = Tables.lineitem(s, d).groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("lines"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(t1.repartition(8), s"$baseDir/t1",
        "k", CheckBuckets)
      VersionedKeyedTable.create(t2.repartition(8), s"$baseDir/t2",
        "k", CheckBuckets)
    }
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> s.conf.getOption(k))
    s.conf.set(keys(0), "true")
    s.conf.set(keys(1), "true")
    s.conf.set(keys(2), "-1") // a broadcast join would hide the proof
    val (jRow, gRow) =
      try {
        val jAgg = s.table(s"$cat.t1").join(s.table(s"$cat.t2"), "k")
          .agg(count(lit(1)).as("n"),
            sum(col("cents") * col("lines")).cast("long").as("s"))
        val jr = jAgg.collect()(0) // finalizes THIS dataset's AQE plan
        require(
          shuffleCount(jAgg.queryExecution.executedPlan) == 1,
          "the co-bucketed key join must move nothing — one shuffle " +
            "total (the final scalar fold):\n" +
            jAgg.queryExecution.executedPlan.toString.take(1500))
        val gAgg = s.table(s"$cat.t1").groupBy(col("k"))
          .agg(sum(col("cents")).as("sc"))
          .agg(max(col("sc")).as("mx"))
        val gr = gAgg.collect()(0)
        require(
          shuffleCount(gAgg.queryExecution.executedPlan) == 1,
          "groupBy(key) over the bucket layout must aggregate in " +
            "place — one shuffle total (the final scalar fold):\n" +
            gAgg.queryExecution.executedPlan.toString.take(1500))
        (jr, gr)
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    Seq((jRow.getLong(0), jRow.getLong(1), gRow.getLong(0)))
      .toDF("n", "s", "mx")
  }

  /** SQL MAINTENANCE PROCEDURES (DSv2 ProcedureCatalog — Spark 4's
    * `CALL`, the statement Iceberg pioneered for table services): the
    * full OPTIMIZE lifecycle from SQL — `CALL cat.compact` merges a
    * fragmented commit history to one file per bucket, `CALL
    * cat.cluster` rewrites each bucket key-sorted so zone maps turn
    * selective, `CALL cat.vacuum` reclaims unreferenced versions
    * without committing. Each call returns its evidence row
    * (version/file counts before and after), pinned by in-row
    * requires; the oracle then verifies the maintained table still
    * answers a key-range aggregate exactly — layout changed,
    * logical content untouched, and the range scan now PRUNES
    * (kept < total required). With DDL + DML already SQL-reachable,
    * a SQL-only operator can run the store's whole lifecycle. */
  val versionedSqlMaintenance = sql("versioned_sql_maintenance",
    """WITH t AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders),
       f AS (SELECT * FROM t WHERE k BETWEEN 1000 AND 5000)
     SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s,
       min(k) AS mn, max(k) AS mx
     FROM f""") { (s, d) =>
    val baseDir = scratch("sqlmaint")
    val cat = freshCat(s, baseDir)
    val rows = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"))
    val n = rows.count()
    graft.BenchProbe.time("index_build") {
      // three commits of interleaved slices: a deliberately
      // fragmented, unordered history — what maintenance exists for
      VersionedKeyedTable.create(rows.filter(col("k") % 3 === 0)
        .repartition(8), s"$baseDir/t", "k", CheckBuckets)
      VersionedKeyedTable.upsert(s, s"$baseDir/t",
        rows.filter(col("k") % 3 === 1).repartition(8), "k")
      VersionedKeyedTable.upsert(s, s"$baseDir/t",
        rows.filter(col("k") % 3 === 2).repartition(8), "k")
    }
    val c = s.sql(
      s"CALL $cat.compact(tbl => 't', max_files_per_bucket => 1)")
      .collect()(0)
    require(c.getLong(2) == c.getLong(1) + 1 &&
        c.getInt(4) <= CheckBuckets && c.getInt(4) < c.getInt(3),
      s"compaction must merge the fragmented history to <=1 file per " +
        s"bucket in ONE layout commit (${c.getInt(3)} -> ${c.getInt(4)})")
    val target = math.max(50L, n / 64)
    val k = s.sql(
      s"CALL $cat.cluster(tbl => 't', target_rows_per_file => $target)")
      .collect()(0)
    require(k.getInt(4) > k.getInt(3),
      s"clustering must split each bucket at the row target " +
        s"(${k.getInt(3)} -> ${k.getInt(4)})")
    val q = s.sql(
      s"""SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s,
            min(k) AS mn, max(k) AS mx
          FROM $cat.t WHERE k BETWEEN 1000 AND 5000""")
    q.localCheckpoint(true)
    val (kept, total) =
      graft.sinks.v2.GraftScanInspect.rowScan(q).plannedFileCounts
    require(kept < total,
      s"the CALLed clustering must make the range scan prune " +
        s"($kept/$total)")
    val v = s.sql(s"CALL $cat.vacuum(tbl => 't', keep_versions => 1)")
      .collect()(0)
    require(v.getLong(2) == v.getLong(1),
      "vacuum reclaims storage without committing")
    q
  }

  /** BATCH CHANGE READS (the Delta `table_changes` shape, completing
    * the CDF's third face: programmatic walk → streaming source →
    * now SQL batch): the catalog serves `cat.`t$changes`` — every
    * captured change after the create commit as an ordinary relation,
    * with `WHERE _commit_version ...` predicates pruning WHOLE change
    * files before any row is read (each change file belongs to
    * exactly one commit; in-row require pins planned < span) and
    * `VERSION AS OF` bounding the feed. The oracle replays the same
    * mutation history relationally — a lost change row, a phantom
    * from an out-of-lineage commit, or a mis-joined _prev image all
    * break the hash. At 100 TB this is the audit/backfill query: "what
    * changed in commits (a, b]" reads only those commits' change
    * files, never the table. */
  val versionedCdfBatch = sql("versioned_cdf_batch",
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents0
         FROM orders),
       v2i AS (
         SELECT k, 'insert' AS change_type, g, cents0 AS cents,
           CAST(NULL AS BIGINT) AS g_prev,
           CAST(NULL AS BIGINT) AS cents_prev,
           CAST(2 AS BIGINT) AS _commit_version
         FROM base WHERE k % 3 = 2),
       v2u AS (
         SELECT k, 'update' AS change_type, g, cents0 * 2 AS cents,
           g AS g_prev, cents0 AS cents_prev,
           CAST(2 AS BIGINT) AS _commit_version
         FROM base WHERE k % 3 <> 2 AND k % 10 = 1),
       m AS (
         SELECT k, g,
           CASE WHEN k % 3 <> 2 AND k % 10 = 1 THEN cents0 * 2
                ELSE cents0 END AS cents
         FROM base),
       v3d AS (
         SELECT k, 'delete' AS change_type,
           CAST(NULL AS BIGINT) AS g, CAST(NULL AS BIGINT) AS cents,
           g AS g_prev, cents AS cents_prev,
           CAST(3 AS BIGINT) AS _commit_version
         FROM m WHERE k % 7 = 0)
       SELECT * FROM v2i
       UNION ALL SELECT * FROM v2u
       UNION ALL SELECT * FROM v3d""") { (s, d) =>
    val baseDir = scratch("cdfbatch")
    val cat = freshCat(s, baseDir)
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.filter(col("k") % 3 =!= 2),
        s"$baseDir/t", "k", CheckBuckets)
    }
    // v2: late slice inserts + %10=1 doubles; v3: purge of %7 keys
    VersionedKeyedTable.upsert(s, s"$baseDir/t",
      rows.filter(col("k") % 3 === 2)
        .unionByName(rows.filter(col("k") % 3 =!= 2 && col("k") % 10 === 1)
          .withColumn("cents", col("cents") * 2)), "k")
    VersionedKeyedTable.delete(s, s"$baseDir/t",
      VersionedKeyedTable.read(s, s"$baseDir/t")
        .filter(col("k") % 7 === 0).select(col("k")), "k")
    // a bounded slice proves file pruning: only v3's files plan —
    // evidence read off THIS query's own scan instance
    val vq = s.sql(s"SELECT count(*) AS n FROM $cat.`t$$changes` " +
      "WHERE _commit_version = 3")
    val v3n = vq.collect()(0).getLong(0)
    val (planned, span) = graft.sinks.v2.GraftScanInspect.scans(vq)
      .collectFirst { case c: graft.sinks.v2.CdfBatchScan =>
        c.plannedCommitCounts }
      .getOrElse((-1, -1))
    require(span == 2 && planned == 1,
      s"the =3 predicate must plan only v3's change files ($planned/$span)")
    require(v3n > 0, "the purge commit must have captured deletes")
    s.sql(s"""SELECT k, change_type, g, cents, g_prev, cents_prev,
          _commit_version
        FROM $cat.`t$$changes`""")
  }

  val all: Seq[QueryDef] =
    Seq(versionedRuntimeFilter, versionedSqlDdl, versionedSpj,
      versionedSqlMaintenance, versionedCdfBatch)
}
