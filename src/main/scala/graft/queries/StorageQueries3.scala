package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sinks.VersionedKeyedTable

/** TYPED data skipping on the versioned store — round 12: zone maps
  * and blooms for NON-INTEGRAL keys. Time-keyed tables are the most
  * common 100 TB shape (event logs, CDC feeds), and a store that can
  * only prune long keys reads every file of every bucket for a
  * time-range query. DATE/TIMESTAMP columns now record
  * order-preserving epoch images (days / micros) in the manifest, so
  * the one numeric pruning rule covers them; STRING keys keep their
  * native string envelopes (string-order pruning) and hash into the
  * bloom sidecar. The reference's own range splitter was typed the
  * same way — python/src/mapreduce/property_range.py:316-423 splits
  * datetime ranges, java/.../DatastoreShardStrategy.java:406 handles
  * long/double/string/date — our store should prune at least what it
  * could shard.
  */
object StorageQueries3 {
  import QueryDef._

  private val CheckBuckets = 4

  private def scratch(prefix: String): String =
    sys.props("java.io.tmpdir") + "/graft_" + prefix + "_" +
      java.util.UUID.randomUUID().toString

  /** TIMESTAMP-KEYED DATA SKIPPING: events keyed by their event time,
    * clustered so each file covers a narrow time interval, then a
    * mid-history range read — the manifest's epoch-micro zone maps
    * must prune (in-row require), and the answer must equal DuckDB's
    * over the same µs bounds (both engines derive lo/hi from the
    * relation's own min/max with identical integer arithmetic). At
    * 100 TB this is the "yesterday's events" query touching only
    * yesterday's files. */
  val versionedTsSkipping = sql("versioned_ts_skipping",
    """WITH b AS (SELECT min(epoch_ns(ts) // 1000) AS mn,
                        max(epoch_ns(ts) // 1000) AS mx FROM events),
       r AS (SELECT mn + (mx - mn) // 4 AS lo,
                    mn + (mx - mn) // 2 AS hi FROM b)
       SELECT count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         min(event_id) AS min_eid, max(event_id) AS max_eid
       FROM events, r
       WHERE epoch_ns(ts) // 1000 BETWEEN r.lo AND r.hi""") { (s, d) =>
    val dir = scratch("tsskip")
    val ev = Tables.events(s, d).select(col("ts"), col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))
    val n = ev.count()
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(ev.repartition(8), dir, "ts", CheckBuckets)
      VersionedKeyedTable.cluster(s, dir, "ts",
        targetRowsPerFile = math.max(100L, n / 32))
    }
    val r = ev.agg(min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx")).head()
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
    val (kept, total) = VersionedKeyedTable.rangeFiles(s, dir, "ts", lo, hi)
    require(kept.size < total,
      s"ts zone maps must prune the clustered layout (${kept.size}/$total)")
    VersionedKeyedTable.readRange(s, dir, "ts", lo, hi)
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
        min(col("event_id")).as("min_eid"),
        max(col("event_id")).as("max_eid"))
  }

  /** CATALYST TIMESTAMP PUSHDOWN: the same time-keyed table queried
    * through [[VersionedKeyedTable.table]] with a plain WHERE on the
    * raw ts column — Catalyst's timestamp literals ARE epoch micros,
    * so the FileIndex prunes them against the manifest images with no
    * conversion, before split planning (in-row require via
    * lastListed). The declarative face of versioned_ts_skipping,
    * composable with any downstream operator. */
  val versionedTsPushdown = sql("versioned_ts_pushdown",
    """WITH b AS (SELECT min(epoch_ns(ts) // 1000) AS mn,
                        max(epoch_ns(ts) // 1000) AS mx FROM events),
       r AS (SELECT mn + (mx - mn) // 4 AS lo,
                    mn + (mx - mn) // 2 AS hi FROM b)
       SELECT event_type, count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       FROM events, r
       WHERE epoch_ns(ts) // 1000 BETWEEN r.lo AND r.hi
       GROUP BY event_type""") { (s, d) =>
    val dir = scratch("tspush")
    val ev = Tables.events(s, d).select(col("ts"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val n = ev.count()
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(ev.repartition(8), dir, "ts", CheckBuckets)
      VersionedKeyedTable.cluster(s, dir, "ts",
        targetRowsPerFile = math.max(100L, n / 32))
    }
    val r = ev.agg(min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx")).head()
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
    def inst(us: Long) = java.time.Instant.ofEpochSecond(
      us / 1000000L, (us % 1000000L) * 1000L)
    val (df, idx) = VersionedKeyedTable.tableIndexed(s, dir, "ts")
    val out = df.where(col("ts") >= lit(inst(lo)) &&
        col("ts") <= lit(inst(hi)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .localCheckpoint(true) // execute now so the prune count is real
    val (kept, total) = idx.lastListed
    require(kept < total,
      s"the ts WHERE clause must drive file pruning ($kept/$total)")
    out
  }

  /** STRING-KEY BLOOM SKIPPING: documents keyed by a derived string
    * id, scattered across many small files (the hash-ingest layout
    * where every file's string envelope spans ~the whole key domain
    * and zone maps alone prune nothing) — point lookups must prune
    * through the xxhash64 bloom sidecar (in-row require) and return
    * exactly the probed keys' rows, absent probes included. */
  val versionedStrBloomSkipping = sql("versioned_str_bloom_skipping",
    """SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS k,
         n_chars, lang
       FROM documents WHERE doc_id IN (1, 2, 3, 7, 11)""") { (s, d) =>
    val dir = scratch("strbloom")
    val docs = Tables.documents(s, d).select(
      concat(lit("doc-"), lpad(col("doc_id").cast("string"), 6, "0"))
        .as("k"),
      col("n_chars"), col("lang"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(docs.repartition(16), dir, "k",
        CheckBuckets)
    }
    val probe = Seq(1L, 2L, 3L, 7L, 11L).map(i => f"doc-$i%06d")
    val (kept, cand) = VersionedKeyedTable.keyFilesStr(s, dir, "k", probe)
    require(kept.size < cand,
      s"string-key blooms must prune scattered files (${kept.size}/$cand)")
    // absent key: prunes to nothing (and the read stays exactly empty)
    val (keptAbsent, _) = VersionedKeyedTable.keyFilesStr(s, dir, "k",
      Seq("doc-zzzzzz"))
    require(keptAbsent.isEmpty ||
        VersionedKeyedTable.readKeysStr(s, dir, "k", Seq("doc-zzzzzz"))
          .isEmpty,
      "an absent string key must read empty")
    VersionedKeyedTable.readKeysStr(s, dir, "k", probe)
  }

  /** IVM WITH MIN/MAX: the (cnt, total, mn, mx) view maintained off
    * the CDF across a history that DELETES group extrema — the
    * non-self-maintainable case. Inserts extend the envelope as a
    * pure delta; deletes that reach a group's recorded extremum
    * re-aggregate min/max for EXACTLY those groups from the base at
    * the span's version (O(affected groups), never O(table)), and
    * both tiers land in one atomic merge with the watermark. avg is
    * the derived pair total/cnt — one double division of identical
    * operands on both engines (bit-exact). The oracle recomputes the
    * final state relationally; a stale extremum after the delete, a
    * double-applied span, or a missed re-derive breaks the hash. */
  val ivmRefreshMinmax = sql("ivm_refresh_minmax",
    """WITH m AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             * CASE WHEN o_orderkey % 10 = 1 THEN 2 ELSE 1 END AS cents
         FROM orders),
       f AS (SELECT * FROM m WHERE cents <= 25000000)
       SELECT g, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS total,
         min(cents) AS mn, max(cents) AS mx,
         CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg
       FROM f GROUP BY g""") { (s, d) =>
    import graft.sinks.IncrementalView
    val baseDir = scratch("ivmmm_base")
    val viewDir = scratch("ivmmm_view")
    val rows = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_custkey").as("g"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"))
    // v1: the on-time slice; full view created off it (one-time —
    // the priced operation is the mutate+refresh cycle below)
    val watermark = graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.filter(col("k") % 3 =!= 2),
        baseDir, "k", CheckBuckets)
      IncrementalView.createFromFull(
        s, baseDir, viewDir, "g", "cents", numBuckets = CheckBuckets)
    }
    // v2: the late slice arrives (insert tier: envelopes EXTEND)
    VersionedKeyedTable.upsert(s, baseDir,
      rows.filter(col("k") % 3 === 2), "k")
    IncrementalView.refreshToLatestFull(
      s, baseDir, viewDir, "k", "g", "cents", watermark)
    // v3: a correction doubles every %10=1 row — updates whose OLD
    // value may have been a group extremum (re-derive tier)
    VersionedKeyedTable.upsert(s, baseDir,
      rows.filter(col("k") % 10 === 1)
        .withColumn("cents", col("cents") * 2), "k")
    // v4: delete every row above $250k — the MAX of many groups goes,
    // and the view must recover each one's runner-up exactly
    VersionedKeyedTable.delete(s, baseDir,
      VersionedKeyedTable.read(s, baseDir)
        .filter(col("cents") > 25000000L).select(col("k")), "k")
    IncrementalView.refreshFromCommittedFull(
      s, baseDir, viewDir, "k", "g", "cents")
    VersionedKeyedTable.read(s, viewDir)
      .select(col("g"), col("cnt"), col("total"), col("mn"), col("mx"),
        (col("total").cast("double") / col("cnt").cast("double"))
          .as("avg"))
  }

  /** CDF REPLICA SYNC (ChangeFeed.syncReplica): a filtered replica —
    * the serving-copy / region-mirror / compliance-subset shape —
    * kept in sync by consuming ONLY each commit's change feed, one
    * three-clause merge per span with the base version stamped
    * atomically in the merge's own commit. Updates CROSS the
    * replica's predicate in both directions (doubled rows leave,
    * halved rows enter), inserts enter if they qualify, deletes
    * leave; the oracle recomputes the final filtered state
    * relationally, so a row that failed to enter, leave, or die
    * breaks the hash. */
  val versionedReplicaSync = sql("versioned_replica_sync",
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents0
         FROM orders),
       m AS (
         SELECT k, g,
           CASE WHEN k % 10 = 1 THEN cents0 * 2
                WHEN k % 10 = 3 THEN cents0 // 2
                ELSE cents0 END AS cents
         FROM base
         UNION ALL
         SELECT k + 10000000 AS k, g, cents0 AS cents FROM base
         WHERE k % 100 = 7)
       SELECT k, g, cents FROM m
       WHERE k % 13 <> 0 AND cents <= 20000000""") { (s, d) =>
    import graft.sinks.ChangeFeed
    val baseDir = scratch("repl_base")
    val replDir = scratch("repl_copy")
    val rows = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_custkey").as("g"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows, baseDir, "k", CheckBuckets)
      // replica created at v1: the filtered snapshot, stamp = v1
      ChangeFeed.syncReplica(s, baseDir, replDir, "k",
        rowFilter = col("cents") <= 20000000L, numBuckets = CheckBuckets)
    }
    // v2: corrections (×2 leaves the replica, ÷2 enters) + inserts
    VersionedKeyedTable.upsert(s, baseDir,
      rows.filter(col("k") % 10 === 1)
        .withColumn("cents", col("cents") * 2)
        .unionByName(rows.filter(col("k") % 10 === 3)
          .withColumn("cents", expr("cents DIV 2")))
        .unionByName(rows.filter(col("k") % 100 === 7)
          .withColumn("k", col("k") + 10000000L)), "k")
    // v3: a purge
    VersionedKeyedTable.delete(s, baseDir,
      VersionedKeyedTable.read(s, baseDir)
        .filter(col("k") % 13 === 0).select(col("k")), "k")
    // catch-up consumes the two spans' CDFs — O(changed rows) each
    ChangeFeed.syncReplica(s, baseDir, replDir, "k",
      rowFilter = col("cents") <= 20000000L, numBuckets = CheckBuckets)
    VersionedKeyedTable.read(s, replDir)
      .select(col("k"), col("g"), col("cents"))
  }

  /** 2-D Z-ORDER DATA SKIPPING: the OPTIMIZE ZORDER BY analogue —
    * orders carry a Morton key over (custkey, order day) and the
    * table is clusterBy'd on it, so each file covers a tight box in
    * BOTH dimensions at once (a plain sort only prunes its leading
    * column); the manifest keeps named zone maps for the custkey
    * (long) AND the order date (timestamp — epoch-micro image), and a
    * Catalyst 2-D box query prunes through both before split
    * planning (in-row require). The composition of round 12's typed
    * maps with `Layout.zkey`: at 100 TB this is the
    * "this customer segment, this quarter" query touching only
    * box-covering files. */
  val versionedZorderSkipping = sql("versioned_zorder_skipping",
    """SELECT count(*) AS n,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
           AS BIGINT)) AS BIGINT) AS cents,
         min(o_orderkey) AS min_k, max(o_orderkey) AS max_k
       FROM orders
       WHERE o_custkey BETWEEN 300 AND 450
         AND o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1997-07-01'""") { (s, d) =>
    import graft.functions.Layout
    val dir = scratch("zskip")
    val ord = Tables.orders(s, d)
    val rows = ord.select(col("o_orderkey").as("k"),
      col("o_custkey").as("x"),
      // the testdata's parquet annotation reads as TIMESTAMP_NTZ;
      // the UTC session cast gives the instant DuckDB's naive
      // literals denote (see the events normalization in Tables)
      col("o_orderdate").cast("timestamp").as("ts"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"))
      // Morton key over (custkey, epoch DAY) — day granularity keeps
      // the interleave's low bits meaningful (raw micros are noise)
      .withColumn("z", Layout.zkey(col("x"),
        (unix_micros(col("ts")) / lit(86400000000L)).cast("long")))
    val n = rows.count()
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.repartition(8), dir, "k",
        CheckBuckets, statsColumns = Seq("x", "ts"))
      VersionedKeyedTable.clusterBy(s, dir, "k", "z",
        targetRowsPerFile = math.max(100L, n / 32))
    }
    // string→timestamp cast folds under the UTC session zone — the
    // same instant DuckDB's naive TIMESTAMP literal denotes
    def ts(iso: String) = lit(iso).cast("timestamp")
    val (df, idx) = VersionedKeyedTable.tableIndexed(s, dir, "k")
    val out = df.where(col("x") >= 300L && col("x") <= 450L &&
        col("ts") >= ts("1997-01-01") && col("ts") < ts("1997-07-01"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .localCheckpoint(true) // execute now so the prune count is real
    val (kept, total) = idx.lastListed
    require(kept < total,
      s"the 2-D box must prune z-clustered files ($kept/$total)")
    out
  }

  /** THE STORE AS A SQL CATALOG (sinks.v2.GraftCatalog): a versioned
    * table resolved by SQL identifier through Spark's catalog
    * contract, with the engine's own time-travel syntax — one SELECT
    * reads the CURRENT state (its key-range WHERE pruning data files
    * through the manifest zone maps, require-pinned), a second reads
    * `VERSION AS OF 1`, and the union must equal the relational
    * replay of both snapshots. A catalog that resolved the wrong
    * snapshot, dropped the residual filter, or mis-typed a column
    * through the Group reader breaks the hash. */
  val versionedSqlCatalog = sql("versioned_sql_catalog",
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders),
       cur AS (
         SELECT k, g,
           CASE WHEN k % 10 = 1 THEN cents * 2 ELSE cents END AS cents
         FROM base)
       SELECT 'v1' AS at, count(*) AS n,
         CAST(sum(cents) AS BIGINT) AS cents
       FROM base WHERE k BETWEEN 1000 AND 3000
       UNION ALL
       SELECT 'cur' AS at, count(*) AS n,
         CAST(sum(cents) AS BIGINT) AS cents
       FROM cur WHERE k BETWEEN 1000 AND 3000""") { (s, d) =>
    val cat = "g" + java.util.UUID.randomUUID().toString.replace("-", "")
      .take(10)
    val baseDir = scratch("sqlcat")
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.base", baseDir)
    val rows = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_custkey").as("g"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.repartition(8),
        s"$baseDir/orders_v", "k", CheckBuckets)
      VersionedKeyedTable.cluster(s, s"$baseDir/orders_v", "k",
        targetRowsPerFile = math.max(100L, rows.count() / 32))
    }
    VersionedKeyedTable.upsert(s, s"$baseDir/orders_v",
      rows.filter(col("k") % 10 === 1)
        .withColumn("cents", col("cents") * 2), "k")
    val out = s.sql(
      s"""SELECT 'cur' AS at, count(*) AS n,
            CAST(sum(cents) AS BIGINT) AS cents
          FROM $cat.orders_v WHERE k BETWEEN 1000 AND 3000""")
    out.localCheckpoint(true) // execute now so the prune count is real
    val (kept, total) =
      graft.sinks.v2.GraftScanInspect.rowScan(out).plannedFileCounts
    require(kept < total,
      s"the SQL WHERE must prune files through the catalog ($kept/$total)")
    val v1 = s.sql(
      s"""SELECT 'v1' AS at, count(*) AS n,
            CAST(sum(cents) AS BIGINT) AS cents
          FROM $cat.orders_v VERSION AS OF 1
          WHERE k BETWEEN 1000 AND 3000""")
    v1.unionByName(out)
  }

  /** METADATA-ONLY SQL AGGREGATES (GraftCatalog aggregate pushdown):
    * `count(*)` folds the manifest's per-file row counts and
    * `min/max` fold the per-file zone-map envelopes — COMPLETE DSv2
    * pushdown, ZERO data files planned (the in-row require pins it
    * via the scan instance's GraftAggScan type), across a create → upsert history so the
    * manifest carry must be right, not just the create's. The ts
    * column exercises the typed epoch image end to end: the folded
    * micros come back as a TIMESTAMP the oracle formats identically.
    * A filtered count on the same table then takes the ordinary
    * pruned scan — both paths one SQL surface. */
  val versionedSqlFastAgg = sql("versioned_sql_fast_agg",
    """WITH m AS (
         SELECT o_orderkey AS k, o_orderdate AS ts
         FROM orders
         UNION ALL
         SELECT o_orderkey + 10000000 AS k, o_orderdate AS ts
         FROM orders WHERE o_orderkey % 100 = 7)
       SELECT count(*) AS n, min(k) AS mn, max(k) AS mx,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
         (SELECT count(*) FROM m WHERE k BETWEEN 100 AND 5000)
           AS n_filtered
       FROM m""") { (s, d) =>
    val cat = "g" + java.util.UUID.randomUUID().toString.replace("-", "")
      .take(10)
    val baseDir = scratch("fastagg")
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.base", baseDir)
    val rows = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_orderdate").cast("timestamp").as("ts"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.repartition(8),
        s"$baseDir/t", "k", CheckBuckets, statsColumns = Seq("ts"))
    }
    // a later commit must CARRY the stats forward correctly
    VersionedKeyedTable.upsert(s, s"$baseDir/t",
      rows.filter(col("k") % 100 === 7)
        .withColumn("k", col("k") + 10000000L), "k")
    val fast = s.sql(
      s"""SELECT count(*) AS n, min(k) AS mn, max(k) AS mx,
            date_format(min(ts), 'yyyy-MM-dd HH:mm:ss') AS min_ts
          FROM $cat.t""")
    fast.localCheckpoint(true)
    // scoped: the plan's scan must BE the metadata fold (zero data
    // files by construction) with no row scan anywhere in it
    require(graft.sinks.v2.GraftScanInspect.aggScans(fast)
        .exists(_.totalFiles > 0) &&
        graft.sinks.v2.GraftScanInspect.rowScans(fast).isEmpty,
      "metadata aggregates must plan zero file reads (GraftAggScan " +
        "only — no row scan in the plan)")
    val filtered = s.sql(
      s"""SELECT count(*) AS n_filtered FROM $cat.t
          WHERE k BETWEEN 100 AND 5000""")
    fast.crossJoin(filtered)
  }

  val all: Seq[QueryDef] = Seq(versionedTsSkipping, versionedTsPushdown,
    versionedStrBloomSkipping, ivmRefreshMinmax, versionedReplicaSync,
    versionedZorderSkipping, versionedSqlCatalog, versionedSqlFastAgg)
}
