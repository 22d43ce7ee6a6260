package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sinks.VersionedKeyedTable

/** Round 13 (continued): MERGE-ON-READ deletes — deferred per-bucket
  * delete files instead of bucket rewrites (the Iceberg
  * equality-delete / Delta deletion-vector shape over the manifest
  * log) — and the GROUP-BASED row-level SQL write that replaces
  * exactly the files its CoW scan read (a zone-map-pruned UPDATE
  * rewrites covering files only, and loses nothing).
  */
object StorageQueries6 {
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

  /** MERGE-ON-READ DELETE: hide keys in one commit that moves NO data
    * file — at 100 TB a surgical delete (GDPR erasure of a handful of
    * keys, late-arriving retractions) must not rewrite TB-scale
    * buckets; copy-on-write stays the dense-delete mode. In-row
    * requires pin the physical contract: the delete commit's data
    * file set is IDENTICAL to its parent's, pending delete entries
    * exist, metadata COUNT(*) subtracts them exactly, a point lookup
    * of a deleted key reads empty, and an upsert of deleted keys
    * REVIVES them while consuming its buckets' delete entries. */
  val versionedMorDelete = sql("versioned_mor_delete",
    """SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 20 = 0 THEN CAST(-1 AS BIGINT)
              ELSE o_custkey END AS g
       FROM orders
       WHERE (o_orderkey % 5) <> 0 OR (o_orderkey % 20) = 0""") { (s, d) =>
    val baseDir = scratch("mordel")
    val dir = s"$baseDir/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows, dir, "k", CheckBuckets)
    }
    val before = VersionedKeyedTable.snapshot(s, dir)
    VersionedKeyedTable.deleteMor(s, dir,
      rows.filter(col("k") % 5 === 0).select(col("k")), "k")
    val after = VersionedKeyedTable.snapshot(s, dir)
    require(after.files == before.files,
      "a MOR delete must not rewrite, add or drop any data file")
    require(after.deletes.valuesIterator.flatten.nonEmpty,
      "the commit must record pending delete files")
    // metadata-only COUNT(*) stays exact under pending deletes
    val total = rows.count()
    val doomed = rows.filter(col("k") % 5 === 0).count()
    require(VersionedKeyedTable.countRows(s, dir)
        .contains(total - doomed),
      "countRows must subtract the recorded delete counts exactly")
    // a deleted key's point lookup reads empty through zone+bloom
    val someDoomed = rows.filter(col("k") % 5 === 0)
      .select(col("k")).limit(1).collect()(0).getLong(0)
    require(VersionedKeyedTable.readKeys(s, dir, "k",
      Seq(someDoomed)).isEmpty, "deleted key must read empty")
    // revival: re-upsert the %20 subset with a sentinel value — the
    // rewrite consumes those buckets' delete entries
    VersionedKeyedTable.upsert(s, dir,
      rows.filter(col("k") % 20 === 0)
        .withColumn("g", lit(-1L)), "k")
    VersionedKeyedTable.read(s, dir)
  }

  /** COMPACTION AS PURGE + vacuum reclaim: compact() consumes pending
    * delete files (reads stay identical, the manifest's delete section
    * empties, the vectorized no-anti-join read path and metadata
    * min/max pushdown return), and a retention-1 vacuum then reclaims
    * the consumed delete files from disk. Time travel still serves
    * the pre-delete snapshot until the vacuum. */
  val versionedMorCompact = sql("versioned_mor_compact",
    """SELECT o_custkey AS g, count(*) AS n,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
           AS BIGINT)) AS BIGINT) AS cents
       FROM orders
       WHERE (o_orderkey % 3) <> 0
       GROUP BY 1""") { (s, d) =>
    val baseDir = scratch("morcomp")
    val dir = s"$baseDir/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows, dir, "k", CheckBuckets)
    }
    VersionedKeyedTable.deleteMor(s, dir,
      rows.filter(col("k") % 3 === 0).select(col("k")), "k")
    val pending = VersionedKeyedTable.snapshot(s, dir)
    require(pending.deletes.nonEmpty, "deletes must be pending")
    val preDeleteVersion = pending.version - 1
    val pendingRels = pending.deletes.valuesIterator.flatten.toSeq
    VersionedKeyedTable.compact(s, dir, "k")
    val purged = VersionedKeyedTable.snapshot(s, dir)
    require(purged.deletes.isEmpty,
      "compaction must consume every pending delete file")
    require(purged.files.valuesIterator.forall(_.size <= 1),
      "compaction must also bound files per bucket")
    // time travel across the purge still serves the pre-delete state
    require(VersionedKeyedTable.read(s, dir, Some(preDeleteVersion))
        .count() == rows.count(),
      "pre-delete version must still read in full")
    // retention-1 vacuum reclaims the consumed delete files
    VersionedKeyedTable.vacuum(s, dir, keepVersions = 1, graceMs = 0L,
      stagingGraceMs = 0L)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      s.sparkContext.hadoopConfiguration)
    require(pendingRels.forall(rel =>
        !fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$rel"))),
      "vacuum must reclaim consumed delete files")
    VersionedKeyedTable.read(s, dir)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("cents").as("cents"))
  }

  /** MOR DELETES THROUGH SQL: the catalog's three scan shapes under
    * pending delete files — the vectorized row scan filters deleted
    * keys (even when the projection lacks the key), COUNT(*) stays
    * METADATA-ONLY and exact (zero files planned — delete counts
    * subtract in the manifest), and `spark.graft.delete.mode=mor`
    * routes SQL DELETE itself through the deferred path (data files
    * untouched, require-pinned). `t$deletes` exposes the pending
    * files; min/max declines to a real scan (a deleted extremum makes
    * envelope folds unsound) yet stays exact. */
  val versionedMorSql = sql("versioned_mor_sql",
    """WITH live AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders
         WHERE (o_orderkey % 3) <> 0
           AND o_orderkey NOT BETWEEN 100 AND 400)
       SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
         min(k) AS mn, max(k) AS mx
       FROM live""") { (s, d) =>
    val baseDir = scratch("morsql")
    val cat = freshCat(s, baseDir)
    val dir = s"$baseDir/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows, dir, "k", CheckBuckets)
    }
    VersionedKeyedTable.deleteMor(s, dir,
      rows.filter(col("k") % 3 === 0).select(col("k")), "k")
    // metadata-only COUNT(*): zero data files planned, exact
    val live1 = rows.filter(col("k") % 3 =!= 0).count()
    val n1 = s.sql(s"SELECT count(*) AS n FROM $cat.t")
      .head().getLong(0)
    val (kept, totalFiles) = graft.sinks.v2.GraftScanBuilder
      .lastPlanned.get()
    require(n1 == live1 && kept == 0 && totalFiles > 0,
      s"count(*) must stay metadata-only and exact under MOR " +
        s"deletes (n=$n1/$live1, planned=$kept/$totalFiles)")
    // the pending files are observable from SQL
    val delRows = s.sql(
        s"SELECT coalesce(sum(rows), 0) AS r FROM $cat.`t$$deletes`")
      .head().getLong(0)
    require(delRows == rows.count() - live1,
      "t$deletes must account every doomed row")
    // SQL DELETE itself defers under delete.mode=mor (the predicate
    // is filter-expressible, so it rides the deleteWhere fast path;
    // non-filter predicates take the row-level CoW rewrite instead)
    val beforeFiles = VersionedKeyedTable.snapshot(s, dir).files
    s.conf.set("spark.graft.delete.mode", "mor")
    try s.sql(s"DELETE FROM $cat.t WHERE k BETWEEN 100 AND 400")
    finally s.conf.unset("spark.graft.delete.mode")
    require(VersionedKeyedTable.snapshot(s, dir).files == beforeFiles,
      "delete.mode=mor must leave every data file in place")
    // vectorized row scan (projection without the key) + min/max
    // declining to a real scan — one statement pins all of it
    s.sql(s"""SELECT count(*) AS n, sum(cents) AS cents, min(k) AS mn,
          max(k) AS mx FROM $cat.t""")
  }

  /** GROUP-BASED SQL UPDATE (the round's correctness find, pinned):
    * a zone-map-pruned UPDATE's CoW scan reads only the files whose
    * key envelopes intersect the WHERE — and the write replaces
    * EXACTLY those files, so every unread row survives verbatim. The
    * in-row requires pin both halves: most pre-update files survive
    * untouched in the manifest (the rewrite was surgical), and the
    * full row count is preserved (nothing was dropped — the failure
    * mode a whole-table replace under a pruned scan would cause). */
  val versionedSqlUpdatePruned = sql("versioned_sql_update_pruned",
    """SELECT o_orderkey AS k,
         CASE WHEN o_orderkey BETWEEN 1000 AND 2000
              THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 200 AS BIGINT)
              ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
         END AS cents
       FROM orders""") { (s, d) =>
    val baseDir = scratch("updpruned")
    val cat = freshCat(s, baseDir)
    val dir = s"$baseDir/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows, dir, "k", CheckBuckets)
      // ~20 files regardless of SF, so the BETWEEN range provably
      // covers a minority of files at every test scale
      VersionedKeyedTable.cluster(s, dir, "k",
        targetRowsPerFile = math.max(50L, rows.count() / 20))
    }
    val filesBefore = VersionedKeyedTable.snapshot(s, dir)
      .files.valuesIterator.flatten.toSet
    s.sql(s"UPDATE $cat.t SET cents = cents * 2 " +
      "WHERE k BETWEEN 1000 AND 2000")
    val after = VersionedKeyedTable.snapshot(s, dir)
    val surviving = after.files.valuesIterator.flatten.toSet
      .intersect(filesBefore)
    require(surviving.size > filesBefore.size / 2,
      s"a key-ranged UPDATE must rewrite only covering files " +
        s"(${surviving.size}/${filesBefore.size} survived)")
    require(VersionedKeyedTable.read(s, dir).count() == rows.count(),
      "the group replace must preserve every unread row")
    VersionedKeyedTable.read(s, dir)
  }

  val all: Seq[QueryDef] =
    Seq(versionedMorDelete, versionedMorCompact, versionedMorSql,
      versionedSqlUpdatePruned)
}
