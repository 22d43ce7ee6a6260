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
    val cntQ = s.sql(s"SELECT count(*) AS n FROM $cat.t")
    val n1 = cntQ.collect()(0).getLong(0)
    require(n1 == live1 &&
        graft.sinks.v2.GraftScanInspect.aggScans(cntQ)
          .exists(_.totalFiles > 0) &&
        graft.sinks.v2.GraftScanInspect.rowScans(cntQ).isEmpty,
      s"count(*) must stay metadata-only and exact under MOR " +
        s"deletes (n=$n1/$live1; plan must hold only the manifest " +
        "fold scan)")
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

  /** MERGE-ON-READ UPSERT: put semantics that APPEND instead of
    * rewriting — new data files + a sequence-stamped equality-delete
    * for the replaced keys (the Iceberg MoR write over the manifest
    * log). Copy-on-write upsert's write amplification grows with
    * bucket size; at 100 TB a continuously-updated table must pay
    * O(batch) per commit. In-row requires pin the contract: every
    * pre-existing data file SURVIVES the commit, the appended files
    * carry the commit's sequence, metadata COUNT(*) stays exact, and
    * the sequence rule keeps exactly the newest row per key live
    * (the batch's own rows survive its delete file). */
  val versionedMorUpsert = sql("versioned_mor_upsert",
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders)
       SELECT k, g,
         CASE WHEN k % 10 = 1 THEN cents * 3 ELSE cents END AS cents
       FROM base
       UNION ALL
       SELECT o_orderkey + 100000000 AS k, CAST(-1 AS BIGINT) AS g,
         CAST(7 AS BIGINT) AS cents
       FROM orders WHERE o_orderkey % 97 = 0""") { (s, d) =>
    val baseDir = scratch("morup")
    val dir = s"$baseDir/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows, dir, "k", CheckBuckets)
    }
    val before = VersionedKeyedTable.snapshot(s, dir)
    val beforeFiles = before.files.valuesIterator.flatten.toSet
    val batch = rows.filter(col("k") % 10 === 1)
        .withColumn("cents", col("cents") * 3)
      .unionByName(rows.filter(col("k") % 97 === 0)
        .select((col("k") + 100000000L).as("k"),
          lit(-1L).as("g"), lit(7L).as("cents")))
    VersionedKeyedTable.upsertMor(s, dir, batch, "k")
    val after = VersionedKeyedTable.snapshot(s, dir)
    val afterFiles = after.files.valuesIterator.flatten.toSet
    require(beforeFiles.subsetOf(afterFiles),
      "a MOR upsert must not rewrite or drop any existing data file")
    require((afterFiles -- beforeFiles).forall(f =>
        after.seqs.get(f).contains(after.version)),
      "appended files must carry the commit's sequence")
    val expected = rows.count() +
      rows.filter(col("k") % 97 === 0).count()
    require(VersionedKeyedTable.countRows(s, dir).contains(expected),
      "metadata COUNT(*) must stay exact across a MOR upsert")
    VersionedKeyedTable.read(s, dir)
  }

  /** MERGE-ON-READ STREAMING INGEST: `writeStream` into the store
    * with `writeMode=mor` — every micro-batch APPENDS data files plus
    * a sequence-stamped delete for replaced keys, so per-epoch cost
    * is O(batch) no matter how large the table has grown (the 100 TB
    * continuous-ingest shape; copy-on-write mode rewrites touched
    * buckets per epoch). Exactly-once still rides the epoch stamp in
    * commit metadata. In-row requires pin: one commit per micro-batch,
    * NO pre-existing data file ever dropped by an ingest commit
    * (append-only file sets along the lineage), last-write-wins
    * across epochs via the sequence rule, and a closing compact()
    * folds the whole backlog without changing the answer. */
  val streamMorIngest = sql("stream_mor_ingest",
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey % 3 <> 0)
       SELECT k, g,
         CASE WHEN k % 10 = 1 THEN cents * 2 ELSE cents END AS cents
       FROM base""") { (s, d) =>
    val base = scratch("morstream")
    val staging = s"$base/staging"
    val table = s"$base/table"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
      .filter(col("k") % 3 =!= 0)
    graft.streaming.StreamingJobs.stageKeyedSlices(
      s, rows, "k", staging, nFiles = 3)
    // the correction lands LAST: re-puts of %10=1 keys at doubled
    // cents — the sequence rule must make the last write win
    Thread.sleep(10L)
    val tmp = s"$base/_corr"
    rows.filter(col("k") % 10 === 1)
      .withColumn("cents", col("cents") * 2)
      .coalesce(1).write.parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .find(_.getPath.getName.endsWith(".parquet")).get.getPath
    fs.rename(part,
      new org.apache.hadoop.fs.Path(staging, "zz_correction.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true): Unit
    val schema = s.read.parquet(staging).schema
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staging)
      .writeStream.format("graft.sinks.v2.VersionedTableSink")
      .option("path", table).option("keyCol", "k")
      .option("numBuckets", "4").option("writeMode", "mor")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val versions = VersionedKeyedTable.completeVersions(s, table)
    require(versions.size == 4,
      s"four micro-batches must land as four commits (got " +
        s"${versions.size})")
    // append-only ingest: along the lineage, every commit's data file
    // set CONTAINS its parent's — no bucket was ever rewritten
    versions.sliding(2).foreach {
      case Seq(a, b) =>
        val fa = VersionedKeyedTable.snapshot(s, table, Some(a))
          .files.valuesIterator.flatten.toSet
        val fb = VersionedKeyedTable.snapshot(s, table, Some(b))
          .files.valuesIterator.flatten.toSet
        require(fa.subsetOf(fb),
          s"MOR ingest must never drop a data file (v$a -> v$b)")
      case _ => ()
    }
    // fold the backlog; the answer must not change
    val liveBefore = VersionedKeyedTable.countRows(s, table)
    VersionedKeyedTable.compact(s, table, "k")
    require(VersionedKeyedTable.snapshot(s, table).deletes.isEmpty,
      "compact must purge the ingest backlog")
    require(VersionedKeyedTable.countRows(s, table) == liveBefore,
      "the purge must not change the live count")
    val out = VersionedKeyedTable.read(s, table)
      .select(col("k"), col("g"), col("cents"))
      .localCheckpoint(true)
    fs.delete(new org.apache.hadoop.fs.Path(base), true): Unit
    out
  }

  /** TAGS: immutable named snapshots with vacuum retention — the
    * audit/repro pin every production table needs (`VERSION AS OF
    * 'release'` instead of a version number someone wrote down). The
    * lifecycle in one row: tag the pristine state, mutate, vacuum
    * past it with retention 1 — the in-row requires pin that the
    * UNTAGGED intermediate versions were reclaimed while the tagged
    * snapshot still reads IN FULL (manifest + data files survive) —
    * then read the final state through the catalog and the tagged
    * state through `VERSION AS OF 'name'`. */
  val versionedTags = sql("versioned_tags",
    """SELECT o_orderkey AS k, o_custkey AS g,
         CAST(0 AS BIGINT) AS tagged_only
       FROM orders WHERE (o_orderkey % 4) <> 0
       UNION ALL
       SELECT o_orderkey AS k, o_custkey AS g,
         CAST(1 AS BIGINT) AS tagged_only
       FROM orders WHERE (o_orderkey % 4) = 0""") { (s, d) =>
    val baseDir = scratch("tags")
    val cat = freshCat(s, baseDir)
    val dir = s"$baseDir/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows, dir, "k", CheckBuckets)
    }
    s.sql(s"CALL $cat.tag(tbl => 't', name => 'pristine')")
    // two mutation commits, then vacuum past them with retention 1
    VersionedKeyedTable.delete(s, dir,
      rows.filter(col("k") % 4 === 0).select(col("k")), "k")
    VersionedKeyedTable.upsert(s, dir,
      rows.filter(col("k") % 16 === 1), "k")
    VersionedKeyedTable.vacuum(s, dir, keepVersions = 1, graceMs = 0L,
      stagingGraceMs = 0L)
    val live = VersionedKeyedTable.completeVersions(s, dir).toSet
    require(live == Set(1L, 3L),
      s"vacuum must reclaim untagged intermediates but RETAIN the " +
        s"tagged v1 (got $live)")
    val tagged = s.sql(
      s"SELECT k, g FROM $cat.t VERSION AS OF 'pristine'")
    val current = s.sql(s"SELECT k, g FROM $cat.t")
    require(tagged.count() > current.count(),
      "the tagged snapshot must still read in full past the vacuum")
    // rows only in the tagged snapshot are exactly the deleted %4 set
    tagged.join(current, Seq("k"), "left_anti")
      .withColumn("tagged_only", lit(1L))
      .unionByName(current.withColumn("tagged_only", lit(0L)))
  }

  /** COMPOSITION: an incremental view maintained over MERGE-ON-READ
    * mutations — upsertMor and deleteMor capture ordinary CDF change
    * rows, so the view's refresh machinery (delta aggregate + merge
    * commit + durable watermark) consumes them EXACTLY like
    * copy-on-write commits; a compaction purge in the span is
    * CDF-invisible and contributes nothing. This is the 100 TB
    * composition that matters: O(batch) MoR ingest feeding O(delta)
    * view maintenance, with neither tier ever re-reading the base. */
  val ivmOverMor = sql("ivm_over_mor",
    """WITH fin AS (
         SELECT o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             * CASE WHEN o_orderkey % 13 = 1 THEN 2 ELSE 1 END AS cents
         FROM orders
         WHERE (o_orderkey % 3) <> 2 AND (o_orderkey % 17) <> 0)
       SELECT g, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS total
       FROM fin GROUP BY g""") { (s, d) =>
    import graft.sinks.IncrementalView
    val baseDir = scratch("ivmmor_base")
    val viewDir = scratch("ivmmor_view")
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
      .filter(col("k") % 3 =!= 2)
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows, baseDir, "k", CheckBuckets)
    }
    val watermark = IncrementalView.createFrom(
      s, baseDir, viewDir, "g", "cents", numBuckets = CheckBuckets)
    // MoR commit 2: %13=1 rows corrected to doubled cents (append +
    // stamped delete — no bucket rewrite)
    VersionedKeyedTable.upsertMor(s, baseDir,
      rows.filter(col("k") % 13 === 1)
        .withColumn("cents", col("cents") * 2), "k")
    // MoR commit 3: a compliance delete, deferred
    VersionedKeyedTable.deleteMor(s, baseDir,
      rows.filter(col("k") % 17 === 0).select(col("k")), "k")
    // commit 4: the purge — CDF-invisible, the view must skip it
    VersionedKeyedTable.compact(s, baseDir, "k")
    require(VersionedKeyedTable.snapshot(s, baseDir).deletes.isEmpty,
      "compact must have purged the MoR backlog before the refresh")
    IncrementalView.refreshToLatest(
      s, baseDir, viewDir, "k", "g", "cents", watermark)
    VersionedKeyedTable.read(s, viewDir)
      .select(col("g"), col("cnt"), col("total"))
  }

  val all: Seq[QueryDef] =
    Seq(versionedMorDelete, versionedMorCompact, versionedMorSql,
      versionedSqlUpdatePruned, versionedMorUpsert, streamMorIngest,
      versionedTags, ivmOverMor)
}
