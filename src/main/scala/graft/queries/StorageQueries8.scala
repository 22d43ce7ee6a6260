package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sinks.VersionedKeyedTable

/** Round 14: the versioned store's remaining SQL-citizen seams close —
  * `ALTER TABLE ADD COLUMNS` (a SQL-only user can evolve a live table
  * ahead of the data), the `write.mode=mor` table property (surgical
  * SQL DELETE/INSERT on opted-in tables writes kilobytes instead of
  * rewriting buckets), a BOUNDED executor delete-set under
  * merge-on-read backlogs (refuse-at-plan with "compact first" instead
  * of OOMing the fleet), equal-sequence CDC batching independence, and
  * deep-path idempotent ingest (digest markers).
  */
object StorageQueries8 {
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

  /** SQL `ALTER TABLE … ADD COLUMNS` (GraftCatalog.alterTable → one
    * additive schema-evolution commit): the SQL-only user's seam —
    * Spark analyzes INSERT against the table schema, so without ALTER
    * the catalog's schema could never widen ahead of the data. In-row
    * requires pin the physical contract: EXACTLY ONE commit, the data
    * file set IDENTICAL to the parent (metadata-only — at 100 TB the
    * cost is one manifest write), pre-evolution rows reading the late
    * column as null through BOTH the catalog scan and the evolved CDF,
    * and an ALTER naming the key column refused. Oracle: the final
    * widened state. */
  val versionedSqlAlter = sql("versioned_sql_alter",
    """WITH base AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents,
           CAST(NULL AS BIGINT) AS bonus
         FROM orders WHERE o_orderkey % 2 = 0),
       wider AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents,
           o_orderkey % 97 AS bonus
         FROM orders WHERE o_orderkey % 2 = 1)
       SELECT k, cents, bonus FROM base
       UNION ALL SELECT k, cents, bonus FROM wider""") { (s, d) =>
    val baseDir = scratch("sqlalter")
    val cat = freshCat(s, baseDir)
    val dir = s"$baseDir/t"
    Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), cents.as("cents"))
      .createOrReplaceTempView("graft_alter_src")
    graft.BenchProbe.time("index_build") {
      s.sql(s"""CREATE TABLE $cat.t (k BIGINT, cents BIGINT)
        TBLPROPERTIES ('key'='k', 'buckets'='$CheckBuckets')""")
      s.sql(s"INSERT INTO $cat.t " +
        "SELECT k, cents FROM graft_alter_src WHERE k % 2 = 0")
    }
    val before = VersionedKeyedTable.snapshot(s, dir)
    s.sql(s"ALTER TABLE $cat.t ADD COLUMNS (bonus BIGINT)")
    val after = VersionedKeyedTable.snapshot(s, dir)
    require(after.version == before.version + 1,
      "ALTER ADD COLUMNS must be exactly one commit")
    require(after.files == before.files,
      "ALTER ADD COLUMNS must be metadata-only: no data file moved, " +
        "added, or rewritten")
    // the evolved schema is live for SQL immediately: wider INSERT
    s.sql(s"INSERT INTO $cat.t SELECT k, cents, k % 97 AS bonus " +
      "FROM graft_alter_src WHERE k % 2 = 1")
    // pre-evolution rows read the late column as null — catalog scan
    val nullBonus = s.sql(
        s"SELECT count(*) AS n FROM $cat.t WHERE k % 2 = 0 " +
          "AND bonus IS NULL")
      .collect()(0).getLong(0)
    val evens = s.sql(
        s"SELECT count(*) AS n FROM $cat.t WHERE k % 2 = 0")
      .collect()(0).getLong(0)
    require(nullBonus == evens && evens > 0,
      s"pre-evolution rows must read the added column as null " +
        s"($nullBonus/$evens)")
    // …and through the CDF (the evolved feed schema reads
    // pre-evolution change files' late columns as null)
    val cdfNull = s.sql(
        s"SELECT count(*) AS n FROM $cat.`t$$changes` " +
          "WHERE _commit_version = 2 AND bonus IS NOT NULL")
      .collect()(0).getLong(0)
    require(cdfNull == 0,
      "pre-evolution change rows must read the added column as null " +
        "through the evolved CDF schema")
    // the key column stays untouchable
    val refused =
      try { s.sql(s"ALTER TABLE $cat.t ADD COLUMNS (k BIGINT)"); false }
      catch { case _: Exception => true }
    require(refused, "ALTER naming the key column must refuse")
    s.sql(s"SELECT k, cents, bonus FROM $cat.t")
  }

  /** SQL DML UNDER THE `write.mode=mor` TABLE PROPERTY: a surgical
    * keyed DELETE on an opted-in table writes per-bucket DELETE FILES
    * — the in-row require pins "data file set IDENTICAL to parent"
    * (the decade probe's argument: CoW delete bytes grow with the
    * table, MoR stays flat) — while a session `cow` override on the
    * SAME table still rewrites (the dense-mutation escape hatch,
    * pinned by the file set changing). INSERT under the property
    * appends. Oracle: the surviving rows after both deletes and the
    * re-put. */
  val versionedSqlDeleteMor = sql("versioned_sql_delete_mor",
    """WITH live AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders
         WHERE o_orderkey NOT BETWEEN 100 AND 300
           AND o_orderkey NOT BETWEEN 1000 AND 1200)
       SELECT k,
         CASE WHEN k % 500 = 7 THEN CAST(-1 AS BIGINT)
              ELSE cents END AS cents
       FROM live""") { (s, d) =>
    val baseDir = scratch("sqldelmor")
    val cat = freshCat(s, baseDir)
    val dir = s"$baseDir/t"
    Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), cents.as("cents"))
      .createOrReplaceTempView("graft_delmor_src")
    graft.BenchProbe.time("index_build") {
      s.sql(s"""CREATE TABLE $cat.t (k BIGINT, cents BIGINT)
        TBLPROPERTIES ('key'='k', 'buckets'='$CheckBuckets',
          'write.mode'='mor')""")
      s.sql(s"INSERT INTO $cat.t SELECT k, cents FROM graft_delmor_src")
    }
    val files1 = VersionedKeyedTable.snapshot(s, dir)
      .files.values.flatten.toSet
    // the surgical SQL DELETE: property routes it merge-on-read
    s.sql(s"DELETE FROM $cat.t WHERE k BETWEEN 100 AND 300")
    val snap2 = VersionedKeyedTable.snapshot(s, dir)
    require(snap2.files.values.flatten.toSet == files1,
      "write.mode=mor: a keyed SQL DELETE must leave the data file " +
        "set identical to the parent (delete files only)")
    require(snap2.deletes.valuesIterator.flatten.nonEmpty,
      "the deferred delete must be visible as pending delete files")
    // the session override keeps the CoW path for dense predicates
    s.conf.set("spark.graft.delete.mode", "cow")
    try s.sql(s"DELETE FROM $cat.t WHERE k BETWEEN 1000 AND 1200")
    finally s.conf.unset("spark.graft.delete.mode")
    require(VersionedKeyedTable.snapshot(s, dir)
        .files.values.flatten.toSet != files1,
      "the cow override must rewrite the touched buckets")
    // INSERT under the property appends merge-on-read (put semantics)
    s.sql(s"INSERT INTO $cat.t SELECT k, CAST(-1 AS BIGINT) " +
      "FROM graft_delmor_src WHERE k % 500 = 7 " +
      "AND k NOT BETWEEN 100 AND 300 AND k NOT BETWEEN 1000 AND 1200")
    s.sql(s"SELECT k, cents FROM $cat.t")
  }

  /** BOUNDED MERGE-ON-READ BACKLOG (the round's scale-killer fix): the
    * executor-side delete set is capped by
    * `spark.graft.mor.maxDeleteRows`, enforced at PLAN time from the
    * manifest's delete-file row counts — a backlog past the bound
    * refuses the DSv2 scan loudly with "compact first" BEFORE any
    * executor materializes a set (in-row require pins the refusal and
    * its remedy text), while metadata COUNT(*) and the programmatic
    * anti-join read stay available. Compaction folds the backlog and
    * the scan returns. At 100 TB this is the difference between a
    * neglected table failing one query with instructions and OOMing
    * every executor that touches it. Oracle: the live rows after the
    * deletes. */
  val versionedMorBacklog = sql("versioned_mor_backlog",
    """SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           AS cents
       FROM orders WHERE o_orderkey % 3 <> 0""") { (s, d) =>
    val baseDir = scratch("morbacklog")
    val cat = freshCat(s, baseDir)
    val dir = s"$baseDir/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), cents.as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows, dir, "k", CheckBuckets)
    }
    VersionedKeyedTable.deleteMor(s, dir,
      rows.filter(col("k") % 3 === 0).select(col("k")), "k")
    val backlog = VersionedKeyedTable.snapshot(s, dir)
      .deletes.valuesIterator.flatten.size
    require(backlog > 0, "the backlog must exist")
    def causes(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ causes(t.getCause)
    s.conf.set("spark.graft.mor.maxDeleteRows", "10")
    val refusal =
      try {
        s.sql(s"SELECT sum(cents) AS c FROM $cat.t WHERE k > 0")
          .collect()
        Seq.empty[String]
      } catch { case e: Exception => causes(e) }
      finally s.conf.unset("spark.graft.mor.maxDeleteRows")
    require(refusal.exists(m => m.contains("compact") &&
        m.contains("maxDeleteRows")),
      s"an over-bound backlog must refuse the scan AT PLAN TIME and " +
        s"name the remedy (got: ${refusal.mkString(" | ")})")
    // metadata COUNT(*) and the programmatic read never build the set
    val liveN = rows.filter(col("k") % 3 =!= 0).count()
    require(s.sql(s"SELECT count(*) AS n FROM $cat.t")
        .collect()(0).getLong(0) == liveN,
      "metadata COUNT(*) must stay exact under the capped backlog")
    require(VersionedKeyedTable.read(s, dir).count() == liveN,
      "the programmatic anti-join read must stay available")
    // compaction folds the backlog; the scan returns under any bound
    VersionedKeyedTable.compact(s, dir, "k")
    require(VersionedKeyedTable.snapshot(s, dir).deletes.isEmpty,
      "compaction must consume the backlog")
    s.sql(s"SELECT k, cents FROM $cat.t")
  }

  /** EQUAL-SEQUENCE CDC BATCHING INDEPENDENCE: real feeds ship
    * delete/upsert pairs at the SAME sequence, and the table must
    * converge to one state no matter how the pair is batched — the
    * within-batch window tiebreak (delete wins a tie) and the
    * cross-batch delete gate (`source.seq >= stored.seq`) are the same
    * rule. This query applies the upsert and its equal-sequence delete
    * in SEPARATE batches (the shape the r13 gate got wrong: the strict
    * `>` made the delete a no-op) plus stale no-ops, and the oracle
    * recomputes the window independently. In-row requires pin the
    * equal-sequence delete landing and upsert replay staying empty. */
  val versionedApplyChangesEqseq = sql("versioned_apply_changes_eqseq",
    """WITH ev AS (
         SELECT o_orderkey AS k, CAST(0 AS BIGINT) AS seq,
                'B' AS op, 'base' AS v
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, CAST(5 AS BIGINT), 'U', 'u5'
         FROM orders WHERE o_orderkey % 4 = 1
         UNION ALL
         SELECT o_orderkey, CAST(5 AS BIGINT), 'D', ''
         FROM orders WHERE o_orderkey % 8 = 1
         UNION ALL
         SELECT o_orderkey, CAST(4 AS BIGINT), 'U', 'stale'
         FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey % 8 <> 1
       ), ranked AS (
         SELECT k, seq, op, v,
                row_number() OVER (PARTITION BY k
                  ORDER BY seq DESC, (op = 'D') DESC) AS rn
         FROM ev
       )
       SELECT k, seq, v FROM ranked WHERE rn = 1 AND op <> 'D'""") {
      (s, d) =>
    val dir = scratch("eqseq") + "/t"
    val o = Tables.orders(s, d).select(col("o_orderkey").as("k"))
    def ev(filter: org.apache.spark.sql.Column, seq: Long, op: String,
        v: String) =
      o.filter(filter).withColumn("seq", lit(seq))
        .withColumn("op", lit(op)).withColumn("v", lit(v))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(
        o.filter(col("k") % 2 === 0).withColumn("seq", lit(0L))
          .withColumn("v", lit("base")),
        dir, "k", CheckBuckets)
    }
    // batch 1: the upserts land and stamp sequence 5
    VersionedKeyedTable.applyChanges(s, dir,
      ev(col("k") % 4 === 1, 5L, "U", "u5"), "k", "seq", "op")
    // batch 2 — THE SEAM: the equal-sequence delete arrives in a
    // LATER batch and must still win (as it would within one batch)
    VersionedKeyedTable.applyChanges(s, dir,
      ev(col("k") % 8 === 1, 5L, "D", ""), "k", "seq", "op")
    require(VersionedKeyedTable.read(s, dir)
        .filter(col("k") % 8 === 1).count() == 0L,
      "an equal-sequence delete in a later batch must remove the row " +
        "— final state must not depend on batching")
    // an equal-sequence UPSERT replay stays a per-row no-op (only
    // deletes widened their gate): empty change feed
    val vb = VersionedKeyedTable.snapshot(s, dir).version
    VersionedKeyedTable.applyChanges(s, dir,
      ev(col("k") % 4 === 1 && col("k") % 8 =!= 1, 5L, "U", "u5"),
      "k", "seq", "op")
    require(VersionedKeyedTable.changesBetween(s, dir, "k", vb,
        VersionedKeyedTable.snapshot(s, dir).version).count() == 0L,
      "an equal-sequence upsert replay must stay a per-row no-op")
    // stale updates never regress
    VersionedKeyedTable.applyChanges(s, dir,
      ev(col("k") % 4 === 1 && col("k") % 8 =!= 1, 4L, "U", "stale"),
      "k", "seq", "op")
    VersionedKeyedTable.read(s, dir).select("k", "seq", "v")
  }

  /** DEEP-PATH IDEMPOTENT INGEST: COPY INTO over a source tree whose
    * relative paths URL-encode far past the filesystem's ~255-byte
    * filename limit — the registry markers are fixed-length digests
    * with the identity as content, so the no-op contract holds at any
    * depth (the r13 filename-encoded markers could never be created
    * for deep paths and silently re-ingested those files on every
    * scheduled run, forever). In-row requires pin the no-op re-run
    * (zero files, NO commit) and the incremental late batch. Oracle:
    * the union of the source batches. */
  val versionedIngestDeep = sql("versioned_ingest_deep",
    """SELECT o_orderkey AS k, o_custkey AS g FROM orders""") { (s, d) =>
    val base = scratch("ingestdeep")
    val deep = (1 to 28).map(i => f"warehouse_partition_$i%03d")
      .mkString("/")
    val src = s"$base/src"
    val dir = s"$base/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"))
    rows.filter(col("k") % 2 === 0).coalesce(1)
      .write.parquet(s"$src/$deep/b0")
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.limit(0), dir, "k", CheckBuckets)
    }
    val n1 = VersionedKeyedTable.ingestFiles(s, dir, src, "k")
    require(n1 >= 1, s"the deep batch must load (got $n1)")
    val v1 = VersionedKeyedTable.snapshot(s, dir).version
    // THE contract the digest markers exist for: deep paths re-run
    // as a true no-op (r13's long filenames made this leg re-ingest)
    require(VersionedKeyedTable.ingestFiles(s, dir, src, "k") == 0,
      "a caught-up re-run over deep paths must ingest nothing")
    require(VersionedKeyedTable.snapshot(s, dir).version == v1,
      "a caught-up re-run must not commit")
    // a late batch in ANOTHER deep subtree loads incrementally
    rows.filter(col("k") % 2 === 1).coalesce(1)
      .write.parquet(s"$src/$deep/late/b1")
    val n2 = VersionedKeyedTable.ingestFiles(s, dir, src, "k")
    require(n2 >= 1,
      s"the late deep batch must load incrementally (got $n2)")
    VersionedKeyedTable.read(s, dir)
  }

  /** WRITABLE BRANCHES — WRITE-AUDIT-PUBLISH (the Iceberg WAP
    * workflow over the linked-clone primitive): a branch is a
    * zero-copy independent table stamped with its FORK version; the
    * staging writes (insert/update/delete, multiple commits) happen
    * there, the AUDIT reads exactly the rows being published, and
    * [[VersionedKeyedTable.publish]] lands the branch's NET change on
    * main as ONE merge commit — O(changed rows) via the branch's
    * change files, never O(table). In-row requires pin: main
    * untouched until publish, the publish is exactly one commit, a
    * STALE publish (main advanced past the fork) refuses, and a
    * no-commit branch publishes as a no-op. Oracle: the branch
    * pipeline recomputed relationally. */
  val versionedWap = sql("versioned_wap",
    """WITH base AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders)
       SELECT k,
         CASE WHEN k % 7 = 0 THEN cents * 2 ELSE cents END AS cents
       FROM base WHERE k % 10 <> 0""") { (s, d) =>
    val base = scratch("wap")
    val main = s"$base/main"; val br = s"$base/audit"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), cents.as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.filter(col("k") % 4 =!= 3),
        main, "k", CheckBuckets)
    }
    val fork = VersionedKeyedTable.branchFrom(s, main, br)
    // three staging commits on the branch: the missing slice, a
    // doubling correction, a purge — main must see NONE of it
    VersionedKeyedTable.upsert(s, br,
      rows.filter(col("k") % 4 === 3), "k")
    VersionedKeyedTable.upsert(s, br,
      rows.filter(col("k") % 7 === 0)
        .withColumn("cents", col("cents") * 2), "k")
    VersionedKeyedTable.delete(s, br,
      rows.filter(col("k") % 10 === 0).select(col("k")), "k")
    require(VersionedKeyedTable.snapshot(s, main).version == fork,
      "staging writes must be invisible on main until publish")
    // the AUDIT: the branch must already BE the publishable state
    val audited = VersionedKeyedTable.read(s, br).count()
    require(audited == rows.filter(col("k") % 10 =!= 0).count(),
      "the audit read must see exactly the state being published")
    val after = VersionedKeyedTable.publish(s, main, br, "k")
    require(after == fork + 1,
      s"the publish must be exactly ONE commit on main " +
        s"(fork $fork -> $after)")
    // a STALE second branch refuses once main moved past its fork
    val stale = s"$base/stale"
    VersionedKeyedTable.branchFrom(s, main, stale,
      version = Some(fork))
    VersionedKeyedTable.upsert(s, stale,
      rows.limit(1).withColumn("cents", lit(-1L)), "k")
    val refused =
      try { VersionedKeyedTable.publish(s, main, stale, "k"); false }
      catch { case _: IllegalArgumentException => true }
    require(refused,
      "a publish whose fork main has advanced past must refuse")
    // a no-commit branch publishes as a no-op (no commit on main)
    val quiet = s"$base/quiet"
    VersionedKeyedTable.branchFrom(s, main, quiet)
    require(VersionedKeyedTable.publish(s, main, quiet, "k") == after,
      "an unchanged branch must publish as a no-op")
    VersionedKeyedTable.read(s, main)
  }

  /** DELTA-BASED SQL UPDATE/MERGE on a `write.mode=mor` table
    * (SupportsDelta — the Iceberg merge-on-read DML shape): the
    * row-level rewrite emits per-row delete+insert operations and the
    * write lands them through ONE [[VersionedKeyedTable.mutateMor]]
    * commit — appended data files for the new images plus
    * equality-delete entries for the old ones. In-row requires pin the
    * physical contract: EVERY pre-existing data file survives the
    * UPDATE and the MERGE (O(matched rows) written, where the
    * group-based CoW path rewrites every file its scan read — at
    * 100 TB the difference between kilobytes and terabytes for a
    * surgical correction), one commit each, and metadata COUNT(*)
    * exactness under the pending state. The closing compact() folds
    * everything back to plain files. Oracle: the same mutations
    * recomputed relationally. */
  val versionedSqlUpdateMor = sql("versioned_sql_update_mor",
    """WITH base AS (
         SELECT o_orderkey AS k,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders),
       updated AS (
         SELECT k,
           CASE WHEN k % 9 = 2 THEN cents + 5 ELSE cents END AS cents
         FROM base WHERE k % 11 <> 3),
       merged AS (
         SELECT k,
           CASE WHEN k % 13 = 1 THEN CAST(-1 AS BIGINT)
                ELSE cents END AS cents
         FROM updated)
       SELECT k, cents FROM merged
       UNION ALL
       SELECT k + 20000000 AS k, CAST(7 AS BIGINT) AS cents
       FROM base
       WHERE k % 500 = 3 AND k % 11 <> 3 AND k % 13 <> 1""") { (s, d) =>
    val baseDir = scratch("sqlupdmor")
    val cat = freshCat(s, baseDir)
    val dir = s"$baseDir/t"
    Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), cents.as("cents"))
      .createOrReplaceTempView("graft_updmor_src")
    graft.BenchProbe.time("index_build") {
      s.sql(s"""CREATE TABLE $cat.t (k BIGINT, cents BIGINT)
        TBLPROPERTIES ('key'='k', 'buckets'='$CheckBuckets',
          'write.mode'='mor')""")
      s.sql(s"INSERT INTO $cat.t SELECT k, cents FROM graft_updmor_src")
    }
    val files0 = VersionedKeyedTable.snapshot(s, dir)
      .files.values.flatten.toSet
    val v0 = VersionedKeyedTable.snapshot(s, dir).version
    // the surgical UPDATE: delta path — appended rows + delete
    // entries, NO pre-existing file rewritten
    s.sql(s"UPDATE $cat.t SET cents = cents + 5 WHERE k % 9 = 2")
    val snap1 = VersionedKeyedTable.snapshot(s, dir)
    require(snap1.version == v0 + 1 &&
        files0.subsetOf(snap1.files.values.flatten.toSet),
      "a delta UPDATE must append — every pre-existing data file " +
        "survives in the manifest")
    require(snap1.deletes.valuesIterator.flatten.nonEmpty,
      "the matched rows' old images must die via delete entries")
    // MERGE mixing all three clauses, one commit, still append-only
    Tables.orders(s, d).select(col("o_orderkey").as("k"))
      .filter(col("k") % 13 === 1 || col("k") % 11 === 3 ||
        col("k") % 500 === 3)
      .withColumn("op",
        when(col("k") % 11 === 3, lit("del"))
          .when(col("k") % 13 === 1, lit("upd"))
          .otherwise(lit("ins")))
      .withColumn("nk",
        when(col("op") === "ins", col("k") + 20000000L)
          .otherwise(col("k")))
      .createOrReplaceTempView("graft_updmor_feed")
    s.sql(
      s"""MERGE INTO $cat.t t
          USING graft_updmor_feed f
          ON t.k = f.nk
          WHEN MATCHED AND f.op = 'del' THEN DELETE
          WHEN MATCHED AND f.op = 'upd' THEN
            UPDATE SET cents = CAST(-1 AS BIGINT)
          WHEN NOT MATCHED AND f.op = 'ins' THEN
            INSERT (k, cents) VALUES (f.nk, CAST(7 AS BIGINT))""")
    val snap2 = VersionedKeyedTable.snapshot(s, dir)
    require(snap2.version == snap1.version + 1 &&
        files0.subsetOf(snap2.files.values.flatten.toSet),
      "a delta MERGE must append — one commit, no pre-existing file " +
        "rewritten")
    // metadata COUNT(*) stays exact over the whole pending state
    val expectN = s.sql(
      """SELECT (SELECT count(*) FROM graft_updmor_src) -
           (SELECT count(*) FROM graft_updmor_src WHERE k % 11 = 3) +
           (SELECT count(*) FROM graft_updmor_src
            WHERE k % 500 = 3 AND k % 11 <> 3 AND k % 13 <> 1)
           AS n""").collect()(0).getLong(0)
    val cq = s.sql(s"SELECT count(*) AS n FROM $cat.t")
    require(cq.collect()(0).getLong(0) == expectN,
      "metadata COUNT(*) must stay exact under delta DML state")
    // fold the backlog; the vectorized plain-scan path returns
    VersionedKeyedTable.compact(s, dir, "k")
    s.sql(s"SELECT k, cents FROM $cat.t")
  }

  val all: Seq[QueryDef] = Seq(versionedSqlAlter, versionedSqlDeleteMor,
    versionedMorBacklog, versionedApplyChangesEqseq, versionedIngestDeep,
    versionedWap, versionedSqlUpdateMor)
}
