package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sinks.VersionedKeyedTable

/** Round 13 (continued): the versioned store's GOVERNED-INGEST
  * surface — CHECK constraints enforced on every written row,
  * idempotent bulk file ingest (the COPY INTO shape), and CDC feed
  * apply with out-of-order/duplicate delivery (the APPLY CHANGES
  * shape). Together they are the operational contract a standing
  * 100 TB ingest pipeline needs: loads that are safe to re-fire,
  * feeds that are safe to replay, and data that cannot go bad
  * silently.
  */
object StorageQueries7 {
  import QueryDef._

  private val CheckBuckets = 4

  private def scratch(prefix: String): String =
    sys.props("java.io.tmpdir") + "/graft_" + prefix + "_" +
      java.util.UUID.randomUUID().toString

  /** The shared CDC fixture: `versioned_apply_changes` (batch) and
    * `stream_apply_changes` (foreachBatch streaming) apply the SAME
    * event population and must reach the SAME final state — one
    * definition of the events and one of the window-latest oracle, so
    * the two contracts can never silently diverge. */
  private val CdcOracle =
    """WITH ev AS (
         SELECT o_orderkey AS k, CAST(0 AS BIGINT) AS seq,
                'B' AS op, 'base' AS v
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, CAST(2 AS BIGINT), 'U', 'u2'
         FROM orders WHERE o_orderkey % 3 = 0
         UNION ALL
         SELECT o_orderkey, CAST(1 AS BIGINT), 'U', 'u1'
         FROM orders WHERE o_orderkey % 3 = 1
         UNION ALL
         SELECT o_orderkey, CAST(3 AS BIGINT), 'D', ''
         FROM orders WHERE o_orderkey % 5 = 0
         UNION ALL
         SELECT o_orderkey, CAST(4 AS BIGINT), 'U', 'u4'
         FROM orders WHERE o_orderkey % 7 = 0
         UNION ALL
         SELECT o_orderkey, CAST(1 AS BIGINT), 'U', 'stale'
         FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0
       ), ranked AS (
         SELECT k, seq, op, v,
                row_number() OVER (PARTITION BY k
                  ORDER BY seq DESC, (op = 'D') DESC) AS rn
         FROM ev
       )
       SELECT k, seq, v FROM ranked WHERE rn = 1 AND op <> 'D'"""

  private def orderKeys(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.orders(s, d).select(col("o_orderkey").as("k"))

  private def cdcEvent(o: org.apache.spark.sql.DataFrame)(
      filter: org.apache.spark.sql.Column, seq: Long, op: String,
      v: String): org.apache.spark.sql.DataFrame =
    o.filter(filter).withColumn("seq", lit(seq))
      .withColumn("op", lit(op)).withColumn("v", lit(v))

  private def freshCat(s: org.apache.spark.sql.SparkSession,
      baseDir: String): String = {
    val cat = "g" + java.util.UUID.randomUUID().toString.replace("-", "")
      .take(10)
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.base", baseDir)
    cat
  }

  /** CHECK CONSTRAINTS: a named boolean predicate every commit
    * enforces on every row it writes, in the write's own pass (no
    * extra scan — at 100 TB a separate validation pass would double
    * write I/O). In-row requires pin the contract: a violating batch
    * fails BEFORE its manifest commits (version and rowcount
    * unchanged), a valid batch lands, and the constraint registry
    * round-trips. Oracle: the final state after one rejected and one
    * applied mutation. */
  val versionedConstraints = sql("versioned_constraints",
    """SELECT o_orderkey AS k,
         CAST(CASE WHEN o_orderkey % 7 = 0
           THEN CAST(o_totalprice AS DECIMAL(18,2)) + 1
           ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS DOUBLE)
           AS price
       FROM orders""") { (s, d) =>
    val dir = scratch("constraints") + "/t"
    val rows = Tables.orders(s, d).select(
      col("o_orderkey").as("k"),
      col("o_totalprice").cast("decimal(18,2)").cast("double")
        .as("price"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows, dir, "k", CheckBuckets)
    }
    VersionedKeyedTable.addConstraint(s, dir, "price_pos", "price >= 0")
    require(VersionedKeyedTable.constraints(s, dir) ==
      Map("price_pos" -> "price >= 0"),
      "constraint registry must round-trip")
    val before = VersionedKeyedTable.snapshot(s, dir).version
    // a violating batch must fail BEFORE any manifest commits
    val rejected =
      try {
        VersionedKeyedTable.upsert(s, dir,
          rows.limit(10).withColumn("price", lit(-1.0d)), "k")
        false
      } catch { case _: Exception => true }
    require(rejected, "a constraint-violating upsert must fail")
    require(VersionedKeyedTable.snapshot(s, dir).version == before,
      "a rejected batch must leave the version unchanged")
    // a valid batch lands (decimal arithmetic for oracle bit-parity)
    VersionedKeyedTable.upsert(s, dir,
      rows.filter(col("k") % 7 === 0)
        .withColumn("price",
          (col("price").cast("decimal(18,2)") + 1).cast("double")), "k")
    VersionedKeyedTable.read(s, dir)
  }

  /** IDEMPOTENT FILE INGEST (COPY INTO): load a directory of source
    * files into the store, remembering what loaded — a re-run is a
    * NO-OP (0 files, no commit), and a file landing later loads
    * incrementally. In-row requires pin each leg. Oracle: the final
    * table equals the union of all source batches. */
  val versionedCopyInto = sql("versioned_copy_into",
    """SELECT o_orderkey AS k, o_custkey AS g FROM orders""") { (s, d) =>
    val base = scratch("copyinto")
    val src = s"$base/src"
    val dir = s"$base/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"))
    // three source batches land over time (disjoint by key mod 3)
    rows.filter(col("k") % 3 === 0).coalesce(1).write.parquet(s"$src/b0")
    rows.filter(col("k") % 3 === 1).coalesce(1).write.parquet(s"$src/b1")
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.limit(0), dir, "k", CheckBuckets)
    }
    val n1 = VersionedKeyedTable.ingestFiles(s, dir, src, "k")
    require(n1 >= 2, s"first ingest must load both batches (got $n1)")
    val v1 = VersionedKeyedTable.snapshot(s, dir).version
    // caught up: re-fire is a no-op — no files, NO commit
    require(VersionedKeyedTable.ingestFiles(s, dir, src, "k") == 0,
      "a caught-up re-run must ingest nothing")
    require(VersionedKeyedTable.snapshot(s, dir).version == v1,
      "a caught-up re-run must not commit")
    // the late batch arrives; only IT loads
    rows.filter(col("k") % 3 === 2).coalesce(1).write.parquet(s"$src/b2")
    val n3 = VersionedKeyedTable.ingestFiles(s, dir, src, "k")
    require(n3 >= 1 && n3 < n1,
      s"the incremental run must load only the new batch (got $n3)")
    VersionedKeyedTable.read(s, dir)
  }

  /** APPLY CHANGES (CDC): an event feed of (key, sequence, op, row
    * image) applied with out-of-order, duplicate and cross-batch
    * replay tolerance — the table converges to highest-sequence-per-
    * key with deletes removing rows, and a REPLAYED batch produces an
    * EMPTY change feed (per-row idempotence, pinned in-row). Oracle:
    * the window-latest event per key over the full feed, computable
    * independently in SQL. */
  val versionedApplyChanges = sql("versioned_apply_changes",
    CdcOracle) {
      (s, d) =>
    val dir = scratch("applychanges") + "/t"
    val o = orderKeys(s, d)
    val ev = cdcEvent(o) _
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(
        o.filter(col("k") % 2 === 0).withColumn("seq", lit(0L))
          .withColumn("v", lit("base")),
        dir, "k", CheckBuckets)
    }
    // batch 1: out-of-order updates + deletes, shipped TWICE within
    // the batch (duplicate delivery)
    val b1 = ev(col("k") % 3 === 0, 2L, "U", "u2")
      .unionByName(ev(col("k") % 3 === 1, 1L, "U", "u1"))
      .unionByName(ev(col("k") % 5 === 0, 3L, "D", ""))
    VersionedKeyedTable.applyChanges(s, dir, b1.unionByName(b1),
      "k", "seq", "op")
    // cross-batch REPLAY of batch 1: state identical and the commit's
    // change feed is EMPTY — per-row idempotence, not just convergence
    val vBefore = VersionedKeyedTable.snapshot(s, dir).version
    VersionedKeyedTable.applyChanges(s, dir, b1, "k", "seq", "op")
    val vAfter = VersionedKeyedTable.snapshot(s, dir).version
    require(VersionedKeyedTable.changesBetween(s, dir, "k",
        vBefore, vAfter).count() == 0L,
      "a replayed batch must produce an empty change feed")
    // batch 2: fresh events apply, stale events are per-row no-ops
    val b2 = ev(col("k") % 7 === 0, 4L, "U", "u4")
      .unionByName(
        ev(col("k") % 3 === 0 && col("k") % 5 =!= 0, 1L, "U", "stale"))
    VersionedKeyedTable.applyChanges(s, dir, b2, "k", "seq", "op")
    VersionedKeyedTable.read(s, dir).select("k", "seq", "v")
  }

  /** STREAMING APPLY CHANGES: a CDC event stream (files here; Kafka/
    * Debezium in production) applied to the store per micro-batch via
    * `foreachBatch` + [[VersionedKeyedTable.applyChanges]]. The
    * composition's exactly-once story needs NO epoch bookkeeping:
    * `foreachBatch` is at-least-once under restart, and applyChanges
    * is PER-ROW IDEMPOTENT (the sequence gate makes a replayed or
    * out-of-order event a no-op), so at-least-once delivery converges
    * to exactly-once state — the same event population as
    * `versioned_apply_changes`, split across micro-batches with the
    * stale events arriving LAST, must reach the identical final
    * table. In-row requires pin one commit per micro-batch. */
  val streamApplyChanges = sql("stream_apply_changes",
    CdcOracle) {
      (s, d) =>
    val base = scratch("streamcdc")
    val staging = s"$base/events"
    val dir = s"$base/t"
    val o = orderKeys(s, d)
    val ev = cdcEvent(o) _
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(
        o.filter(col("k") % 2 === 0).withColumn("seq", lit(0L))
          .withColumn("v", lit("base")),
        dir, "k", CheckBuckets)
    }
    // three event files, arrival-ordered: fresh updates + deletes
    // first, the re-inserting late upsert second, the STALE events
    // last (they must be per-row no-ops against already-applied state)
    def stage(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = s"$base/_tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.mkdirs(new org.apache.hadoop.fs.Path(staging))
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .find(_.getPath.getName.endsWith(".parquet")).get.getPath
      fs.rename(part,
        new org.apache.hadoop.fs.Path(staging, s"$name.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true): Unit
      Thread.sleep(10L) // distinct mod times: deterministic arrival order
    }
    // u1 ships WITH the deletes: for keys in both sets the within-
    // batch window resolves them (delete wins at the higher seq) —
    // shipping u1 after the delete batch would hit the documented
    // tombstone-free re-insert window and diverge from the oracle
    stage("aa_updates",
      ev(col("k") % 3 === 0, 2L, "U", "u2")
        .unionByName(ev(col("k") % 5 === 0, 3L, "D", ""))
        .unionByName(ev(col("k") % 3 === 1, 1L, "U", "u1")))
    stage("bb_late",
      ev(col("k") % 7 === 0, 4L, "U", "u4"))
    stage("cc_stale",
      ev(col("k") % 3 === 0 && col("k") % 5 =!= 0, 1L, "U", "stale"))
    val schema = s.read.parquet(staging).schema
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staging)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          _: Long) =>
        VersionedKeyedTable.applyChanges(s, dir, batch, "k", "seq", "op")
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    require(VersionedKeyedTable.completeVersions(s, dir).size == 4,
      "three micro-batches over the base must land as four versions")
    val out = VersionedKeyedTable.read(s, dir).select("k", "seq", "v")
      .localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true): Unit
    out
  }

  /** AUTO-COMPACTION under streaming MoR ingest: every micro-batch
    * APPENDS files (O(batch) writes), so an unattended stream must
    * bound its own read amplification — `autoCompactFilesPerBucket=2`
    * folds any bucket that crosses 2 data files in a surgical
    * fragmentedOnly compact commit right after the epoch's data
    * commit. In-row requires pin the contract: the closing snapshot
    * has NO bucket above the threshold, at least one auto-compaction
    * commit interleaved with the epochs, and the answer is unchanged
    * (pending deletes in never-compacted buckets still apply on
    * read). At 100 TB this is the difference between a standing
    * ingest that stays readable and one that needs a babysitter. */
  val streamMorAutocompact = sql("stream_mor_autocompact",
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS g
         FROM orders WHERE o_orderkey % 3 <> 0)
       SELECT k,
         CASE WHEN k % 10 = 3 THEN CAST(-7 AS BIGINT) ELSE g END AS g
       FROM base""") { (s, d) =>
    val base = scratch("autocompact")
    val staging = s"$base/staging"
    val table = s"$base/table"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"))
      .filter(col("k") % 3 =!= 0)
    graft.streaming.StreamingJobs.stageKeyedSlices(
      s, rows, "k", staging, nFiles = 3)
    // the correction lands LAST: re-puts of %10=3 keys — its epoch
    // writes MoR delete files that may never see a compact, so the
    // closing read must still apply them
    Thread.sleep(10L)
    val tmp = s"$base/_corr"
    rows.filter(col("k") % 10 === 3)
      .withColumn("g", lit(-7L))
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
      .option("autoCompactFilesPerBucket", "2")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val snap = VersionedKeyedTable.snapshot(s, table)
    require(snap.files.valuesIterator.forall(_.size <= 2),
      "auto-compaction must keep every bucket at or under the " +
        s"threshold (got ${snap.files.view.mapValues(_.size).toMap})")
    // 4 staged files = 4 epochs = 4 commits (the first is the
    // create); anything beyond is an interleaved auto-compaction
    require(VersionedKeyedTable.completeVersions(s, table).size >= 5,
      "at least one auto-compaction commit must have interleaved " +
        s"(got ${VersionedKeyedTable.completeVersions(s, table).size})")
    val out = VersionedKeyedTable.read(s, table)
      .select(col("k"), col("g")).localCheckpoint(true)
    fs.delete(new org.apache.hadoop.fs.Path(base), true): Unit
    out
  }

  /** STREAMING TABLE TAIL: `spark.readStream.table("cat.t")` — the
    * catalog table as a native stream of row POST-IMAGES (the Delta
    * streaming-source shape): commit versions are the offsets, each
    * upsert commit is one micro-batch, rows arrive in the TABLE's
    * schema (no CDF columns), and the initial snapshot composes as a
    * batch read at V + a tail from V. In-row requires pin: the tail
    * carries no pre-start rows and no CDF metadata columns. Oracle:
    * the post-images of exactly the two post-create commits. */
  val streamTableTail = sql("stream_table_tail",
    """SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 3 = 2 THEN o_custkey + 1000
              ELSE o_custkey END AS g
       FROM orders WHERE o_orderkey % 3 <> 0""") { (s, d) =>
    val baseDir = scratch("tailcat")
    val dir = s"$baseDir/t"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(
        rows.filter(col("k") % 3 === 0), dir, "k", CheckBuckets)
    }
    // two post-create commits: fresh inserts, then value rewrites
    VersionedKeyedTable.upsert(s, dir, rows.filter(col("k") % 3 === 1),
      "k")
    VersionedKeyedTable.upsert(s, dir,
      rows.filter(col("k") % 3 === 2)
        .withColumn("g", col("g") + 1000L), "k")
    val cat = freshCat(s, baseDir)
    val mem = "tail_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(10)
    val q = s.readStream.option("startingVersion", "1")
      .table(s"$cat.t")
      .writeStream.format("memory").queryName(mem)
      .option("checkpointLocation", s"$baseDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = s.table(mem)
    require(got.columns.toSeq == Seq("k", "g"),
      s"the tail must carry the TABLE schema, no CDF columns " +
        s"(got ${got.columns.mkString(", ")})")
    require(got.filter(col("k") % 3 === 0).count() == 0L,
      "the tail must not replay rows from before startingVersion")
    val out = got.localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(baseDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(baseDir), true): Unit
    out
  }

  val all: Seq[QueryDef] = Seq(
    versionedConstraints, versionedCopyInto, versionedApplyChanges,
    streamApplyChanges, streamMorAutocompact, streamTableTail)
}
