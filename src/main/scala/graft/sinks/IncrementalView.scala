package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL VIEW MAINTENANCE over a [[VersionedKeyedTable]]: a
  * materialized per-group (count, sum) aggregate kept current by
  * applying only each refresh span's CHANGE DATA FEED — never by
  * re-aggregating the base table. This is the classic delta-rule for
  * distributive aggregates (self-maintainable views: inserts, deletes
  * and updates each contribute a signed delta; groups whose count
  * reaches zero are deleted), re-expressed as one CDF scan + one
  * grouped aggregate + one three-clause [[VersionedKeyedTable.merge]].
  *
  * The summed column must be an integer/long (exact, order-independent
  * arithmetic): incremental addition applies deltas in a different
  * order than a full recompute, so floating sums would drift —
  * callers carry money as cents. (Reference analogue: the combiner
  * contract — partial aggregates must be associative/commutative,
  * CombinerContext in java/.../Combiners; same algebra, applied
  * across table versions instead of across shards.)
  *
  * Scale: a refresh reads ONLY the span's touched buckets (the CDF
  * contract), aggregates the delta — O(changed rows) — and merges
  * into O(changed groups) of the view's buckets. A 100 TB base with a
  * per-hour delta pays per-hour costs, never a re-scan. The view is
  * itself a VersionedKeyedTable: refreshes are atomic commits,
  * readers are snapshot-isolated, and a crashed refresh leaves only
  * unreferenced files.
  */
object IncrementalView {

  /** Create the view table at `viewDir` from the base's CURRENT state:
    * one full aggregate (the only table-scale pass the view ever
    * pays), grouped by `groupCol`, counting rows and summing the
    * integral `valueCol`. Returns the base version the view now
    * reflects — the caller's refresh watermark. */
  /** Commit-metadata key recording the base version a view commit
    * reflects — stamped atomically with every create/refresh commit,
    * so the view's own log IS the refresh watermark (see
    * [[committedWatermark]]). */
  val AppliedBaseKey = "ivm.appliedBase"

  def createFrom(spark: SparkSession, baseDir: String, viewDir: String,
      groupCol: String, valueCol: String,
      numBuckets: Int = 16): Long = {
    val snap = VersionedKeyedTable.snapshot(spark, baseDir)
    val agg = VersionedKeyedTable.read(spark, baseDir, Some(snap.version))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("total"))
    VersionedKeyedTable.create(agg, viewDir, groupCol, numBuckets,
      commitMeta = Map(AppliedBaseKey -> snap.version.toString))
    snap.version
  }

  /** The base version the view DURABLY reflects: the most recent
    * stamped watermark in the view's commit lineage. Non-refresh
    * commits to the view (a compaction, a restore) carry no stamp —
    * the walk follows base pointers back until it finds one, so
    * maintenance on the view never erases the watermark. Exactly-once
    * refresh discipline across crashes falls out of commit atomicity:
    * a refresh that died before its merge commit left no stamp (the
    * span re-applies, correctly), one that died after left the stamp
    * (the span is skipped). Empty-delta spans commit nothing and
    * re-walk harmlessly (their CDF is empty by definition). */
  def committedWatermark(spark: SparkSession, viewDir: String): Long =
    committedWatermarkOpt(spark, viewDir).getOrElse(
      throw new IllegalStateException(
        s"view at $viewDir carries no $AppliedBaseKey stamp — was it " +
          "created by IncrementalView.createFrom?"))

  private def committedWatermarkOpt(spark: SparkSession,
      viewDir: String): Option[Long] = {
    var cur = VersionedKeyedTable.snapshot(spark, viewDir)
    while (true) {
      cur.meta.get(AppliedBaseKey).map(_.toLong) match {
        case some @ Some(_) => return some
        case None =>
          cur.meta.get(VersionedKeyedTable.BaseKey)
            .flatMap(_.toLongOption) match {
            case None => return None
            case Some(b) =>
              cur = VersionedKeyedTable.snapshot(spark, viewDir, Some(b))
          }
      }
    }
    None // unreachable
  }

  /** Advance the view from base version `fromVersion` to `toVersion`
    * using only the CDF: every changed row contributes its OLD value
    * negatively (delete/update) on its old group and its NEW value
    * positively (insert/update) on its new group — group-moving
    * updates therefore maintain both groups. Idempotence is the
    * caller's watermark discipline: apply each span exactly once, in
    * order. */
  /** SINGLE-MAINTAINER exclusion for a view: refreshes are guarded by
    * an atomic-exclusive lock file under the view dir, because two
    * concurrent maintainers would both pass the watermark guard and
    * the loser's optimistic merge retry would re-apply its
    * NON-IDEMPOTENT delta onto the winner's already-refreshed state —
    * double counts. A second maintainer fails LOUDLY instead; a lock
    * older than `staleLockMs` (a crashed maintainer — refreshes are
    * minutes, not hours) is stolen with a log line. Reentrant within
    * a thread so refreshToLatest's span walk acquires once. */
  private val lockHeld = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }
  private val staleLockMs = 600000L

  private def withMaintainerLock[T](spark: SparkSession,
      viewDir: String)(body: => T): T =
    if (lockHeld.get) body
    else {
      val fs = new org.apache.hadoop.fs.Path(viewDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val lock = new org.apache.hadoop.fs.Path(viewDir, "_maintainer.lock")
      def acquire(): Boolean =
        try fs.createNewFile(lock)
        catch { case _: java.io.IOException => false }
      var got = acquire()
      if (!got && fs.exists(lock) && System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime > staleLockMs) {
        // provably stale: the holder crashed long ago — steal loudly
        System.err.println(s"[incremental-view] stealing stale " +
          s"maintainer lock at $lock")
        fs.delete(lock, false)
        got = acquire()
      }
      if (!got) throw new IllegalStateException(
        s"another maintainer holds the refresh lock at $lock — " +
          "views are single-maintainer (concurrent refreshes would " +
          "double-apply deltas); wait for it or remove a stale lock")
      lockHeld.set(true)
      try body finally {
        lockHeld.set(false)
        fs.delete(lock, false): Unit
      }
    }

  def refresh(spark: SparkSession, baseDir: String, viewDir: String,
      baseKey: String, groupCol: String, valueCol: String,
      fromVersion: Long, toVersion: Long): Unit
      = withMaintainerLock(spark, viewDir) {
    if (fromVersion >= toVersion) return
    // idempotence guard: a span at or below the view's durable
    // watermark has already been applied — a crashed-and-retried
    // maintainer (or a caller holding a stale watermark) is a no-op,
    // never a double count. When a durable watermark exists it is
    // AUTHORITATIVE over the caller's fromVersion in both directions:
    // a span starting below it would re-apply the committed prefix
    // (double count), and a span starting above it would silently skip
    // the (watermark, from] changes and then stamp toVersion —
    // permanently corrupting the view. Either way the only correct
    // span is (watermark, to]. NOTE this is crash-retry protection for
    // a SINGLE maintainer; concurrent maintainers are excluded by the
    // refresh lock (see withMaintainerLock).
    val watermark = committedWatermarkOpt(spark, viewDir)
    if (watermark.exists(_ >= toVersion)) return
    val effFrom = watermark.getOrElse(fromVersion)
    val cdf = VersionedKeyedTable.changesBetween(
      spark, baseDir, baseKey, effFrom, toVersion)
    val oldSide = cdf
      .where(col("change_type").isin("delete", "update"))
      .select(col(s"${groupCol}_prev").as(groupCol),
        (-col(s"${valueCol}_prev")).as("d_total"), lit(-1L).as("d_cnt"))
    val newSide = cdf
      .where(col("change_type").isin("insert", "update"))
      .select(col(groupCol), col(valueCol).as("d_total"),
        lit(1L).as("d_cnt"))
    val delta = oldSide.unionByName(newSide)
      .groupBy(col(groupCol))
      .agg(sum(col("d_cnt")).as("cnt"), sum(col("d_total")).as("total"))
      // all-zero deltas (an update within the group at the same value
      // never reaches here, but offsetting moves can): dropping them
      // avoids touching buckets the span did not net-change
      .where(col("cnt") =!= 0L || col("total") =!= 0L)
    VersionedKeyedTable.merge(spark, viewDir, delta, groupCol,
      whenMatchedDelete = Some(col("t.cnt") + col("s.cnt") === 0L),
      whenMatchedUpdate = Map(
        "cnt" -> (col("t.cnt") + col("s.cnt")),
        "total" -> (col("t.total") + col("s.total"))),
      // the watermark advances ATOMICALLY with the delta application:
      // a crash leaves either both or neither — exactly-once refresh
      commitMeta = Map(AppliedBaseKey -> toVersion.toString))
  }

  /** Crash-safe [[refreshToLatest]]: the starting watermark comes from
    * the view's own committed log, so a restarted maintainer resumes
    * exactly where the last durable refresh left off — an interrupted
    * span re-applies, a committed one never does. */
  def refreshFromCommitted(spark: SparkSession, baseDir: String,
      viewDir: String, baseKey: String, groupCol: String,
      valueCol: String): Long =
    refreshToLatest(spark, baseDir, viewDir, baseKey, groupCol,
      valueCol, committedWatermark(spark, viewDir))

  /** Refresh through every version between the watermark and the
    * base's latest, one span per committed version (the event-log
    * discipline a streaming consumer follows); returns the new
    * watermark. */
  def refreshToLatest(spark: SparkSession, baseDir: String,
      viewDir: String, baseKey: String, groupCol: String,
      valueCol: String, fromVersion: Long): Long
      = withMaintainerLock(spark, viewDir) {
    val latest = VersionedKeyedTable.snapshot(spark, baseDir).version
    if (latest <= fromVersion) latest
    else VersionedKeyedTable.lineageSpan(
        spark, baseDir, fromVersion, latest) match {
      case Some(snaps) =>
        // the base-pointer chain: parses exactly the span's manifests
        // (not the whole log) and excludes out-of-lineage commits
        var prev = fromVersion
        snaps.foreach { s =>
          refresh(spark, baseDir, viewDir, baseKey, groupCol, valueCol,
            prev, s.version)
          prev = s.version
        }
        latest
      case None =>
        // legacy/pre-base-pointer log: walk every complete version
        val versions = VersionedKeyedTable
          .completeVersions(spark, baseDir).dropWhile(_ < fromVersion)
        require(versions.headOption.contains(fromVersion),
          s"view watermark $fromVersion is not a complete version of " +
            s"$baseDir (vacuumed past the watermark?)")
        versions.sliding(2).foreach {
          case Seq(a, b) =>
            refresh(spark, baseDir, viewDir, baseKey, groupCol,
              valueCol, a, b)
          case _ => ()
        }
        versions.last
    }
  }
}
