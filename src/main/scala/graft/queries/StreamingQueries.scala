package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.streaming.StreamingJobs

/** Stream-shaped check queries: a real Structured Streaming job (memory
  * sink, AvailableNow) whose final table must equal the batch SQL, and a
  * gap-based sessionization (the stateful-processing shape that
  * `flatMapGroupsWithState` handles unbounded; expressed here with window
  * functions so it is oracle-checkable).
  */
object StreamingQueries {
  import QueryDef._

  /** Structured Streaming tumbling-window agg == batch GROUP BY on epoch
    * hour buckets. Spark windows align to the epoch, so
    * floor(epoch/3600)*3600 is exactly window.start. */
  val streamWindowAgg = sql("stream_window_agg",
    """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start,
       event_type, count(*) AS cnt,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
       FROM events GROUP BY 1, 2""") { (s, d) =>
    StreamingJobs.windowedEventCounts(s, d)
  }

  /** Sliding windows (1 h window / 30 min slide): every event belongs to
    * exactly two windows, whose starts are the two slide-aligned epochs
    * within the preceding hour — which is how the oracle unrolls the
    * overlap with integer arithmetic. */
  val streamSlidingWindow = sql("stream_sliding_window",
    """WITH e AS (
         SELECT epoch_ns(ts) // 1000000000 AS sec, event_type FROM events),
       x AS (
         SELECT (sec // 1800) * 1800 AS win_start, event_type FROM e
         UNION ALL
         SELECT (sec // 1800) * 1800 - 1800, event_type FROM e)
       SELECT CAST(win_start AS BIGINT) AS win_start, event_type,
         count(*) AS cnt
       FROM x GROUP BY 1, 2""") { (s, d) =>
    StreamingJobs.slidingEventCounts(s, d)
  }

  /** Watermarked stream-stream inner join over a bounded replay must
    * emit exactly the batch join: purchases matched to the same user's
    * signup within the following hour. The oracle compares µs-floored
    * epochs (epoch_ns // 1000) because the Spark side reads the
    * TIMESTAMP(NANOS) column floored to µs — comparing DuckDB's raw ns
    * timestamps instead would diverge on sub-µs gaps. */
  val streamJoin = sql("stream_join",
    """WITH e AS (
         SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us
         FROM events)
       SELECT s.user_id, s.event_id AS signup_event,
         p.event_id AS purchase_event
       FROM e s JOIN e p ON s.user_id = p.user_id
       WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
         AND p.us >= s.us AND p.us < s.us + 3600000000""") { (s, d) =>
    StreamingJobs.signupPurchaseJoin(s, d)
      .select(col("user_id"), col("signup_event"), col("purchase_event"))
  }

  /** Gap-based sessionization (30-minute inactivity): per-user session
    * boundaries via lag + running sum, then per-session aggregates.
    * Millisecond epochs keep the arithmetic integer-exact. */
  val sessionize = sql("sessionize",
    """WITH e AS (
         SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS ms,
           CAST(round(value * 100) AS BIGINT) AS cents
         FROM events),
       gaps AS (
         SELECT *, CASE WHEN ms - lag(ms) OVER w > 1800000 OR
                             lag(ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
       sess AS (
         SELECT *, SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ms, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
         FROM gaps)
       SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
         min(ms) AS session_start_ms,
         count(*) AS n_events, CAST(SUM(cents) AS BIGINT) AS total_cents
       FROM sess GROUP BY user_id, session_no""") { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("new_sess",
        when(col("ms") - lag(col("ms"), 1).over(w) > 1800000L
          || lag(col("ms"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_no", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ms")).as("session_start_ms"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("total_cents"))
  }

  /** Spark's native session_window operator (batch form; the same
    * operator runs in Structured Streaming with watermarked state):
    * 30-minute gap-merged sessions per user. The oracle replays the gap
    * logic with lag + running-sum at µs precision. Boundary semantics:
    * Spark merges an event into the open session iff its gap from the
    * previous event is <= the window — INCLUSIVE at exactly the gap
    * (pinned empirically by StreamingSpec's boundary test, since the
    * testdata has no exact-boundary gaps) — hence strict > in the
    * oracle's new-session predicate. */
  val sessionWindowNative = sql("session_window_native",
    """WITH e AS (
         SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events),
       gaps AS (
         SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000 OR
                             lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       sess AS (
         SELECT *, SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM gaps)
       SELECT user_id, min(us) AS session_start_us, count(*) AS n_events
       FROM sess GROUP BY user_id, sid""") { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))
  }

  /** Streaming session windows under a watermark (append mode): only
    * sessions the final watermark finalized emit — with zero delay the
    * watermark ends at max(ts), so the oracle is the batch gap-merge
    * restricted to sessions whose end + gap <= global max event time.
    * (The complete-mode batch equivalence is session_window_native;
    * this checks the unbounded-production append contract.) */
  val streamSessionWindow = sql("stream_session_window",
    """WITH e AS (
         SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events),
       mx AS (SELECT max(us) AS max_us FROM e),
       gaps AS (
         SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000 OR
                             lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       sess AS (
         SELECT *, SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM gaps),
       agg AS (
         SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us,
           count(*) AS n_events
         FROM sess GROUP BY user_id, sid)
       SELECT user_id, session_start_us, n_events
       FROM agg, mx
       WHERE session_end_us + 1800000000 <= max_us""") { (s, d) =>
    StreamingJobs.sessionWindowStreaming(s, d)
  }

  /** Streaming dedup: the input is replayed twice (union of the same
    * stream), dropDuplicates restores exactly-once — counts must equal
    * the single-copy batch aggregation. */
  val streamDedup = sql("stream_dedup",
    """SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type""") {
    (s, d) => StreamingJobs.dedupedEventCounts(s, d)
  }

  /** Funnel: per user, signup followed by a purchase within one hour.
    * Window lead over typed events; millisecond integers keep it exact. */
  val funnel = sql("funnel",
    """WITH e AS (
         SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000000 AS ms
         FROM events WHERE event_type IN ('signup', 'purchase')),
       w AS (
         SELECT *, lead(event_type) OVER win AS next_type,
                   lead(ms) OVER win AS next_ms
         FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ms, event_id))
       SELECT user_id, count(*) AS conversions
       FROM w
       WHERE event_type = 'signup' AND next_type = 'purchase'
         AND next_ms - ms <= 3600000
       GROUP BY user_id""") { (s, d) =>
    val win = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    Tables.events(s, d)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("next_type", lead(col("event_type"), 1).over(win))
      .withColumn("next_ms", lead(col("ms"), 1).over(win))
      .filter(col("event_type") === "signup" && col("next_type") === "purchase"
        && col("next_ms") - col("ms") <= 3600000L)
      .groupBy(col("user_id")).agg(count(lit(1)).as("conversions"))
  }

  /** Cohort retention: first-seen day per user (the cohort) × activity
    * day offsets — integer epoch-day arithmetic end to end. */
  val cohortRetention = sql("cohort_retention",
    """WITH e AS (
         SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
       cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
       SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
         count(DISTINCT e.user_id) AS active_users
       FROM e JOIN cohort c ON e.user_id = c.user_id
       GROUP BY c.cohort_day, day_offset""") { (s, d) =>
    val e = Tables.events(s, d)
      // integer div: float division can round up across a day boundary
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      .withColumnRenamed("user_id", "u2")
    e.join(cohort, col("user_id") === col("u2"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** As-of lookup as a query: for each purchase, the user's most recent
    * strictly-prior click (max over a preceding window frame — order-free
    * and so deterministic under ties). The general two-table form is
    * graft.functions.AsOf.joinAsOf. */
  val asofPriorEvent = sql("asof_prior_event",
    """WITH e AS (
         SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000000 AS ms
         FROM events)
       SELECT event_id, prev_click_ms, ms - prev_click_ms AS gap_ms FROM (
         SELECT *, max(CASE WHEN event_type = 'click' THEN ms END) OVER (
           PARTITION BY user_id ORDER BY ms, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ms
         FROM e) t
       WHERE event_type = 'purchase' AND prev_click_ms IS NOT NULL""") { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("prev_click_ms",
        max(when(col("event_type") === "click", col("ms"))).over(w))
      .filter(col("event_type") === "purchase" && col("prev_click_ms").isNotNull)
      .select(col("event_id"), col("prev_click_ms"),
        (col("ms") - col("prev_click_ms")).as("gap_ms"))
  }

  /** Stream-static enrichment (StreamingJobs.staticEnrichedCounts):
    * streamed events broadcast-join the static customer→nation
    * dimension, no stream state — the bounded replay's final table
    * must equal the batch join+aggregate the oracle runs. */
  val streamStaticJoin = sql("stream_static_join",
    """SELECT n.n_name, count(*) AS cnt,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
       FROM events e
       JOIN customer c ON e.user_id = c.c_custkey
       JOIN nation n ON n.n_nationkey = c.c_nationkey
       GROUP BY n.n_name""") { (s, d) =>
    graft.streaming.StreamingJobs.staticEnrichedCounts(s, d)
  }

  /** Streaming decontamination (StreamingJobs.decontaminationHits):
    * streamed documents' 5-grams semi-join the static benchmark gram
    * set (docs ≡ 0 mod 7), per-source hit counts accumulate in the
    * one stateful complete-mode aggregate. The oracle runs the batch
    * equivalent: every non-benchmark gram occurrence that appears in
    * the (distinct) benchmark set counts once. */
  val streamDecontaminate = sql("stream_decontaminate",
    """WITH w AS (
         SELECT doc_id, source,
           list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       g AS (
         SELECT doc_id, source,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' ||
           w[CAST(i AS INT)+2] || ' ' || w[CAST(i AS INT)+3] || ' ' ||
           w[CAST(i AS INT)+4] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-3, 1))) AS i) t
         WHERE len(w) >= 5),
       b AS (SELECT DISTINCT s FROM g WHERE doc_id % 7 = 0)
       SELECT source, count(*) AS n_hits
       FROM g JOIN b USING (s)
       WHERE g.doc_id % 7 <> 0
       GROUP BY source""") { (s, d) =>
    graft.streaming.StreamingJobs.decontaminationHits(s, d)
  }

  /** Streaming ingestion dedup (StreamingJobs.streamingIncrementalDedup):
    * the stream of incoming docs (doc_id % 4 = 0) deduped per
    * micro-batch against the static indexed corpus through the exact
    * batch operator inside foreachBatch — so the oracle is
    * `dedup_incremental`'s SQL verbatim: streaming and batch answers
    * are identical by construction (AvailableNow delivers the file as
    * one batch; an unbounded deployment adds only more batches, each
    * idempotently overwriting its own batch_id partition). */
  val streamIncrementalDedup = sql("stream_incremental_dedup",
    """WITH w AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-1, 1))) AS i) t),
       hs AS (
         SELECT doc_id, i,
           min(md5(concat(CAST(i AS VARCHAR), ':', s))) AS mh
         FROM sh, LATERAL (SELECT unnest(range(0, 12)) AS i) t
         GROUP BY doc_id, i),
       bands AS (
         SELECT doc_id, i // 3 AS band, md5(string_agg(mh, '|' ORDER BY i)) AS sig
         FROM hs GROUP BY doc_id, band),
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       cand AS (
         SELECT DISTINCT b.doc_id AS bdoc, c.doc_id AS cdoc
         FROM bands b JOIN bands c ON b.band = c.band AND b.sig = c.sig
         WHERE b.doc_id % 4 = 0 AND c.doc_id % 4 <> 0),
       com AS (
         SELECT cd.bdoc, cd.cdoc, count(*) AS common
         FROM cand cd JOIN sh a ON a.doc_id = cd.bdoc
                      JOIN sh b ON b.doc_id = cd.cdoc AND b.s = a.s
         GROUP BY 1, 2),
       crossdup AS (
         SELECT bdoc, min(cdoc) AS cdup FROM com
         JOIN sz x ON x.doc_id = bdoc JOIN sz y ON y.doc_id = cdoc
         WHERE 5 * common >= 4 * (x.n + y.n - common) GROUP BY 1),
       bcand AS (
         SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         WHERE a.doc_id % 4 = 0 AND b.doc_id % 4 = 0),
       bcom AS (
         SELECT c.d1, c.d2, count(*) AS common
         FROM bcand c JOIN sh a ON a.doc_id = c.d1
                      JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
         GROUP BY 1, 2),
       bdup AS (
         SELECT d2, min(d1) AS bfirst FROM bcom
         JOIN sz x ON x.doc_id = d1 JOIN sz y ON y.doc_id = d2
         WHERE 5 * common >= 4 * (x.n + y.n - common) GROUP BY 1)
       SELECT d.doc_id,
         CASE WHEN cd.cdup IS NOT NULL THEN 'corpus_dup'
              WHEN bd.bfirst IS NOT NULL THEN 'batch_dup'
              ELSE 'new' END AS status,
         CAST(coalesce(cd.cdup, bd.bfirst, -1) AS BIGINT) AS dup_of
       FROM documents d
       LEFT JOIN crossdup cd ON cd.bdoc = d.doc_id
       LEFT JOIN bdup bd ON bd.d2 = d.doc_id
       WHERE d.doc_id % 4 = 0""") { (s, d) =>
    val dir = sys.props("java.io.tmpdir") + "/graft_stream_incr_" +
      java.util.UUID.randomUUID().toString
    graft.streaming.StreamingJobs.streamingIncrementalDedup(s, d, dir)
  }

  /** Streaming substring-tier ingestion dedup
    * (StreamingJobs.streamingSubstrDedup): the winnowing-anchor batch
    * operator per micro-batch against the static anchor-gram index;
    * streaming == batch by construction, so the oracle is
    * `substr_incremental_dedup`'s SQL verbatim (see
    * DataPipelineQueries7 for the semantics). */
  val streamSubstrDedup = sql("stream_substr_dedup",
    DataPipelineQueries7.SubstrIncrementalOracle) { (s, d) =>
    val dir = sys.props("java.io.tmpdir") + "/graft_stream_substr_" +
      java.util.UUID.randomUUID().toString
    graft.streaming.StreamingJobs.streamingSubstrDedup(s, d, dir)
  }

  /** STREAMING serving-mode curation
    * (StreamingJobs.streamingCuration): the full priority-ordered
    * keep/drop/redact decision per micro-batch against the frozen
    * ServingIndex, with ALL stateful tiers folded across micro-batches
    * (content hashes, shingles, anchor grams) so labels are
    * batch-split-invariant; streaming == batch by construction and the
    * oracle is `incremental_curation`'s SQL verbatim. */
  val streamCuration = sql("stream_curation",
    DataPipelineQueries8.IncrementalCurationOracle) { (s, d) =>
    val dir = sys.props("java.io.tmpdir") + "/graft_stream_curation_" +
      java.util.UUID.randomUUID().toString
    graft.streaming.StreamingJobs.streamingCuration(s, d, dir,
      DataPipelineQueries8.capstoneConfig)
  }

  /** DURABLE streaming curation with a mid-ingest CRASH AND RESTART
    * (StreamingJobs.streamingCurationDurable): the ingest is staged as
    * TWO ordered micro-batch files; the frozen ServingIndex persists
    * as KeyedTables; run 1 commits batch 0, then batch 1 writes its
    * output, folds its state, and dies BEFORE its checkpoint commit
    * (the worst crash point — everything half applied); run 2 LOADS
    * the persisted index (no rebuild, no re-train) and re-runs batch 1
    * under the same id (the idempotent writer overwrites its own
    * partition; the batch-id-stamped state fold upserts its own rows —
    * a no-op) against batch 0's durably folded prior. Decisions must
    * equal the one-shot serving run: the oracle is the serving SQL
    * over the mod-8 ingest slice, so this row proves
    * restart-invariance end to end, not just batch-split-invariance.
    * (StreamingSpec runs the wider THREE-file variant, where a fresh
    * post-crash batch also labels against the durable prior.) */
  val streamCurationResume = sql("stream_curation_resume",
    // the mod-8 SLICE of the batch side plays the ingest (restart
    // invariance needs real batches and a real crash, not a large
    // ingest — StreamingSpec runs the wider 3-file variant); corpus
    // and serving semantics are unchanged
    DataPipelineQueries8.incrementalCurationOracleFor("% 8 = 0")) { (s, d) =>
    val base = sys.props("java.io.tmpdir") + "/graft_stream_resume_" +
      java.util.UUID.randomUUID().toString
    val cfg = DataPipelineQueries8.capstoneConfig
    // the frozen index persists ACROSS invocations, keyed by the
    // corpus's identity (path + file size + mtime): the first
    // invocation builds and saves it; every later one LOADS it — the
    // production restart shape, and the bench's second run prices
    // pure index-load ingest instead of re-paying the one-time build
    // key = corpus identity (path + per-FILE parquet sizes/mtimes —
    // File.length() on a directory is meaningless) + the index-build
    // CODE version, so editing build/classifier logic invalidates the
    // cache instead of silently serving a stale index
    val docsDir = new java.io.File(s"$d/documents.parquet")
    val parts = Option(docsDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(",")
    val corpusId = java.security.MessageDigest.getInstance("MD5")
      .digest(
        s"$d:${graft.streaming.ServingState.IndexCodeVersion}:$parts"
          .getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val sharedIndexDir = sys.props("java.io.tmpdir") +
      s"/graft_resume_index_$corpusId"
    graft.streaming.StreamingJobs.stageIngestFiles(s, d,
      s"$base/staging", nFiles = 2, batchMod = 8L)
    // run 1: batch 0 commits; batch 1 writes output + folds state,
    // then dies before its checkpoint commit
    graft.streaming.StreamingJobs.streamingCurationDurable(s, d,
      s"$base/out", s"$base/state", s"$base/staging", cfg,
      failAt = Some(1L), indexDirOpt = Some(sharedIndexDir))
    // run 2: index-load + ingest-resume — batch 1 re-runs under the
    // same id against batch 0's durably folded prior
    graft.streaming.StreamingJobs.streamingCurationDurable(s, d,
      s"$base/out", s"$base/state", s"$base/staging", cfg,
      indexDirOpt = Some(sharedIndexDir))
  }

  /** STREAMING CDF INGESTION (StreamingJobs.streamingCdfIngest): a
    * versioned base table absorbs micro-batches of late orders while a
    * per-customer (count, cents) materialized view advances by
    * consuming only each commit's change-data-feed. Split-invariant
    * and state-layer idempotent (a replayed batch's re-upsert yields
    * an empty CDF), so the oracle is the plain aggregate over the
    * whole relation — any double-applied or missed delta breaks the
    * exact integer sums. */
  val streamCdfIngest = sql("stream_cdf_ingest",
    """SELECT o_custkey AS g, count(*) AS cnt,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
         AS BIGINT) AS total
       FROM orders GROUP BY o_custkey""") { (s, d) =>
    val dir = sys.props("java.io.tmpdir") + "/graft_stream_cdf_" +
      java.util.UUID.randomUUID().toString
    graft.streaming.StreamingJobs.streamingCdfIngest(s, d, dir)
  }

  /** The same CDF-ingest pipeline under a mid-ingest CRASH AND
    * RESTART: run 1 dies after micro-batch 1's base commit but before
    * its view refresh (base and view disagree at the crash point);
    * run 2 resumes off the streaming checkpoint — the replayed batch
    * re-upserts into an empty-change version and the view catches up
    * from its own durably stamped watermark. The oracle is the same
    * plain aggregate: any double-applied or dropped span breaks the
    * exact counts. */
  val streamCdfResume = sql("stream_cdf_resume",
    """SELECT o_custkey AS g, count(*) AS cnt,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
         AS BIGINT) AS total
       FROM orders GROUP BY o_custkey""") { (s, d) =>
    val dir = sys.props("java.io.tmpdir") + "/graft_stream_cdf_rs_" +
      java.util.UUID.randomUUID().toString
    graft.streaming.StreamingJobs.streamingCdfIngest(s, d, dir,
      failAt = Some(1L))
    graft.streaming.StreamingJobs.streamingCdfIngest(s, d, dir)
  }

  /** Streaming media ingest with REAL sample-level decode
    * (StreamingJobs.streamingMediaDecode): micro-batches synthesize
    * and fully decode PCM-16 WAVs (every int16 sample read back),
    * folded into per-(channels, sample_rate) corpus audio stats by a
    * complete-mode aggregate whose state is bounded by the key space.
    * Decode is stateless, so streaming == batch by construction and
    * the oracle replays the batch arithmetic of `audio_pcm_stats`
    * grouped one level up. */
  val streamMediaDecode = sql("stream_media_decode",
    """WITH p AS (
         SELECT doc_id,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
           (120 + doc_id % 37) * (1 + doc_id % 2) AS n
         FROM documents),
       s AS (
         SELECT doc_id, channels, sample_rate, n,
           ((doc_id * 131 + i * 17) % 65536) - 32768 AS v
         FROM p, LATERAL (SELECT unnest(range(0, n)) AS i) t),
       d AS (
         SELECT doc_id, channels, sample_rate, max(n) AS ns,
           sum(abs(v)) AS sa, max(abs(v)) AS pk
         FROM s GROUP BY 1, 2, 3)
       SELECT channels, sample_rate, count(*) AS n_docs,
         CAST(sum(ns) AS BIGINT) AS total_samples,
         CAST(sum(sa) AS BIGINT) AS total_sum_abs,
         CAST(max(pk) AS BIGINT) AS max_peak
       FROM d GROUP BY 1, 2""") { (s, d) =>
    graft.streaming.StreamingJobs.streamingMediaDecode(s, d)
  }

  /** STREAM-STREAM AS-OF JOIN (StreamingJobs.streamingAsOfJoin): view
    * events enriched with the user's latest prior purchase while BOTH
    * sides arrive as time-ordered micro-batches — the temporal join
    * Spark's stream-stream joins cannot express (latest-prior is an
    * argmax, not a range). Matching is watermark-finalized per key via
    * event-time timers, so only lefts the FINAL watermark passed
    * (max event time − 1 h) emit — the cutoff the oracle replays with
    * DuckDB's ASOF LEFT JOIN over the same µs arithmetic (watermarks
    * truncate to ms, hence the //1000*1000). Equal-time purchases
    * tie-break by max cents on both engines. A dropped carry row, a
    * double-fired timer, or a batch-boundary-dependent match would all
    * break the hash. */
  val streamAsOfJoin = sql("stream_asof_join",
    """WITH e AS (
         SELECT user_id, event_id, event_type,
           epoch_ns(ts) // 1000 AS ms,
           CAST(round(value * 100) AS BIGINT) AS cents
         FROM events WHERE event_type IN ('view', 'purchase')),
       cut AS (SELECT (max(ms) // 1000 - 3600000) * 1000 AS c FROM e),
       l AS (SELECT user_id, event_id, ms FROM e
             WHERE event_type = 'view'),
       r AS (SELECT user_id, ms AS rt, max(cents) AS cents FROM e
             WHERE event_type = 'purchase' GROUP BY 1, 2)
       SELECT l.user_id, l.event_id, l.ms,
         r.cents AS asof_cents, r.rt AS asof_ms
       FROM l ASOF LEFT JOIN r
         ON l.user_id = r.user_id AND l.ms >= r.rt
       WHERE l.ms < (SELECT c FROM cut)""") { (s, d) =>
    val staging = sys.props("java.io.tmpdir") + "/graft_stream_asof_" +
      java.util.UUID.randomUUID().toString
    StreamingJobs.streamingAsOfJoin(s, d, staging)
  }

  /** The streaming as-of join under a TOLERANCE bound (pandas
    * merge_asof parity, the streaming face of `join_asof_tolerance`):
    * purchases staler than 6 hours null out at finalization — an
    * exact-µs post-match projection, so the state machine and the
    * watermark contract are unchanged and the oracle adds one WHERE
    * over the same ASOF LEFT JOIN. */
  val streamAsOfTolerance = sql("stream_asof_tolerance",
    """WITH e AS (
         SELECT user_id, event_id, event_type,
           epoch_ns(ts) // 1000 AS ms,
           CAST(round(value * 100) AS BIGINT) AS cents
         FROM events WHERE event_type IN ('view', 'purchase')),
       cut AS (SELECT (max(ms) // 1000 - 3600000) * 1000 AS c FROM e),
       l AS (SELECT user_id, event_id, ms FROM e
             WHERE event_type = 'view'),
       r AS (SELECT user_id, ms AS rt, max(cents) AS cents FROM e
             WHERE event_type = 'purchase' GROUP BY 1, 2)
       SELECT l.user_id, l.event_id, l.ms,
         CASE WHEN l.ms - r.rt <= 21600000000 THEN r.cents END
           AS asof_cents,
         CASE WHEN l.ms - r.rt <= 21600000000 THEN r.rt END AS asof_ms
       FROM l ASOF LEFT JOIN r
         ON l.user_id = r.user_id AND l.ms >= r.rt
       WHERE l.ms < (SELECT c FROM cut)""") { (s, d) =>
    val staging = sys.props("java.io.tmpdir") + "/graft_stream_asoft_" +
      java.util.UUID.randomUUID().toString
    StreamingJobs.streamingAsOfJoin(s, d, staging,
      toleranceUs = Some(21600000000L)) // 6 hours in µs
  }

  /** Stream-stream LEFT OUTER join (StreamingJobs.signupPurchaseLeftOuter):
    * signups matched to a purchase within the following hour, PLUS
    * null-extended rows for signups the engine can PROVE will never
    * match — emitted when the watermark (min of both sides' max event
    * time − 2 h, ms-truncated) passes the signup's one-hour join
    * window. The oracle replays both tiers: every matched pair, and
    * unmatched signups whose window end sits strictly below the final
    * watermark. The continuously-computable "did not convert" set a
    * batch join can only produce after the fact. */
  val streamJoinOuter = sql("stream_join_outer",
    """WITH s AS (
         SELECT user_id, event_id AS signup_event,
           epoch_ns(ts) // 1000 AS s_us
         FROM events WHERE event_type = 'signup'),
       p AS (
         SELECT user_id, event_id AS purchase_event,
           epoch_ns(ts) // 1000 AS p_us
         FROM events WHERE event_type = 'purchase'),
       wm AS (
         SELECT least((SELECT max(s_us) // 1000 FROM s),
                      (SELECT max(p_us) // 1000 FROM p))
                - 7200000 AS w),
       m AS (
         SELECT s.user_id, s.signup_event, p.purchase_event, s.s_us
         FROM s JOIN p ON s.user_id = p.user_id
           AND p.p_us >= s.s_us AND p.p_us < s.s_us + 3600000000)
       SELECT user_id, signup_event, purchase_event, s_us FROM m
       UNION ALL
       SELECT s.user_id, s.signup_event,
         CAST(NULL AS BIGINT) AS purchase_event, s.s_us
       FROM s
       WHERE NOT EXISTS (SELECT 1 FROM p
           WHERE p.user_id = s.user_id
             AND p.p_us >= s.s_us AND p.p_us < s.s_us + 3600000000)
         AND s.s_us // 1000 + 3600000 < (SELECT w FROM wm)""") { (s, d) =>
    StreamingJobs.signupPurchaseLeftOuter(s, d)
  }

  /** THE CDF AS A NATIVE STREAMING SOURCE (sinks.v2.CdfSource): a
    * versioned table consumed with `spark.readStream` — commit
    * versions are the offsets, each commit's captured change files
    * are its micro-batch partitions, and Spark's checkpoint gives
    * exactly-once CDC (the Delta readStream contract, reduced to the
    * store's manifest). The history commits an upsert (updates +
    * inserts) and a delete; the stream drains through a parquet sink
    * and the oracle recomputes every commit's classified diff
    * relationally WITH its `_commit_version` — a dropped partition,
    * a replayed span, or a mis-typed null (`*_prev` on inserts, new
    * values on deletes) breaks the hash. */
  val streamCdfSource = sql("stream_cdf_source",
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
    import graft.sinks.VersionedKeyedTable
    val base = sys.props("java.io.tmpdir") + "/graft_cdfsrc_" +
      java.util.UUID.randomUUID().toString
    val dir = s"$base/table"
    val rows = graft.core.Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.filter(col("k") % 3 =!= 2),
        dir, "k", numBuckets = 4)
    }
    // v2: the late slice inserts; on-time %10=1 rows get doubled
    VersionedKeyedTable.upsert(s, dir,
      rows.filter(col("k") % 3 === 2)
        .unionByName(rows.filter(col("k") % 3 =!= 2 && col("k") % 10 === 1)
          .withColumn("cents", col("cents") * 2)), "k")
    // v3: a purge of %7 keys (current state)
    VersionedKeyedTable.delete(s, dir,
      VersionedKeyedTable.read(s, dir)
        .filter(col("k") % 7 === 0).select(col("k")), "k")
    val q = s.readStream.format("graft.sinks.v2.CdfSource")
      .option("path", dir).option("keyCol", "k")
      .option("startingVersion", "1")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    // materialize off the temp dirs, then reclaim them — a leaked
    // UUID dir per run otherwise accumulates across bench/test
    // invocations (the StreamingJobs.stageKeyedSlices cleanup rule)
    val out = s.read.parquet(s"$base/out")
      .select(col("k"), col("change_type"), col("g"), col("cents"),
        col("g_prev"), col("cents_prev"), col("_commit_version"))
      .localCheckpoint(true)
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true): Unit
    out
  }

  /** THE VERSIONED STORE AS A NATIVE STREAMING SINK
    * (sinks.v2.VersionedTableSink): `writeStream` lands each
    * micro-batch as ONE keyed upsert commit, exactly-once through the
    * epoch stamp in the table's own commit metadata (the Delta
    * txnAppId/txnVersion idempotent-write contract). Four staged
    * micro-batches — three disjoint key slices and a LAST correction
    * batch that re-puts every %10=1 key doubled — must leave exactly
    * the last-write-wins keyed state and exactly four commits (the
    * in-row require: a replayed or split epoch changes the commit
    * count even when puts hide it). Oracle = the final state
    * relationally. */
  val streamSinkVersioned = sql("stream_sink_versioned",
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey % 3 <> 0)
       SELECT k, g,
         CASE WHEN k % 10 = 1 THEN cents * 2 ELSE cents END AS cents
       FROM base""") { (s, d) =>
    import graft.sinks.VersionedKeyedTable
    val base = sys.props("java.io.tmpdir") + "/graft_vsink_" +
      java.util.UUID.randomUUID().toString
    val staging = s"$base/staging"
    val table = s"$base/table"
    val rows = graft.core.Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
      .filter(col("k") % 3 =!= 0)
    graft.streaming.StreamingJobs.stageKeyedSlices(
      s, rows, "k", staging, nFiles = 3)
    // the correction arrives LAST (strictly later mtime): re-puts of
    // %10=1 keys at doubled cents — last-write-wins must hold
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
      .option("numBuckets", "4")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val nv = VersionedKeyedTable.completeVersions(s, table).size
    require(nv == 4,
      s"four micro-batches must land as exactly four commits (got $nv)")
    // materialize, then reclaim the run's temp table/staging/ckpt dirs
    val out = VersionedKeyedTable.read(s, table)
      .select(col("k"), col("g"), col("cents"))
      .localCheckpoint(true)
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true): Unit
    out
  }

  /** STREAMING IVM: the maintained (cnt, total, mn, mx) view kept in
    * step with a LIVE change feed — the CDF stream (admission-
    * controlled to one commit per micro-batch) is the TRIGGER, and
    * each foreachBatch invocation runs the view's crash-safe catch-up
    * off its own durable watermark. The two exactly-once mechanisms
    * compose instead of fighting: the stream's checkpoint makes
    * triggering at-least-once across restarts, the view's
    * per-span stamps make the refresh idempotent — a replayed batch
    * finds the watermark already advanced and no-ops. At 100 TB this
    * is the standing dashboard: commits land on the base table from
    * anywhere (batch upserts, the streaming sink, SQL DML), and the
    * view follows within a trigger without ever re-reading the base.
    * In-row requires pin that the view's watermark reached the base's
    * latest version THROUGH the stream (no manual refresh call). */
  val streamIvmRefresh = sql("stream_ivm_refresh",
    """WITH m AS (
         SELECT o_orderkey AS k, o_custkey AS g,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS cents
         FROM orders),
       f AS (SELECT * FROM m WHERE k % 7 <> 0)
       SELECT g, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS total,
         min(cents) AS mn, max(cents) AS mx,
         CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg
       FROM f GROUP BY g""") { (s, d) =>
    import graft.sinks.{IncrementalView, VersionedKeyedTable}
    val base = sys.props("java.io.tmpdir") + "/graft_ivmstream_" +
      java.util.UUID.randomUUID().toString
    val baseDir = s"$base/table"
    val viewDir = s"$base/view"
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("g"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
    graft.BenchProbe.time("index_build") {
      VersionedKeyedTable.create(rows.filter(col("k") % 3 =!= 2),
        baseDir, "k", numBuckets = 4)
      IncrementalView.createFromFull(
        s, baseDir, viewDir, "g", "cents", numBuckets = 4): Unit
    }
    // commits the view has NOT seen: the late slice (insert tier) and
    // a purge that takes group extrema with it (re-derive tier)
    VersionedKeyedTable.upsert(s, baseDir,
      rows.filter(col("k") % 3 === 2), "k")
    VersionedKeyedTable.delete(s, baseDir,
      VersionedKeyedTable.read(s, baseDir)
        .filter(col("k") % 7 === 0).select(col("k")), "k")
    val q = s.readStream.format("graft.sinks.v2.CdfSource")
      .option("path", baseDir).option("keyCol", "k")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "1") // one commit per batch
      .load()
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        // the batch IS the signal; the refresh walks the lineage off
        // the view's durable watermark (idempotent under replay)
        IncrementalView.refreshFromCommittedFull(
          s, baseDir, viewDir, "k", "g", "cents"): Unit
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val latest = VersionedKeyedTable.completeVersions(s, baseDir).max
    require(IncrementalView.committedWatermark(s, viewDir) == latest,
      "the stream-triggered refreshes must carry the view to the " +
        "base's latest version")
    val out = VersionedKeyedTable.read(s, viewDir)
      .select(col("g"), col("cnt"), col("total"), col("mn"), col("mx"),
        (col("total").cast("double") / col("cnt").cast("double"))
          .as("avg"))
      .localCheckpoint(true)
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true): Unit
    out
  }

  val all: Seq[QueryDef] = Seq(streamWindowAgg, streamSlidingWindow,
    streamAsOfJoin, streamAsOfTolerance, streamJoinOuter,
    streamJoin, sessionize, sessionWindowNative, streamSessionWindow,
    streamDedup, funnel, cohortRetention, asofPriorEvent,
    streamStaticJoin, streamDecontaminate, streamIncrementalDedup,
    streamSubstrDedup, streamMediaDecode, streamCuration,
    streamCurationResume, streamCdfIngest, streamCdfResume,
    streamCdfSource, streamSinkVersioned, streamIvmRefresh)
}
