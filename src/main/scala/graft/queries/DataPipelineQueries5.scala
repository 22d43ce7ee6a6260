package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.{Layout, TextDedup}

/** Round-4 continuation: corpus-curation and table-maintenance
  * operators a 100 TB training-data pipeline runs that the earlier
  * batches don't cover — single-pass column profiling (data-quality
  * audit), cross-source n-gram overlap, mixture rebalancing,
  * Z-order layout keys, heavy-hitter skew diagnosis, compaction
  * planning, deterministic global training shuffle, and a
  * rare-n-gram quality filter.
  */
object DataPipelineQueries5 {
  import QueryDef._

  /** Column profile (the data-quality audit a pipeline runs before
    * training): per column, null count, exact distinct count, and
    * min/max rendered portably as strings. Two branches by design:
    * nulls/min/max all come off ONE no-grouping pass (string min/max
    * put a string in the aggregation buffer, which forces sort-based
    * aggregation — harmless without grouping keys, but fatal if mixed
    * into the Expand branch), while the four exact distinct counts
    * share ONE Expand + HashAggregate pass (all-numeric buffers). A
    * single combined statement plans as SortAggregate over the 5×
    * expanded rows — measured ~4× slower than this split shape when
    * the query landed (r4); the split shape's intrinsic cost is
    * ~1.0 s at sf0.1 (r7 standalone re-run).
    * The 100 TB variant swaps `countDistinct` for
    * `approx_count_distinct` (no Expand at all — see
    * `agg_approx_distinct`), exactness kept here for the oracle.
    * Doubles go through DECIMAL(18,2) so both engines print "1.00". */
  val profileColumns = sql("profile_columns",
    """SELECT 'l_orderkey' AS col_name,
         count(*) - count(l_orderkey) AS n_nulls,
         count(DISTINCT l_orderkey) AS n_distinct,
         CAST(min(l_orderkey) AS VARCHAR) AS min_s,
         CAST(max(l_orderkey) AS VARCHAR) AS max_s
       FROM lineitem
       UNION ALL
       SELECT 'l_quantity',
         count(*) - count(l_quantity),
         count(DISTINCT l_quantity),
         CAST(CAST(min(l_quantity) AS DECIMAL(18,2)) AS VARCHAR),
         CAST(CAST(max(l_quantity) AS DECIMAL(18,2)) AS VARCHAR)
       FROM lineitem
       UNION ALL
       SELECT 'l_returnflag',
         count(*) - count(l_returnflag),
         count(DISTINCT l_returnflag),
         min(l_returnflag), max(l_returnflag)
       FROM lineitem
       UNION ALL
       SELECT 'l_shipdate',
         count(*) - count(l_shipdate),
         count(DISTINCT l_shipdate),
         strftime(min(l_shipdate), '%Y-%m-%d'),
         strftime(max(l_shipdate), '%Y-%m-%d')
       FROM lineitem""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val stats = li.agg(
      (count(lit(1)) - count(col("l_orderkey"))).as("ok_nulls"),
      min(col("l_orderkey")).cast("string").as("ok_min"),
      max(col("l_orderkey")).cast("string").as("ok_max"),
      (count(lit(1)) - count(col("l_quantity"))).as("qt_nulls"),
      min(col("l_quantity")).cast("decimal(18,2)").cast("string").as("qt_min"),
      max(col("l_quantity")).cast("decimal(18,2)").cast("string").as("qt_max"),
      (count(lit(1)) - count(col("l_returnflag"))).as("rf_nulls"),
      min(col("l_returnflag")).as("rf_min"),
      max(col("l_returnflag")).as("rf_max"),
      (count(lit(1)) - count(col("l_shipdate"))).as("sd_nulls"),
      date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("sd_min"),
      date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("sd_max"))
    val dist = li.agg(
      countDistinct(col("l_orderkey")).as("ok_dist"),
      countDistinct(col("l_quantity")).as("qt_dist"),
      countDistinct(col("l_returnflag")).as("rf_dist"),
      countDistinct(col("l_shipdate")).as("sd_dist"))
    val agg = stats.crossJoin(broadcast(dist))
    agg.selectExpr(
      """stack(4,
           'l_orderkey',  ok_nulls, ok_dist, ok_min, ok_max,
           'l_quantity',  qt_nulls, qt_dist, qt_min, qt_max,
           'l_returnflag', rf_nulls, rf_dist, rf_min, rf_max,
           'l_shipdate',  sd_nulls, sd_dist, sd_min, sd_max)
         AS (col_name, n_nulls, n_distinct, min_s, max_s)""")
  }

  /** Cross-source corpus overlap: for every pair of sources, how many
    * distinct word-3-grams they share, alongside each side's distinct
    * gram count — the contamination/diversity matrix a curator reads
    * before mixing corpora. ONE shuffle total: grams aggregate to
    * their distinct source set (`collect_set` dedups in the same
    * pass, bounded by the source count), per-source sizes fall out of
    * the same relation by re-exploding it, and pair generation
    * touches only grams shared by ≥ 2 sources — the overwhelmingly
    * unique rest never fans out. At web scale (millions of domains)
    * you cap the set size or restrict to the top-K domains first. */
  val corpusOverlap = sql("corpus_overlap",
    """WITH w AS (
         SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       sh AS (
         SELECT DISTINCT source,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-1, 1))) AS i) t),
       pairs AS (
         SELECT a.source AS src_a, b.source AS src_b, count(*) AS common
         FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
         GROUP BY 1, 2),
       sz AS (SELECT source, count(*) AS n FROM sh GROUP BY 1)
       SELECT src_a, src_b, common, x.n AS n_a, y.n AS n_b
       FROM pairs JOIN sz x ON x.source = src_a JOIN sz y ON y.source = src_b""") { (s, d) =>
    // eager localCheckpoint, not persist(): a persisted-but-never-
    // unpersisted relation leaks cached partitions for the rest of a
    // 193-query run; checkpoint blocks are reclaimed by the
    // ContextCleaner once this query's DataFrames go unreachable
    val srcs = TextDedup.ngrams(Tables.documents(s, d), idCol = "source")
      .groupBy(col("s")).agg(collect_set(col("source")).as("ss"))
      .localCheckpoint(true)
    val sz = srcs.select(explode(col("ss")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = srcs.where(size(col("ss")) >= 2)
      .select(explode(col("ss")).as("src_a"), col("ss"))
      .select(col("src_a"), explode(col("ss")).as("src_b"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(broadcast(sz.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sz.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("common"), col("n_a"), col("n_b"))
  }

  /** Mixture rebalancing: downsample over-represented sources to a
    * uniform target share with a deterministic content-hash coin.
    * The per-source keep probability becomes a 16-bit threshold
    * compared against the first 4 hex chars of md5(doc_id) — the
    * reproducible, engine-portable form of weighted sampling (same
    * idiom as `sample_hash`, finer granularity). Per-source weights
    * are a tiny broadcast; the corpus side is one codegen'd scan —
    * exactly the plan a 100 TB mixture pass wants. */
  val mixRebalance = sql("mix_rebalance",
    """WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       tot AS (SELECT CAST(count(*) AS DOUBLE) AS nt,
                      CAST(count(DISTINCT source) AS DOUBLE) AS ns
               FROM documents),
       thr AS (
         SELECT source,
           CAST(floor(65536.0 * nt / ns / n) AS BIGINT) AS t16
         FROM cnt, tot)
       SELECT d.source AS source, count(*) AS n_kept
       FROM documents d JOIN thr ON thr.source = d.source
       WHERE thr.t16 >= 65536
          OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', thr.t16)
       GROUP BY d.source""") { (s, d) =>
    val docs = Tables.documents(s, d)
    val cnt = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val tot = docs.agg(
      count(lit(1)).cast("double").as("nt"),
      countDistinct(col("source")).cast("double").as("ns"))
    val thr = cnt.crossJoin(broadcast(tot))
      .select(col("source"),
        floor(lit(65536.0) * col("nt") / col("ns") / col("n")).as("t16"))
    docs.join(broadcast(thr), "source")
      .where(col("t16") >= 65536 ||
        substring(md5(col("doc_id").cast("string")), 1, 4) <
          format_string("%04x", col("t16")))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
  }

  /** Z-order layout audit: cluster events on the Morton interleave of
    * two independent dimensions and show that every resulting "file"
    * (16 equal run-length slices of the z-sorted order) carries tight
    * min/max bounds on BOTH dimensions — the property that makes
    * parquet row-group pruning work for 2-D predicates. File
    * boundaries come from `Layout.globalRowNumber` — a PARALLEL
    * range-partitioned sort + zipWithIndex (`floor(rn*16/n)` slices) —
    * the same pass a production `repartitionByRange(zkey) +
    * sortWithinPartitions + write` runs; no single-partition window
    * anywhere (that was the one benched plan here that could not
    * survive a 100× scale-up). The oracle replays the identical
    * boundary arithmetic on a row_number window (DuckDB side only —
    * oracle scale is not a concern). */
  val zorderLayout = sql("zorder_layout",
    s"""WITH z AS (
         SELECT event_id, user_id % 256 AS x, event_id % 256 AS y
         FROM events),
       zk AS (
         SELECT event_id, x, y, ${Layout.zkeySql("x", "y", 8)} AS zkey
         FROM z),
       n AS (SELECT count(*) AS n_tot FROM zk),
       f AS (
         SELECT x, y, CAST(
           ((row_number() OVER (ORDER BY zkey, event_id) - 1) * 16) // n_tot
           AS INTEGER) + 1 AS file_id
         FROM zk, n)
       SELECT file_id, count(*) AS n,
         CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
         CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
       FROM f GROUP BY file_id""") { (s, d) =>
    val z = Tables.events(s, d).select(
        col("event_id"),
        (col("user_id") % 256).as("x"),
        (col("event_id") % 256).as("y"))
      .withColumn("zkey", Layout.zkey(col("x"), col("y"), 8))
    val withRn = Layout.globalRowNumber(z, col("zkey"), col("event_id"))
    withRn.crossJoin(broadcast(z.agg(count(lit(1)).as("n_tot"))))
      .select((expr("(rn * 16) div n_tot") + 1).cast("int").as("file_id"),
        col("x"), col("y"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }

  /** Heavy-hitter / skew diagnosis: the top-10 keys by frequency with
    * their share of all rows — what you run before choosing a salting
    * factor for a skewed join key. One hash aggregate + a broadcast
    * scalar + TakeOrderedAndProject (no global sort). The sketch
    * variant for when even the key-count relation is too big —
    * count-min estimates, error ≤ εN — is pinned against this exact
    * answer in LayoutSpec. */
  val heavyHitters = sql("heavy_hitters",
    """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
       t AS (SELECT CAST(count(*) AS DOUBLE) AS tot FROM events)
       SELECT user_id, cnt, cnt / tot AS share
       FROM c, t ORDER BY cnt DESC, user_id LIMIT 10""") { (s, d) =>
    val ev = Tables.events(s, d)
    val c = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val t = ev.agg(count(lit(1)).cast("double").as("tot"))
    c.crossJoin(broadcast(t))
      .select(col("user_id"), col("cnt"), (col("cnt") / col("tot")).as("share"))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(10)
  }

  /** Compaction planning: assign per-source byte totals (the stand-in
    * for a small-file listing) to 4 target bins by cumulative share —
    * the greedy contiguous bin-packing a table-maintenance job runs
    * before rewriting small files. File listings are metadata-scale
    * (millions of rows for a 100 TB table), so the single-partition
    * running-sum window is the right plan — the data itself is never
    * touched until the rewrite executes the plan. */
  val compactionPlan = sql("compaction_plan",
    """WITH f AS (
         SELECT source, CAST(sum(n_chars) AS BIGINT) AS bytes
         FROM documents GROUP BY 1),
       t AS (SELECT CAST(sum(bytes) AS DOUBLE) AS tot FROM f),
       o AS (
         SELECT source, bytes,
           CAST(sum(bytes) OVER (ORDER BY source) - bytes AS DOUBLE) AS cumb
         FROM f)
       SELECT source, bytes, CAST(floor(cumb * 4.0 / tot) AS BIGINT) AS bin
       FROM o, t""") { (s, d) =>
    val f = Tables.documents(s, d)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("bytes"))
    val t = f.agg(sum(col("bytes")).cast("double").as("tot"))
    val w = Window.orderBy(col("source"))
    f.withColumn("cumb", (sum(col("bytes")).over(w) - col("bytes")).cast("double"))
      .crossJoin(broadcast(t))
      .select(col("source"), col("bytes"),
        floor(col("cumb") * 4.0 / col("tot")).as("bin"))
  }

  /** Deterministic global training shuffle: order the corpus by
    * md5(doc_id) (a reproducible pseudo-random permutation), attach a
    * global rank with the distributed `Layout.globalRowNumber` (range
    * repartition + zipWithIndex — never a single-partition window),
    * and deal rows round-robin into 8 training shards. The check
    * aggregates per-shard count / id-sum / first-rank so the oracle
    * pins the exact permutation. */
  val corpusShuffle = sql("corpus_shuffle",
    """WITH r AS (
         SELECT doc_id, row_number() OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rn
         FROM documents)
       SELECT rn % 8 AS shard, count(*) AS n,
         CAST(sum(doc_id) AS BIGINT) AS id_sum,
         CAST(min(rn) AS BIGINT) AS first_rn
       FROM r GROUP BY 1""") { (s, d) =>
    val keyed = Tables.documents(s, d)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("k"))
    Layout.globalRowNumber(keyed, col("k"), col("doc_id"))
      .select(col("doc_id"), (col("rn") % 8).as("shard"), col("rn"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        min(col("rn")).as("first_rn"))
  }

  /** Rare-n-gram quality filter (the integer-exact cousin of a
    * perplexity filter à la CCNet): a document whose bigrams are
    * mostly corpus-rare (frequency ≤ 2) is flagged as likely noise.
    * Two shuffles total — the bigram frequency aggregate and the
    * join-back + per-doc aggregate; at 100 TB the frequency relation
    * is pruned to rare grams only and bloom-pruned map-side (see
    * `decontaminate_bloom`) before the join. Integer counts, no
    * float-sum ordering hazard. */
  val qualityRareNgram = sql("quality_rare_ngram",
    """WITH w AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       bg AS (
         SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] AS b
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w), 1))) AS i) t),
       cnt AS (SELECT b, count(*) AS n FROM bg GROUP BY 1)
       SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(CASE WHEN c.n <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
         (2 * sum(CASE WHEN c.n <= 2 THEN 1 ELSE 0 END) > count(*)) AS flagged
       FROM bg JOIN cnt c USING (b)
       GROUP BY doc_id""") { (s, d) =>
    val bg = TextDedup.ngrams(Tables.documents(s, d), n = 2)
      .withColumnRenamed("s", "b")
    val cnt = bg.groupBy(col("b")).agg(count(lit(1)).as("n"))
    val rare = sum(when(col("n") <= 2, 1L).otherwise(0L))
    bg.join(cnt, "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), rare.as("n_rare"),
        (rare * 2 > count(lit(1))).as("flagged"))
  }

  val all: Seq[QueryDef] = Seq(profileColumns, corpusOverlap, mixRebalance,
    zorderLayout, heavyHitters, compactionPlan, corpusShuffle,
    qualityRareNgram)
}
