package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.SubstringDedup

/** Round-8 pipeline additions: character-level exact-substring
  * duplicate detection (winnowing fingerprints — the Lee et al. 2022
  * ExactSubstr tier, distinct from the document-level MinHash family).
  * See `functions/SubstringDedup.scala` for the algorithm and the
  * scale contract; the DuckDB oracles replay winnowing selection
  * bit-for-bit via md5 + a rightmost-min composite key.
  *
  * Texts in the corpus are ASCII, so DuckDB's character-based
  * `substr` and Scala's code-unit `substring` index identically in the
  * char-based tier. For genuinely multibyte corpora the BYTE-based
  * variant (`substr_dedup_spans_bytes`, `SubstringDedup.anchorsBytes`)
  * pins gram extraction to the UTF-8 encoding on both engines (hex
  * slicing of the blob in the oracle), giving the same >= w+k-1
  * guarantee in BYTES independent of encoding width.
  */
object DataPipelineQueries7 {
  import QueryDef._

  private val K = SubstringDedup.DefaultK // 20-char grams
  private val W = SubstringDedup.DefaultW // 11-gram windows -> 30-char guarantee

  /** Oracle CTE prefix for a given (k, w): gram hashes -> winnowing
    * anchor selection (rightmost minimum per full window, encoded as a
    * plain `min` over `md5hash || lpad(10^9 - pos)` so larger
    * positions win ties) -> anchors that recur anywhere in the corpus
    * -> merged per-document spans (gaps-and-islands). */
  private[queries] def oracleCtesFor(K: Int, W: Int): String =
    s"""WITH g AS (
         SELECT doc_id, length(text) - ${K - 1} AS m,
           unnest(generate_series(1, length(text) - ${K - 1})) AS i,
           text
         FROM documents),
       k1 AS (
         SELECT doc_id, m, i, substr(text, i, $K) AS gram,
           md5(substr(text, i, $K))
             || lpad(CAST(1000000000 - i AS VARCHAR), 10, '0') AS key
         FROM g),
       wm AS (
         SELECT doc_id, i, m,
           min(key) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS mk
         FROM k1),
       sel AS (
         SELECT DISTINCT doc_id,
           1000000000 - CAST(substr(mk, 33, 10) AS BIGINT) AS pos
         FROM wm WHERE i <= m - ${W - 1}),
       anch AS (
         SELECT s.doc_id, s.pos, k1.gram
         FROM sel s JOIN k1 ON k1.doc_id = s.doc_id AND k1.i = s.pos),
       dup AS (
         SELECT doc_id, pos FROM anch
         WHERE gram IN (SELECT gram FROM anch
                        GROUP BY gram HAVING count(*) > 1)),
       isl AS (
         SELECT doc_id, pos, pos + ${K - 1} AS e,
           CASE WHEN pos > coalesce(
               max(pos + ${K - 1}) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               -1) + 1
             THEN 1 ELSE 0 END AS ni
         FROM dup),
       isl2 AS (
         SELECT doc_id, pos, e,
           sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         FROM isl),
       spans AS (
         SELECT doc_id, island,
           min(pos) AS span_start, max(e) AS span_end
         FROM isl2 GROUP BY doc_id, island)"""

  private val OracleCtes = oracleCtesFor(K, W)

  /** Per-document duplicated-span report: how many verbatim-repeated
    * regions (>= 30 chars guaranteed caught) each document carries and
    * how many characters they cover — the relation an exact-substring
    * scrub pass consumes (drop the spans, or drop the doc when
    * dup_chars/length crosses a policy line). */
  val substrDedupSpans = sql("substr_dedup_spans",
    s"""$OracleCtes
       SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_chars
       FROM spans GROUP BY doc_id""") { (s, d) =>
    // checkpointed: the anchor relation is read twice (hot-gram
    // aggregate + semi-join back) — without it the winnowing scan
    // recomputes per consumer
    val anch = SubstringDedup.anchors(Tables.documents(s, d), k = K, w = W)
      .localCheckpoint(true)
    val spans = SubstringDedup.duplicatedSpans(
      SubstringDedup.duplicatedAnchors(anch), k = K)
    spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_chars"))
  }

  /** BYTE-based winnowing CTEs over a non-ASCII corpus (every 'e'
    * replaced with 'é' on BOTH engines, making most docs genuinely
    * multibyte): grams are k BYTES of the UTF-8 encoding, sliced from
    * the blob's hex string (byte p ↦ hex offset 2p-1, k bytes ↦ 2k hex
    * chars), positions are byte offsets. Same winnowing selection,
    * recurrence, and span-merge chain as the char tier. */
  private[queries] def oracleBytesCtesFor(K: Int, W: Int): String =
    s"""WITH d2 AS (
         SELECT doc_id, replace(text, 'e', 'é') AS text FROM documents),
       g AS (
         SELECT doc_id, octet_length(encode(text)) - ${K - 1} AS m,
           unnest(generate_series(1,
             octet_length(encode(text)) - ${K - 1})) AS i,
           hex(encode(text)) AS hx
         FROM d2),
       k1 AS (
         SELECT doc_id, m, i, substring(hx, 2 * i - 1, ${2 * K}) AS gram,
           md5(substring(hx, 2 * i - 1, ${2 * K}))
             || lpad(CAST(1000000000 - i AS VARCHAR), 10, '0') AS key
         FROM g),
       wm AS (
         SELECT doc_id, i, m,
           min(key) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS mk
         FROM k1),
       sel AS (
         SELECT DISTINCT doc_id,
           1000000000 - CAST(substr(mk, 33, 10) AS BIGINT) AS pos
         FROM wm WHERE i <= m - ${W - 1}),
       anch AS (
         SELECT s.doc_id, s.pos, k1.gram
         FROM sel s JOIN k1 ON k1.doc_id = s.doc_id AND k1.i = s.pos),
       dup AS (
         SELECT doc_id, pos FROM anch
         WHERE gram IN (SELECT gram FROM anch
                        GROUP BY gram HAVING count(*) > 1)),
       isl AS (
         SELECT doc_id, pos, pos + ${K - 1} AS e,
           CASE WHEN pos > coalesce(
               max(pos + ${K - 1}) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               -1) + 1
             THEN 1 ELSE 0 END AS ni
         FROM dup),
       isl2 AS (
         SELECT doc_id, pos, e,
           sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         FROM isl),
       spans AS (
         SELECT doc_id, island,
           min(pos) AS span_start, max(e) AS span_end
         FROM isl2 GROUP BY doc_id, island)"""

  /** The byte-based tier on a genuinely multibyte corpus — the caveat
    * remediation: same per-doc span report as `substr_dedup_spans`,
    * but positions/coverage in BYTES of the UTF-8 encoding, so the
    * >= 30 guarantee holds regardless of encoding width. The fixture
    * injects 'é' for every 'e' with the same `replace` on both
    * engines; a char-indexed implementation would mis-place every
    * gram after the first multibyte char and break the hash. */
  val substrDedupSpansBytes = sql("substr_dedup_spans_bytes",
    s"""${oracleBytesCtesFor(K, W)}
       SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_bytes
       FROM spans GROUP BY doc_id""") { (s, d) =>
    val docs2 = Tables.documents(s, d)
      .select(col("doc_id"), expr("replace(text, 'e', 'é')").as("text"))
    val anch = SubstringDedup.anchorsBytes(docs2, k = K, w = W)
      .localCheckpoint(true)
    val spans = SubstringDedup.duplicatedSpans(
      SubstringDedup.duplicatedAnchors(anch), k = K)
    spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_bytes"))
  }

  /** Corpus-level funnel for the exact-substring tier — the integer
    * acceptance numbers (anchor volume, recurring-gram rate, span
    * coverage) a deployment reads to size k/w before a 100 TB run,
    * mirroring the LSH/SRP funnel rows. */
  val substrDedupFunnel = sql("substr_dedup_funnel",
    s"""$OracleCtes
       SELECT
         CAST((SELECT count(*) FROM anch) AS BIGINT) AS n_anchors,
         CAST((SELECT count(DISTINCT gram) FROM anch) AS BIGINT)
           AS n_grams,
         CAST((SELECT count(*) FROM (SELECT gram FROM anch
               GROUP BY gram HAVING count(*) > 1)) AS BIGINT)
           AS n_dup_grams,
         CAST((SELECT count(*) FROM dup) AS BIGINT) AS n_dup_anchors,
         CAST((SELECT count(DISTINCT doc_id) FROM dup) AS BIGINT)
           AS n_docs_touched,
         CAST((SELECT count(*) FROM spans) AS BIGINT) AS n_spans,
         CAST((SELECT sum(span_end - span_start + 1) FROM spans)
           AS BIGINT) AS dup_chars_total""") { (s, d) =>
    val anch = SubstringDedup.anchors(Tables.documents(s, d), k = K, w = W)
      .localCheckpoint(true)
    val dup = SubstringDedup.duplicatedAnchors(anch).localCheckpoint(true)
    val spans = SubstringDedup.duplicatedSpans(dup, k = K)
      .withColumn("len", col("span_end") - col("span_start") + 1)
      .localCheckpoint(true)
    val a = anch.agg(count(lit(1)).as("n_anchors"),
      count_distinct(col("g")).as("n_grams"))
    val dg = anch.groupBy(col("g")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") > 1).agg(count(lit(1)).as("n_dup_grams"))
    val du = dup.agg(count(lit(1)).as("n_dup_anchors"),
      count_distinct(col("doc_id")).as("n_docs_touched"))
    val sp = spans.agg(count(lit(1)).as("n_spans"),
      sum(col("len")).as("dup_chars_total"))
    a.crossJoin(dg).crossJoin(du).crossJoin(sp)
  }

  /** The scrub pass itself: duplicated spans REMOVED from every
    * document, untouched documents passing through verbatim — the
    * relation a training pipeline writes back after the
    * exact-substring tier. The stitch is relational (kept segments
    * from a per-doc window over the span list, `substring` cuts, one
    * per-doc sort-and-join); string equality against the oracle pins
    * the reconstruction exactly. */
  val substrDedupScrub = sql("substr_dedup_scrub",
    s"""$OracleCtes,
       seg AS (
         SELECT doc_id,
           coalesce(lag(span_end) OVER (PARTITION BY doc_id
             ORDER BY span_start) + 1, 1) AS seg_start,
           span_start - 1 AS seg_end
         FROM spans
         UNION ALL
         SELECT doc_id, max(span_end) + 1 AS seg_start,
           2147483647 AS seg_end
         FROM spans GROUP BY doc_id),
       stitched AS (
         SELECT s.doc_id,
           string_agg(substr(d.text, CAST(seg_start AS BIGINT),
             CAST(greatest(least(seg_end, length(d.text))
               - seg_start + 1, 0) AS BIGINT)),
             '' ORDER BY seg_start) AS text_scrubbed
         FROM seg s JOIN documents d USING (doc_id)
         WHERE seg_end >= seg_start
         GROUP BY s.doc_id)
       SELECT d.doc_id,
         coalesce(st.text_scrubbed, d.text) AS text_scrubbed,
         CAST(length(d.text) AS BIGINT) AS n_chars_before,
         CAST(length(coalesce(st.text_scrubbed, d.text)) AS BIGINT)
           AS n_chars_after
       FROM documents d LEFT JOIN stitched st ON st.doc_id = d.doc_id""") {
    (s, d) =>
    val docs = Tables.documents(s, d)
    val anch = SubstringDedup.anchors(docs, k = K, w = W)
      .localCheckpoint(true)
    val spans = SubstringDedup.duplicatedSpans(
      SubstringDedup.duplicatedAnchors(anch), k = K)
      .localCheckpoint(true) // read by both the pre-segment window and the tail aggregate
    SubstringDedup.scrub(docs, spans)
      .select(col("doc_id"), col("text_scrubbed"),
        length(col("text_scrubbed")).as("n_chars_after"))
      .join(docs.select(col("doc_id"),
        length(col("text")).as("n_chars_before")), Seq("doc_id"))
      .select(col("doc_id"), col("text_scrubbed"),
        col("n_chars_before").cast("long").as("n_chars_before"),
        col("n_chars_after").cast("long").as("n_chars_after"))
  }

  /** (k, w) settings the acceptance curve sweeps: the shipped default
    * (30-char guarantee), an aggressive short-match config, and a
    * conservative long-match one. */
  private val CurveConfigs = Seq((12, 7), (20, 11), (28, 15))

  /** Acceptance curve for the winnowing tier — anchor volume (the
    * shuffled-bytes cost driver, ~2/(w+1) of corpus chars) vs span
    * coverage, per (k, w): the sizing table a deployment reads to pick
    * the gram length and guarantee threshold before a 100 TB run,
    * mirroring `dedup_lsh_curve` / `emb_srp_curve`. Each config is an
    * independent pass over the corpus (the sweep is the measurement's
    * definition — production ships ONE config). */
  val substrDedupCurve = sql("substr_dedup_curve",
    CurveConfigs.map { case (k, w) =>
      s"""SELECT CAST($k AS INT) AS kk, CAST($w AS INT) AS ww,
           CAST(${w + k - 1} AS INT) AS threshold,
           n_anchors, n_dup_anchors, n_spans, dup_chars
         FROM (${oracleCtesFor(k, w)}
           SELECT
             CAST((SELECT count(*) FROM anch) AS BIGINT) AS n_anchors,
             CAST((SELECT count(*) FROM dup) AS BIGINT) AS n_dup_anchors,
             CAST((SELECT count(*) FROM spans) AS BIGINT) AS n_spans,
             CAST((SELECT coalesce(sum(span_end - span_start + 1), 0)
               FROM spans) AS BIGINT) AS dup_chars)"""
    }.mkString("\n       UNION ALL\n")) { (s, d) =>
    val docs = Tables.documents(s, d)
    CurveConfigs.map { case (k, w) =>
      val anch = SubstringDedup.anchors(docs, k = k, w = w)
        .localCheckpoint(true)
      val dup = SubstringDedup.duplicatedAnchors(anch).localCheckpoint(true)
      val spans = SubstringDedup.duplicatedSpans(dup, k = k)
      anch.agg(count(lit(1)).as("n_anchors"))
        .crossJoin(dup.agg(count(lit(1)).as("n_dup_anchors")))
        .crossJoin(spans.agg(count(lit(1)).as("n_spans"),
          coalesce(sum(col("span_end") - col("span_start") + 1), lit(0L))
            .as("dup_chars")))
        .select(lit(k).as("kk"), lit(w).as("ww"),
          lit(w + k - 1).as("threshold"),
          col("n_anchors"), col("n_dup_anchors"), col("n_spans"),
          col("dup_chars"))
    }.reduce(_ unionByName _)
  }

  /** Incremental ingestion dedup for the SUBSTRING tier — closing the
    * serving-mode symmetry with `dedup_incremental` (LSH) and
    * `emb_incremental_dedup` (SRP): documents with doc_id % 4 = 0 play
    * the incoming batch, the rest the indexed corpus. Each batch
    * ANCHOR is labeled corpus_dup (its gram is in the index's anchor-
    * gram set), batch_dup (an earlier batch anchor — (doc_id, pos)
    * order — carries the same gram; keep-first), or new; the per-doc
    * label counts are the ingest report. Per-ingest cost tracks the
    * BATCH: batch anchors are linear in batch characters, the label
    * pass is one equi join against the index's distinct-gram relation
    * (in production a KeyedTable-maintained anchor index, exactly like
    * the LSH band index) plus a gram-keyed window over BATCH anchors
    * only. Grams compare as full strings, so no verify tier is needed;
    * the 100 TB hash-payload variant re-verifies colliding grams by a
    * by-id position fetch, as the scaladoc of SubstringDedup notes.
    *
    * The oracle is shared with `stream_substr_dedup`
    * (StreamingQueries): streaming and batch answers are identical by
    * construction, so it is this SQL verbatim there. */
  private[queries] val SubstrIncrementalOracle: String =
    s"""${oracleCtesFor(K, W)},
       idx AS (
         SELECT DISTINCT gram FROM anch WHERE doc_id % 4 <> 0),
       b AS (
         SELECT doc_id, pos, gram FROM anch WHERE doc_id % 4 = 0),
       lab AS (
         SELECT doc_id, pos, gram,
           row_number() OVER (PARTITION BY gram
             ORDER BY doc_id, pos) AS rn,
           CASE WHEN gram IN (SELECT gram FROM idx)
             THEN 1 ELSE 0 END AS ii
         FROM b)
       SELECT doc_id,
         CAST(sum(CASE WHEN ii = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_corpus_dup,
         CAST(sum(CASE WHEN ii = 0 AND rn > 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_batch_dup,
         CAST(sum(CASE WHEN ii = 0 AND rn = 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_new
       FROM lab GROUP BY doc_id"""

  val substrIncrementalDedup = sql("substr_incremental_dedup",
    SubstrIncrementalOracle) { (s, d) =>
    val docs = Tables.documents(s, d)
    val isBatch = col("doc_id") % 4 === 0
    SubstringDedup.incrementalDedup(
      indexGrams = SubstringDedup.anchors(docs.where(!isBatch), k = K, w = W),
      batchAnchors = SubstringDedup.anchors(docs.where(isBatch), k = K, w = W))
  }

  /** Substring-tier near-dup clustering: doc pairs sharing >= 3
    * distinct anchor grams become edges, connected components (min
    * doc_id label — the same reusable
    * `functions.ConnectedComponents` as `dedup_clusters`) group the
    * verbatim-overlap families. The pair join runs on DISTINCT
    * (doc, gram) anchors keyed on the gram — fanout is bounded by the
    * recurring-anchor rate (max 5 docs/gram on this corpus), the same
    * hot-set containment argument as `pairableShingles`; a corpus
    * with boilerplate grams would put `maxDF` stop-listing in front,
    * exactly like the shingle tier. Oracle: recursive-CTE walk of the
    * identical edge set. */
  val substrDedupClusters = sql("substr_dedup_clusters",
    s"""${oracleCtesFor(K, W).replaceFirst("^WITH", "WITH RECURSIVE")},
       dgm AS (SELECT DISTINCT doc_id, gram FROM anch),
       pr AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         FROM dgm a JOIN dgm b
           ON a.gram = b.gram AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       ed AS (SELECT d1, d2 FROM pr WHERE shared >= 3),
       edges AS (SELECT d1 AS src, d2 AS dst FROM ed
                 UNION ALL SELECT d2, d1 FROM ed),
       walk(node, label) AS (
         SELECT src, src FROM edges
         UNION
         SELECT e.dst, wk.label FROM walk wk JOIN edges e ON e.src = wk.node)
       SELECT CAST(node AS BIGINT) AS doc_id,
         CAST(min(label) AS BIGINT) AS cluster_id
       FROM walk GROUP BY node""") { (s, d) =>
    val dg = SubstringDedup.anchors(Tables.documents(s, d), k = K, w = W)
      .select(col("doc_id"), col("g")).distinct()
      .localCheckpoint(true)
    val ed = dg.join(dg.select(col("doc_id").as("d2"), col("g")), Seq("g"))
      .filter(col("doc_id") < col("d2"))
      .groupBy(col("doc_id").as("d1"), col("d2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3)
      .select(col("d1").as("src"), col("d2").as("dst"))
    val labels = DataPipelineQueries.withFewPartitions(s, 4) {
      graft.functions.ConnectedComponents.run(s, ed)
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, public
    * paper: "CCNet: Extracting High Quality Monolingual Datasets from
    * Web Crawl Data"): rank every document by LM cross-entropy per
    * token and split the corpus into head / middle / tail thirds —
    * the partition CCNet materializes so downstream training samples
    * more from the head. Scoring reuses `text_lm_surprisal`'s
    * engine-exact integer floor-log2 bits; the rank key is the single
    * double division sum_bits/n_bigrams of identical integers
    * (bit-exact in both engines), tiebroken by doc_id.
    *
    * Scale: the global rank is `Layout.globalRowNumber` — a range
    * repartition + per-partition sort + zipWithIndex, never a
    * single-partition window; the corpus size joins back as a
    * broadcast 1-row aggregate. (Production CCNet cuts at FIXED
    * perplexity thresholds estimated from a sample — one scan, no
    * rank at all; the exact-tertile form here is the measurement that
    * calibrates those thresholds.) */
  val lmPerplexityBuckets = sql("lm_perplexity_buckets",
    """WITH w AS (
         SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       bg AS (
         SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
         FROM w, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
         WHERE len(w) >= 2),
       cnt AS (SELECT w1, w2, count(*) AS num FROM bg GROUP BY w1, w2),
       tot AS (SELECT w1, CAST(sum(num) AS BIGINT) AS den
               FROM cnt GROUP BY w1),
       s AS (
         SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(length(bin(den // num)) - 1) AS BIGINT) AS sum_bits
         FROM bg
         JOIN cnt ON cnt.w1 = bg.w1 AND cnt.w2 = bg.w2
         JOIN tot ON tot.w1 = bg.w1
         GROUP BY bg.doc_id),
       r AS (
         SELECT doc_id, n_bigrams, sum_bits,
           CAST(sum_bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS ratio
         FROM s),
       rn AS (
         SELECT doc_id, n_bigrams, sum_bits, ratio,
           row_number() OVER (ORDER BY ratio, doc_id) - 1 AS rn,
           (SELECT count(*) FROM r) AS n
         FROM r)
       SELECT
         CASE (rn * 3) // n + 1 WHEN 1 THEN 'head'
           WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams,
         CAST(sum(sum_bits) AS BIGINT) AS total_bits,
         min(ratio) AS min_ratio,
         max(ratio) AS max_ratio
       FROM rn GROUP BY 1""") { (s, d) =>
    import graft.functions.Layout
    // checkpointed: the scored relation feeds BOTH the global-rank path
    // and the corpus-count aggregate — without it the full bigram-LM
    // scoring pipeline recomputes per consumer
    val scored = DataPipelineQueries3.textLmSurprisal.fn(s, d)
      .withColumn("ratio",
        col("sum_bits").cast("double") / col("n_bigrams").cast("double"))
      .localCheckpoint(true)
    val ranked = Layout.globalRowNumber(scored, col("ratio"), col("doc_id"))
    ranked
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("n"))))
      .withColumn("bucket",
        expr("CASE (rn * 3) div n + 1 WHEN 1 THEN 'head' " +
          "WHEN 2 THEN 'middle' ELSE 'tail' END"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("total_bigrams"),
        sum(col("sum_bits")).as("total_bits"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"))
  }

  /** Span-level exact-substring decontamination — the VERBATIM-leak
    * report (every >= 30-char literal copy from the benchmark set is
    * guaranteed a shared winnowing anchor; the GPT-3-appendix /
    * Lee et al. exact-substring check, strictly stronger on literal
    * quotes than the token 5-gram `decontaminate_overlap`): corpus
    * anchors whose gram appears among the benchmark docs' (doc_id %
    * 7 = 0) anchors mark leaked regions, merged to spans, reported as
    * chars + floored basis points of the doc — the number that drives
    * drop-vs-redact. The benchmark anchor-gram set is bounded by the
    * eval suite (never the corpus), hence the broadcast semi-join; the
    * corpus side is the linear anchor scan. */
  val substrDecontaminate = sql("substr_decontaminate",
    s"""${oracleCtesFor(K, W)},
       bg AS (SELECT DISTINCT gram FROM anch WHERE doc_id % 7 = 0),
       mm AS (
         SELECT a.doc_id, a.pos FROM anch a
         WHERE a.doc_id % 7 <> 0
           AND a.gram IN (SELECT gram FROM bg)),
       mi AS (
         SELECT doc_id, pos, pos + ${K - 1} AS e,
           CASE WHEN pos > coalesce(
               max(pos + ${K - 1}) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               -1) + 1
             THEN 1 ELSE 0 END AS ni
         FROM mm),
       mi2 AS (
         SELECT doc_id, pos, e,
           sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         FROM mi),
       ms AS (
         SELECT doc_id, island, min(pos) AS s0, max(e) AS e0
         FROM mi2 GROUP BY doc_id, island)
       SELECT ms.doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(e0 - s0 + 1) AS BIGINT) AS leaked_chars,
         CAST(sum(e0 - s0 + 1) * 10000 // max(length(d.text)) AS BIGINT)
           AS leak_bp
       FROM ms JOIN documents d ON d.doc_id = ms.doc_id
       GROUP BY ms.doc_id""") { (s, d) =>
    val docs = Tables.documents(s, d)
    val anch = SubstringDedup.anchors(docs, k = K, w = W)
      .localCheckpoint(true)
    val bg = anch.filter(col("doc_id") % 7 === 0).select(col("g")).distinct()
    val matched = anch.filter(col("doc_id") % 7 =!= 0)
      .join(broadcast(bg), Seq("g"), "leftsemi")
    SubstringDedup.duplicatedSpans(matched, k = K)
      .withColumn("len", col("span_end") - col("span_start") + 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("len")).as("leaked_chars"))
      .join(docs.select(col("doc_id"), length(col("text")).as("tl")),
        Seq("doc_id"))
      .select(col("doc_id"), col("n_spans"), col("leaked_chars"),
        expr("CAST(leaked_chars * 10000 DIV tl AS BIGINT)").as("leak_bp"))
  }

  /** Overlapping token-window chunking — the retrieval/embedding prep
    * step (size-32 windows at stride 24, 8-token overlap) that carries
    * each chunk's doc back-pointer, position, and content digest so an
    * embedding index can map hits back to spans. Pure stateless
    * projection: one explode of the stride starts, a `slice` per
    * window, no aggregate and NO shuffle anywhere — at 100 TB this is
    * scan-speed. (`text_chunk_dedup` uses disjoint chunks for dedup;
    * retrieval chunking overlaps so no query phrase falls across a
    * boundary.) */
  val textChunkWindows = sql("text_chunk_windows",
    """WITH w AS (
         SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       st AS (
         SELECT doc_id, w,
           unnest(generate_series(1, greatest(len(w), 1), 24)) AS st
         FROM w),
       ch AS (
         SELECT doc_id, (st - 1) // 24 AS chunk_id, st,
           list_slice(w, st, least(st + 31, len(w))) AS cw
         FROM st WHERE st <= len(w))
       SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         CAST(st AS BIGINT) AS start_tok,
         CAST(len(cw) AS BIGINT) AS n_tokens,
         md5(array_to_string(cw, ' ')) AS sig
       FROM ch""") { (s, d) =>
    import graft.functions.TextDedup
    TextDedup.withTokens(Tables.documents(s, d))
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"), col("w"),
        explode(expr("sequence(1, size(w), 24)")).as("st"))
      .select(col("doc_id"),
        expr("CAST((st - 1) div 24 AS BIGINT)").as("chunk_id"),
        col("st").cast("long").as("start_tok"),
        expr("slice(w, st, 32)").as("cw"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("cw")).cast("long").as("n_tokens"),
        md5(array_join(col("cw"), " ")).as("sig"))
  }

  /** k-anonymity risk report — the release gate a dataset runs after
    * pseudonymization (`pseudonymize` swaps identifiers, but a row is
    * still re-identifiable when its QUASI-identifier combination is
    * rare): group documents by (lang, source, length-centile band) and
    * count the groups smaller than k=5 plus the documents inside them.
    * One keyed aggregate + one 4-row-per-band summary — the same shape
    * at any corpus size; the grouped relation is bounded by the QI
    * domain, never the corpus. (Sweeney 2002, public paper:
    * "k-anonymity: a model for protecting privacy".) */
  val kanonRisk = sql("kanon_risk",
    """WITH q AS (
         SELECT lang, source, length(text) // 100 AS band,
           count(*) AS sz
         FROM documents GROUP BY 1, 2, 3)
       SELECT
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_small_groups,
         CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
           AS n_docs_at_risk,
         CAST(min(sz) AS BIGINT) AS min_group,
         CAST(max(sz) AS BIGINT) AS max_group
       FROM q""") { (s, d) =>
    val q = Tables.documents(s, d)
      .groupBy(col("lang"), col("source"),
        expr("CAST(length(text) AS BIGINT) div 100").as("band"))
      .agg(count(lit(1)).as("sz"))
    q.agg(count(lit(1)).as("n_groups"),
      sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_small_groups"),
      sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("n_docs_at_risk"),
      min(col("sz")).as("min_group"),
      max(col("sz")).as("max_group"))
  }

  def all: Seq[QueryDef] =
    Seq(substrDedupSpans, substrDedupSpansBytes, substrDedupFunnel,
      substrDedupScrub, substrDedupCurve, substrIncrementalDedup,
      substrDedupClusters, substrDecontaminate, lmPerplexityBuckets,
      kanonRisk, textChunkWindows)
}
