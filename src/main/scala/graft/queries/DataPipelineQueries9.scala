package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{SubstringDedup, TextCuration, TextDedup}

/** Round-10 pipeline additions: the text-curation capstone executed on
  * the BYTE tier — the last carried caveat from round 9 (the apply
  * step stitched by CHAR offsets; fine for an ASCII corpus, wrong for
  * a multibyte one). The fixture corpus injects 'é' for every 'e' on
  * both engines (the `substr_dedup_spans_bytes` fixture), making most
  * documents genuinely multibyte, and the full manifest composition —
  * every tier — runs over that corpus with its substring tier on BYTE
  * anchors, then executes its decisions with the scrub stitched at
  * byte offsets. Scrub spans routinely start or end mid-codepoint;
  * the emitted byte sequences are pinned exactly by md5 over their
  * hex encoding on both engines.
  */
object DataPipelineQueries9 {
  import QueryDef._

  private val K = SubstringDedup.DefaultK
  private val W = SubstringDedup.DefaultW

  private def stopList: String =
    DataPipelineQueries2.stopAll.map(w => s"'$w'").mkString(", ")

  /** The capstone manifest CTE chain over the MULTIBYTE corpus with
    * the substring tier on BYTE anchors: `oracleBytesCtesFor` defines
    * d2 (the 'é' fixture) and the byte-space anch/dup/spans; every
    * other tier is the `text_curation_manifest` oracle verbatim,
    * re-sourced from d2 (lang/n_chars still come from `documents` —
    * they are label inputs, identical on both engines). */
  private def manifestBytesCtes: String =
    s"""${DataPipelineQueries7.oracleBytesCtesFor(K, W)},
       w AS (
         SELECT d2.doc_id, d.lang, d.n_chars, d2.text,
           list_filter(string_split(d2.text, ' '), x -> x <> '') AS w
         FROM d2 JOIN documents d USING (doc_id)),
       ex AS (
         SELECT doc_id,
           CASE WHEN row_number() OVER (PARTITION BY md5(text)
             ORDER BY doc_id) > 1 THEN 1 ELSE 0 END AS exact_dup
         FROM d2),
       sh AS (
         SELECT DISTINCT doc_id,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' '
             || w[CAST(i AS INT)+2] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-1, 1)))
           AS i) t),
       hs AS (
         SELECT doc_id, i,
           min(md5(concat(CAST(i AS VARCHAR), ':', s))) AS mh
         FROM sh, LATERAL (SELECT unnest(range(0, 12)) AS i) t
         GROUP BY doc_id, i),
       bands AS (
         SELECT doc_id, i // 3 AS band,
           md5(string_agg(mh, '|' ORDER BY i)) AS sig
         FROM hs GROUP BY doc_id, band),
       cand AS (
         SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       common AS (
         SELECT c.d1, c.d2, count(*) AS common
         FROM cand c JOIN sh a ON a.doc_id = c.d1
                     JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
         GROUP BY c.d1, c.d2),
       ndup AS (
         SELECT DISTINCT m.d2 AS doc_id FROM common m
         JOIN sz x ON x.doc_id = m.d1 JOIN sz y ON y.doc_id = m.d2
         WHERE 5 * m.common >= 4 * (x.n + y.n - m.common)),
       sub AS (
         SELECT doc_id, sum(span_end - span_start + 1) AS dup_chars
         FROM spans GROUP BY doc_id),
       g5 AS (
         SELECT DISTINCT doc_id,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' ||
           w[CAST(i AS INT)+2] || ' ' || w[CAST(i AS INT)+3] || ' ' ||
           w[CAST(i AS INT)+4] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-3, 1)))
           AS i) t
         WHERE len(w) >= 5),
       b5 AS (SELECT DISTINCT s FROM g5 WHERE doc_id % 7 = 0),
       cont AS (
         SELECT g.doc_id,
           CAST(count(b5.s) * 10000 // count(*) AS BIGINT) AS overlap_bp
         FROM g5 g LEFT JOIN b5 ON b5.s = g.s
         WHERE g.doc_id % 7 <> 0
         GROUP BY g.doc_id),
       q AS (
         SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
           floor(length(array_to_string(w, '')) * 100.0
             / greatest(len(w), 1)) AS mwl_cc,
           len(list_filter(w, x -> x IN ($stopList))) >= 1 AS has_stop
         FROM w),
       f0 AS MATERIALIZED (
         SELECT doc_id, n_chars,
           substr(md5(w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]),
             1, 2) AS b
         FROM w, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
         WHERE len(w) >= 2),
       f AS MATERIALIZED (
         SELECT doc_id, CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS y,
           b, CAST(count(*) AS BIGINT) AS cnt
         FROM f0 GROUP BY 1, 2, 3
         UNION ALL
         SELECT DISTINCT doc_id,
           CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END,
           '__bias__', CAST(1 AS BIGINT)
         FROM f0)
       ${graft.functions.LinearClassifier
         .sqlUnrolled(DataPipelineQueries8.CapstoneRounds)},
       base AS (
         SELECT d.doc_id,
           CAST(ex.exact_dup AS INT) AS exact_dup,
           CAST(CASE WHEN ndup.doc_id IS NOT NULL THEN 1 ELSE 0 END
             AS INT) AS near_dup,
           CAST(coalesce(sub.dup_chars, 0) AS BIGINT) AS dup_chars,
           CAST(coalesce(cont.overlap_bp, 0) AS BIGINT) AS overlap_bp,
           q.n_tokens,
           CAST(CASE WHEN q.n_tokens >= 20
                AND q.mwl_cc BETWEEN 300 AND 799
                AND q.has_stop THEN 1 ELSE 0 END AS INT) AS quality_pass,
           CAST(coalesce(mf.margin, 0) AS BIGINT) AS margin
         FROM d2 d
         JOIN ex ON ex.doc_id = d.doc_id
         LEFT JOIN ndup ON ndup.doc_id = d.doc_id
         LEFT JOIN sub ON sub.doc_id = d.doc_id
         LEFT JOIN cont ON cont.doc_id = d.doc_id
         JOIN q ON q.doc_id = d.doc_id
         LEFT JOIN mf ON mf.doc_id = d.doc_id),
       lab AS (
         SELECT *, CASE
           WHEN doc_id % 7 = 0 THEN 'benchmark_member'
           WHEN exact_dup = 1 THEN 'exact_dup'
           WHEN near_dup = 1 THEN 'near_dup'
           WHEN overlap_bp >= 1000 THEN 'contaminated'
           WHEN quality_pass = 0 THEN 'low_quality'
           WHEN margin <= 0 THEN 'classifier_reject'
           WHEN dup_chars > 0 OR overlap_bp > 0 THEN 'dup_spans'
           ELSE 'clean' END AS reason
         FROM base)"""

  /** The BYTE-tier capstone apply: manifest over the multibyte fixture
    * corpus (substring tier on byte anchors) executed with byte-offset
    * scrub stitching. Spans embed into hex space (byte [s, e] ↦ hex
    * [2s-1, 2e] over `hex(encode(text))`) where the char scrub algebra
    * applies verbatim; scrub boundaries routinely split an 'é' in
    * half, and md5 over the scrubbed hex pins the emitted BYTES
    * exactly — the check a char-indexed implementation cannot pass. */
  val textCurationApplyBytes = sql("text_curation_apply_bytes",
    s"""$manifestBytesCtes,
       mm AS (
         SELECT a.doc_id, a.pos FROM anch a
         WHERE a.doc_id % 7 <> 0
           AND a.gram IN (SELECT gram FROM anch WHERE doc_id % 7 = 0)),
       uall AS (
         SELECT doc_id, pos FROM dup
         UNION
         SELECT doc_id, pos FROM mm),
       ured AS (
         SELECT u.doc_id, u.pos FROM uall u
         JOIN lab ON lab.doc_id = u.doc_id AND lab.reason = 'dup_spans'),
       ri AS (
         SELECT doc_id, pos, pos + ${K - 1} AS e,
           CASE WHEN pos > coalesce(
               max(pos + ${K - 1}) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               -1) + 1
             THEN 1 ELSE 0 END AS ni
         FROM ured),
       ri2 AS (
         SELECT doc_id, pos, e,
           sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         FROM ri),
       rspans AS (
         SELECT doc_id, island,
           min(pos) AS span_start, max(e) AS span_end
         FROM ri2 GROUP BY doc_id, island),
       hxd AS (SELECT doc_id, hex(encode(text)) AS hx FROM d2),
       seg AS (
         SELECT doc_id,
           coalesce(lag(2 * span_end) OVER (PARTITION BY doc_id
             ORDER BY span_start) + 1, 1) AS seg_start,
           2 * span_start - 2 AS seg_end
         FROM rspans
         UNION ALL
         SELECT doc_id, 2 * max(span_end) + 1 AS seg_start,
           2147483647 AS seg_end
         FROM rspans GROUP BY doc_id),
       stitched AS (
         SELECT s.doc_id,
           string_agg(substr(h.hx, CAST(seg_start AS BIGINT),
             CAST(greatest(least(seg_end, length(h.hx))
               - seg_start + 1, 0) AS BIGINT)),
             '' ORDER BY seg_start) AS hx_scrubbed
         FROM seg s JOIN hxd h USING (doc_id)
         WHERE seg_end >= seg_start
         GROUP BY s.doc_id)
       SELECT lab.doc_id,
         CASE WHEN lab.reason = 'clean' THEN 'keep'
              ELSE 'redact' END AS decision,
         CAST(length(coalesce(st.hx_scrubbed, h.hx)) // 2 AS BIGINT)
           AS n_bytes_out,
         md5(coalesce(st.hx_scrubbed, h.hx)) AS sig
       FROM lab
       JOIN hxd h ON h.doc_id = lab.doc_id
       LEFT JOIN stitched st ON st.doc_id = lab.doc_id
       WHERE lab.reason IN ('clean', 'dup_spans')""") { (s, d) =>
    val docs2 = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr("replace(text, 'e', 'é')").as("text"))
    // ONE byte-anchor scan + ONE gram-keyed recurrence exchange feed
    // both the manifest's dup-span tier and the apply step's scrub
    val anchB = SubstringDedup.anchorsBytes(docs2, k = K, w = W)
      .localCheckpoint(true)
    val dupB = SubstringDedup.duplicatedAnchors(anchB)
      .localCheckpoint(true)
    val manifest = TextCuration.manifest(s, docs2,
        TextDedup.shingles(docs2).localCheckpoint(true),
        DataPipelineQueries8.capstoneConfig,
        anchorsOpt = Some(anchB), dupAnchorsOpt = Some(dupB))
      .select(col("doc_id"), col("decision"), col("reason"))
      .localCheckpoint(true) // decision relation feeds filter + join
    TextCuration.applyManifestBytes(s, docs2, manifest,
      DataPipelineQueries8.capstoneConfig, anchB, dupB)
  }

  def all: Seq[QueryDef] = Seq(textCurationApplyBytes)
}
