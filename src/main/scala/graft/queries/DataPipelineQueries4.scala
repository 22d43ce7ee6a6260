package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-4 training-data-pipeline additions: PII redaction and
  * corpus-level duplicate-span removal (the C4-style rule that drops a
  * text span everywhere once it is seen in multiple documents).
  */
object DataPipelineQueries4 {
  import QueryDef._

  /** PII scrub: emails → <EMAIL>, long digit runs → <NUM>. The
    * synthetic corpus contains no PII, so the check INJECTS a
    * deterministic email + number per document (same concat on both
    * engines), counts matches pre-scrub, and hashes the scrubbed
    * text. One codegen'd linear scan — the plan a 100 TB redaction
    * pass wants (no shuffle at all). */
  val textPiiScrub = sql("text_pii_scrub",
    """WITH seeded AS (
         SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) ||
           '@example.com or call ' ||
           CAST(9000000 + doc_id * 31 AS VARCHAR) AS t
         FROM documents)
       SELECT doc_id,
         len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
           AS n_emails,
         len(regexp_extract_all(t, '[0-9]{7,}')) AS n_nums,
         md5(regexp_replace(regexp_replace(t,
           '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
           '[0-9]{7,}', '<NUM>', 'g')) AS scrubbed_sig
       FROM seeded""") { (s, d) =>
    val t = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com or call "),
      (lit(9000000L) + col("doc_id") * 31).cast("string"))
    Tables.documents(s, d)
      .withColumn("t", t)
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"),
          lit(graft.functions.TextStats.EmailPattern), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("t"),
          lit(graft.functions.TextStats.LongNumberPattern), lit(0))).as("n_nums"),
        md5(graft.functions.TextStats.redactPii(col("t"))).as("scrubbed_sig"))
  }

  /** Corpus-level duplicate-span removal (C4 drops any three-sentence
    * span occurring more than once; this corpus has no sentence marks,
    * so the unit is the consecutive 8-token chunk): a chunk whose text
    * appears in MORE THAN ONE document is dropped from every document,
    * and each document is reassembled from its surviving chunks in
    * order. Emits the surviving-chunk count and the md5 of the
    * reassembly.
    *
    * Plan shape at 100 TB: chunking is a codegen'd explode; the
    * only corpus-wide shuffles are the chunk-text frequency aggregate
    * and the per-doc reassembly — both keyed aggregations, no joins of
    * the corpus against itself (the frequency relation is
    * broadcast-joined back, proportional to the dup rate... here the
    * full chunk relation re-aggregates, which AQE sizes). */
  val textChunkDedup = sql("text_chunk_dedup",
    """WITH tok AS (
         SELECT doc_id, i - 1 AS i, w[CAST(i AS INT)] AS w
         FROM (
           SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
           FROM documents) t,
           LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) u),
       chunk AS (
         SELECT doc_id, i // 8 AS c,
           string_agg(w, ' ' ORDER BY i) AS ctxt
         FROM tok GROUP BY doc_id, i // 8),
       freq AS (
         SELECT ctxt, count(DISTINCT doc_id) AS nd FROM chunk GROUP BY ctxt),
       kept AS (
         SELECT ch.doc_id, ch.c, ch.ctxt FROM chunk ch
         JOIN freq f ON f.ctxt = ch.ctxt WHERE f.nd = 1)
       SELECT doc_id, count(*) AS n_chunks,
         md5(string_agg(ctxt, ' ' ORDER BY c)) AS doc_sig
       FROM kept GROUP BY doc_id""") { (s, d) =>
    val tok = graft.functions.TextDedup.withTokens(Tables.documents(s, d))
      .select(col("doc_id"), posexplode(col("w")).as(Seq("i", "w")))
    val chunk = tok
      .groupBy(col("doc_id"), expr("i div 8").as("c"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(i, w))), x -> x.w), ' ')")
        .as("ctxt"))
    val freq = chunk.groupBy(col("ctxt"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1).select(col("ctxt").as("dup_txt"))
    chunk.join(broadcast(freq), col("ctxt") === col("dup_txt"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        md5(expr(
          "array_join(transform(array_sort(collect_list(struct(c, ctxt))), x -> x.ctxt), ' ')"))
          .as("doc_sig"))
  }

  /** Connected components by large-star/small-star contraction
    * (functions.ConnectedComponents.runStar) on a HIGH-DIAMETER graph:
    * consecutive doc_ids within each (lang, source) group form chains
    * of length ~n/groups (diameter ~40 at sf0.01, ~400 at sf0.1).
    * Plain min-label propagation needs O(diameter) rounds here; star
    * contraction converges in O(log n) — this check pins the scale
    * path on the topology it exists for, while `dedup_clusters` pins
    * the near-clique dedup topology. The oracle walks the same chains
    * with a recursive CTE. */
  val graphComponentsStar = sql("graph_components_star",
    """WITH RECURSIVE base AS (
         SELECT doc_id,
           row_number() OVER (PARTITION BY lang, source ORDER BY doc_id)
             AS rn, lang, source
         FROM documents),
       ed AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2 FROM base a
         JOIN base b ON a.lang = b.lang AND a.source = b.source
           AND b.rn = a.rn + 1),
       edges AS (SELECT d1 AS src, d2 AS dst FROM ed
                 UNION ALL SELECT d2, d1 FROM ed),
       walk(node, label) AS (
         SELECT src, src FROM edges
         UNION
         SELECT e.dst, wk.label FROM walk wk JOIN edges e ON e.src = wk.node)
       SELECT CAST(node AS BIGINT) AS doc_id,
         CAST(min(label) AS BIGINT) AS cluster_id
       FROM walk GROUP BY node""") { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
    val ed = Tables.documents(s, d)
      .select(col("doc_id"), lead(col("doc_id"), 1).over(w).as("nxt"))
      .where(col("nxt").isNotNull)
      .select(col("doc_id").as("src"), col("nxt").as("dst"))
    val labels = graft.queries.DataPipelineQueries.withFewPartitions(s, 4) {
      graft.functions.ConnectedComponents.runStar(s, ed)
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  val all: Seq[QueryDef] = Seq(textPiiScrub, textChunkDedup,
    graphComponentsStar)
}
