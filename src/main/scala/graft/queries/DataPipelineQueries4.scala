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
    * the corpus against itself. The duplicated-chunk relation is
    * proportional to the DUP RATE, a data-dependent quantity, so its
    * broadcast into the anti join is GATED the same way as
    * TextDedup.verifyCandidates: hint only while the materialized
    * relation is at most `maxBroadcastDupChunks` rows, else the anti
    * join runs un-hinted and AQE picks the sides (a pathological dup
    * rate makes the relation corpus-sized). */
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
    graft.functions.TextDedup.chunkDedup(Tables.documents(s, d))
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

  /** kNN graph construction — the structure semantic dedup, diversity
    * sampling, and graph-based curation (e.g. label propagation over a
    * neighbor graph) all start from: every vector's exact top-3 cosine
    * neighbors, each edge flagged `mutual` when its reverse edge is
    * also a top-3 edge (mutual-kNN is the usual symmetrization before
    * clustering). Execution: the broadcast top-K re-rank kernel
    * (O(n·k) insertion buffer, no sort, same `maxCandidates` bound as
    * all exact kernels — a 100 TB corpus routes candidates through the
    * IVF/LSH tiers first), then the mutual flag is one equi join of
    * the n·k edge list against itself on the reversed key — the edge
    * list is k× the corpus row count, never pairs². Oracle replays
    * with an all-pairs window + self left join. */
  val knnGraph = sql("knn_graph",
    """WITH n AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       p AS (
         SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosim
         FROM n a JOIN n b ON a.vec_id <> b.vec_id),
       e AS (
         SELECT vec_id, CAST(rn AS INT) AS nn_rank, neighbor_id,
           round(cosim, 3) AS sim
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY vec_id ORDER BY cosim DESC, neighbor_id)
                 AS rn FROM p) t
         WHERE rn <= 3)
       SELECT e.vec_id, e.nn_rank, e.neighbor_id, e.sim,
         CAST(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
           AS mutual
       FROM e LEFT JOIN e r ON e.vec_id = r.neighbor_id
         AND e.neighbor_id = r.vec_id""") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val topk = graft.functions.VectorSearch.bruteForceCosineTopK(emb, emb, 3)
    val edges = topk.select(col("vec_id"), col("rank").as("nn_rank"),
      col("neighbor_id"), round(col("cosim"), 3).as("sim"))
    val rev = topk.select(col("vec_id").as("r_nbr"),
      col("neighbor_id").as("r_vec"))
    edges.join(rev,
        edges("vec_id") === rev("r_vec") &&
          edges("neighbor_id") === rev("r_nbr"), "left")
      .select(col("vec_id"), col("nn_rank"), col("neighbor_id"), col("sim"),
        when(col("r_vec").isNotNull, 1).otherwise(0).cast("int").as("mutual"))
  }

  /** kNN graph through the IVF tier — the CONCRETE 100 TB path that
    * `knn_graph`'s scale note points at: neighbor candidates come from
    * the multi-probe IVF index (each vector probes its 2 nearest of 8
    * cells; candidates scale as n·nprobe/cells, one equi join on cell,
    * no broadcast of the corpus), exact-ranked to top-3 in-cell, then
    * the same mutual-kNN symmetrization as the brute variant — one
    * equi join of the n·k edge list against its reverse. The recall
    * trade vs `knn_graph` is the standard IVF contract (only same-cell
    * neighbors found) and the oracle replays it exactly: probing,
    * home-cell membership, the top-k window, and the mutual join. */
  val knnGraphIvf = sql("knn_graph_ivf",
    """WITH n AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       c AS (SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm
             FROM n WHERE vec_id < 8),
       scored AS (
         SELECT a.vec_id, a.embedding, a.nrm, c.cid,
           row_number() OVER (PARTITION BY a.vec_id ORDER BY
             (list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                  * CAST(c.cemb[CAST(i AS INT)] AS DOUBLE)))
              / (a.nrm * c.cnrm)) DESC, c.cid) AS rn
         FROM n a CROSS JOIN c),
       p AS (
         SELECT a.vec_id, b.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosim
         FROM (SELECT * FROM scored WHERE rn <= 2) a
         JOIN (SELECT * FROM scored WHERE rn = 1) b
           ON a.cid = b.cid AND a.vec_id <> b.vec_id),
       e AS (
         SELECT vec_id, CAST(rnk AS INT) AS nn_rank, neighbor_id,
           round(cosim, 3) AS sim FROM (
           SELECT *, row_number() OVER (
             PARTITION BY vec_id ORDER BY cosim DESC, neighbor_id) AS rnk
           FROM p) t WHERE rnk <= 3)
       SELECT e.vec_id, e.nn_rank, e.neighbor_id, e.sim,
         CAST(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
           AS mutual
       FROM e LEFT JOIN e r ON e.vec_id = r.neighbor_id
         AND e.neighbor_id = r.vec_id""") { (s, d) =>
    val topk = graft.functions.VectorSearch.ivfCosineTopK(
      Tables.embeddings(s, d), k = 3, numCentroids = 8, nprobe = 2)
    val edges = topk.select(col("vec_id"),
      col("rank").cast("int").as("nn_rank"),
      col("neighbor_id"), round(col("cosim"), 3).as("sim"))
    val rev = topk.select(col("vec_id").as("r_nbr"),
      col("neighbor_id").as("r_vec"))
    edges.join(rev,
        edges("vec_id") === rev("r_vec") &&
          edges("neighbor_id") === rev("r_nbr"), "left")
      .select(col("vec_id"), col("nn_rank"), col("neighbor_id"), col("sim"),
        when(col("r_vec").isNotNull, 1).otherwise(0).cast("int").as("mutual"))
  }

  /** kNN-graph index-quality measurement — the acceptance number for
    * the IVF-tier graph before a pipeline trusts it: integer edge
    * counts of the exact brute-force top-3 graph (truth), the IVF
    * top-3 graph, and their overlap. common/brute IS edge recall;
    * common/ivf the precision (both 1.0 only when every neighbor
    * lives in a probed cell). Mirrors `ann_ivf_recall`/`ann_pq_recall`
    * for the graph operator; all counts integer → hash-exact oracle.
    * At 100 TB the brute truth runs over a vector SAMPLE (the
    * maxCandidates-capped kernel), exactly like the other recall
    * checks. */
  val knnRecall = sql("knn_recall",
    """WITH n AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       allp AS (
         SELECT a.vec_id, b.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosim
         FROM n a JOIN n b ON a.vec_id <> b.vec_id),
       brute AS (
         SELECT vec_id, neighbor_id FROM (
           SELECT vec_id, neighbor_id, row_number() OVER (
             PARTITION BY vec_id ORDER BY cosim DESC, neighbor_id) AS rn
           FROM allp) t WHERE rn <= 3),
       c AS (SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm
             FROM n WHERE vec_id < 8),
       scored AS (
         SELECT a.vec_id, a.embedding, a.nrm, c.cid,
           row_number() OVER (PARTITION BY a.vec_id ORDER BY
             (list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                  * CAST(c.cemb[CAST(i AS INT)] AS DOUBLE)))
              / (a.nrm * c.cnrm)) DESC, c.cid) AS rn
         FROM n a CROSS JOIN c),
       ivfp AS (
         SELECT a.vec_id, b.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosim
         FROM (SELECT * FROM scored WHERE rn <= 2) a
         JOIN (SELECT * FROM scored WHERE rn = 1) b
           ON a.cid = b.cid AND a.vec_id <> b.vec_id),
       ivf AS (
         SELECT vec_id, neighbor_id FROM (
           SELECT vec_id, neighbor_id, row_number() OVER (
             PARTITION BY vec_id ORDER BY cosim DESC, neighbor_id) AS rn
           FROM ivfp) t WHERE rn <= 3)
       SELECT
         CAST((SELECT count(*) FROM n) AS BIGINT) AS n_vectors,
         CAST((SELECT count(*) FROM brute) AS BIGINT) AS brute_edges,
         CAST((SELECT count(*) FROM ivf) AS BIGINT) AS ivf_edges,
         CAST((SELECT count(*) FROM brute JOIN ivf
               ON brute.vec_id = ivf.vec_id
               AND brute.neighbor_id = ivf.neighbor_id) AS BIGINT)
           AS common_edges""") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val brute = graft.functions.VectorSearch
      .bruteForceCosineTopK(emb, emb, 3)
      .select(col("vec_id"), col("neighbor_id"))
    val ivf = graft.functions.VectorSearch
      .ivfCosineTopK(emb, k = 3, numCentroids = 8, nprobe = 2)
      .select(col("vec_id").as("iv"), col("neighbor_id").as("in_"))
    val common = brute.join(ivf,
      col("vec_id") === col("iv") && col("neighbor_id") === col("in_"))
    brute.agg(count(lit(1)).as("brute_edges"))
      .crossJoin(emb.agg(count(lit(1)).as("n_vectors")))
      .crossJoin(ivf.agg(count(lit(1)).as("ivf_edges")))
      .crossJoin(common.agg(count(lit(1)).as("common_edges")))
      .select(col("n_vectors"), col("brute_edges"), col("ivf_edges"),
        col("common_edges"))
  }

  val all: Seq[QueryDef] = Seq(textPiiScrub, textChunkDedup,
    graphComponentsStar, knnGraph, knnGraphIvf, knnRecall)
}
