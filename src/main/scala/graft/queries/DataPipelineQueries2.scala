package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{ConnectedComponents, QualityFilters, TextDedup, VectorSearch}

/** Round-3 training-data pipeline operators: the sequential quality
  * funnel (C4/Gopher-style rule chain), keep-best soft dedup (cluster
  * representative by quality instead of first-id), and the
  * centroid-codebook IVF ANN path (the trained-quantizer upgrade of
  * the sign-bucket variant).
  */
object DataPipelineQueries2 {
  import QueryDef._

  private def withFewPartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }

  /** Same shingle CTE as DataPipelineQueries (shared plan fragment on
    * the Spark side hits the same cache). */
  private val shingleCte =
    """WITH w AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-1, 1))) AS i) t)"""

  private[queries] val stopAll = graft.functions.TextCuration.DemoStopwords

  /** Sequential quality-filter funnel: how many documents survive each
    * rule of the chain (min length → mean token length → has stopwords
    * → declared-language filter). One codegen'd aggregate over one
    * scan regardless of rule count — the per-rule accounting a corpus
    * pipeline reports after every filtering run. */
  val qualityFunnel = sql("quality_funnel",
    s"""WITH w AS (
          SELECT doc_id, lang,
            list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
        f AS (SELECT
          len(w) >= 20 AS r1,
          floor(length(array_to_string(w, '')) * 100.0
            / greatest(len(w), 1)) BETWEEN 300 AND 799 AS r2,
          len(list_filter(w, x -> x IN (${stopAll.map(w => s"'$w'").mkString(", ")}))) >= 1 AS r3,
          lang = 'en' AS r4
          FROM w),
        agg AS (SELECT
          CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
          CAST(SUM(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
          CAST(SUM(CASE WHEN r1 AND r2 AND r3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
          CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT) AS c4
          FROM f)
        SELECT CAST(1 AS BIGINT) AS stage, 'min_tokens' AS rule, c1 AS n_pass FROM agg
        UNION ALL SELECT 2, 'mean_token_len', c2 FROM agg
        UNION ALL SELECT 3, 'has_stopwords', c3 FROM agg
        UNION ALL SELECT 4, 'lang_en', c4 FROM agg""") { (s, d) =>
    val docs = TextDedup.withTokens(Tables.documents(s, d))
      .withColumn("n_tokens", size(col("w")))
      .withColumn("mwl_cc", QualityFilters.meanTokenLenCentichars(col("w")))
      // arrays_overlap, not stopwordHits(...) >= 1: existence is all
      // this rule needs, and the overlap form is codegen'd with early
      // exit where the count form is an interpreted filter lambda
      // whose cost grew with the r4 multi-language stop list
      .withColumn("has_stop",
        graft.functions.TextStats.hasAnyStopword("w", stopAll))
    QualityFilters.funnel(docs, Seq(
      "min_tokens" -> (col("n_tokens") >= 20),
      "mean_token_len" -> col("mwl_cc").between(300, 799),
      "has_stopwords" -> col("has_stop"),
      "lang_en" -> (col("lang") === "en")))
  }

  /** Keep-best soft dedup: cluster the near-dup graph (same Jaccard >=
    * 0.8 edges as dedup_clusters), then keep the longest document per
    * cluster (doc_id tiebreak) instead of the first — the quality-aware
    * representative policy. The oracle re-walks the graph with a
    * recursive CTE and picks the same argmax. */
  val dedupKeepBest = sql("dedup_keep_best",
    "WITH RECURSIVE" + shingleCte.stripPrefix("WITH") + """,
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       pr AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       ed AS (
         SELECT d1, d2 FROM pr
         JOIN sz x ON x.doc_id = d1 JOIN sz y ON y.doc_id = d2
         WHERE 5 * common >= 4 * (x.n + y.n - common)),
       edges AS (SELECT d1 AS src, d2 AS dst FROM ed
                 UNION ALL SELECT d2, d1 FROM ed),
       walk(node, label) AS (
         SELECT src, src FROM edges
         UNION
         SELECT e.dst, wk.label FROM walk wk JOIN edges e ON e.src = wk.node),
       cl AS (
         SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(min(label) AS BIGINT) AS cluster_id
         FROM walk GROUP BY node)
       SELECT cluster_id, rep_id, rep_score, sz FROM (
         SELECT cl.cluster_id, cl.doc_id AS rep_id, d.n_chars AS rep_score,
           row_number() OVER (PARTITION BY cl.cluster_id
             ORDER BY d.n_chars DESC, cl.doc_id) AS rn,
           count(*) OVER (PARTITION BY cl.cluster_id) AS sz
         FROM cl JOIN documents d ON d.doc_id = cl.doc_id) t
       WHERE rn = 1""") { (s, d) =>
    // the dedup family's shared shingle scan (memoized persist)
    val sh = DataPipelineQueries.checkpointedShingles(s, d)
    val ed = TextDedup.jaccardPairs(sh, num = 4, den = 5)
      .select(col("d1").as("src"), col("d2").as("dst"))
    val labels = withFewPartitions(s, 4) { ConnectedComponents.run(s, ed) }
    TextDedup.clusterRepresentatives(labels, Tables.documents(s, d))
  }

  /** IVF ANN with a centroid codebook (single-probe): assign every
    * vector to its max-cosine centroid, search top-1 within the cell.
    * The deterministic codebook (first 8 vectors by id) stands in for
    * a trained k-means codebook; the plan shape — broadcast codebook
    * scan, equi join on cell id — is exactly the production IVF one. */
  val annIvfTop1 = sql("ann_ivf_top1",
    """WITH n AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       c AS (SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm
             FROM n WHERE vec_id < 8),
       asg AS (
         SELECT vec_id, embedding, nrm, cid FROM (
           SELECT a.vec_id, a.embedding, a.nrm, c.cid,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               (list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                    * CAST(c.cemb[CAST(i AS INT)] AS DOUBLE)))
                / (a.nrm * c.cnrm)) DESC, c.cid) AS rn
           FROM n a CROSS JOIN c) t WHERE rn = 1),
       p AS (
         SELECT a.vec_id, a.cid AS cell, b.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosim
         FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id)
       SELECT vec_id, CAST(cell AS BIGINT) AS cell, neighbor_id,
         round(cosim, 3) AS sim FROM (
         SELECT *, row_number() OVER (
           PARTITION BY vec_id ORDER BY cosim DESC, neighbor_id) AS rn
         FROM p) t WHERE rn = 1""") { (s, d) =>
    VectorSearch.ivfCosineTop1(Tables.embeddings(s, d), numCentroids = 8)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("neighbor_id"), round(col("cosim"), 3).as("sim"))
  }

  /** IVF ANN over a TRAINED codebook: 4 rounds of distributed Lloyd's
    * k-means (VectorSearch.trainKmeansCodebook — one shuffle-free
    * assignment+partial-sum job per round, integer fixed-point sums so
    * centroids are bit-identical regardless of partitioning), then the
    * same in-cell top-1 as `ann_ivf_top1`. The k-means loop is not
    * SQL-expressible → the oracle is a verify-time VALUES literal from
    * the independent driver-side replay (trainKmeansRef + assignRef +
    * exact in-cell top-1) — the same dynamic-oracle mechanism as the
    * BPE checks. */
  val annIvfTrainedTop1 = replayed("ann_ivf_trained_top1") { (s, d) =>
    VectorSearch.ivfCosineTop1Trained(Tables.embeddings(s, d),
        numCentroids = 8, iters = 4)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("neighbor_id"), round(col("cosim"), 3).as("sim"))
  } { (s, d) =>
    import s.implicits._
    // ORACLE GENERATION ONLY (sf0.01 scale): replay k-means, the cell
    // assignment, and the exact in-cell top-1 with plain driver loops.
    val vecs = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
    val cb = VectorSearch.trainKmeansRef(vecs, k = 8, iters = 4)
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var na = 0.0; var nb = 0.0; var dot = 0.0; var i = 0
      while (i < a.length) {
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        dot += a(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = vecs.groupBy { case (_, e) => VectorSearch.assignRef(e, cb) }
      .toSeq.flatMap { case (cell, members) =>
        if (members.length < 2) Nil
        else members.map { case (id, emb) =>
          val (nid, sim) = members.iterator.filter(_._1 != id)
            .map { case (oid, oemb) => (oid, cosine(emb, oemb)) }
            .reduceLeft { (p, q) =>
              if (q._2 > p._2 || (q._2 == p._2 && q._1 < p._1)) q else p
            }
          val rounded = java.math.BigDecimal.valueOf(sim)
            .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
          (id, cell, nid, rounded)
        }
      }.sortBy(_._1)
    val values = rows.map { case (id, cell, nid, sim) =>
      s"($id, $cell, $nid, $sim)"
    }.mkString(", ")
    s"""SELECT CAST(v AS BIGINT) AS vec_id, CAST(c AS BIGINT) AS cell,
          CAST(n AS BIGINT) AS neighbor_id, CAST(s AS DOUBLE) AS sim
        FROM (VALUES $values) AS t(v, c, n, s)"""
  }

  /** Multi-probe IVF cosine top-k (nprobe=2, k=3): the recall knob of
    * a production IVF index — each vector probes its 2 nearest cells
    * and exact-ranks against the vectors living there. Plan shape is
    * identical to single-probe (shuffle-free probe kernel, one equi
    * join on cell, one window); candidates scale as n·nprobe/cells.
    * The oracle replays probing, home-cell membership, and the top-k
    * window in SQL. */
  val annIvfTopK = sql("ann_ivf_topk",
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
           ON a.cid = b.cid AND a.vec_id <> b.vec_id)
       SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rank,
         round(cosim, 3) AS sim FROM (
         SELECT *, row_number() OVER (
           PARTITION BY vec_id ORDER BY cosim DESC, neighbor_id) AS rnk
         FROM p) t WHERE rnk <= 3""") { (s, d) =>
    VectorSearch.ivfCosineTopK(Tables.embeddings(s, d),
        k = 3, numCentroids = 8, nprobe = 2)
      .select(col("vec_id"), col("neighbor_id"), col("rank"),
        round(col("cosim"), 3).as("sim"))
  }

  /** Query-time IVF search (VectorSearch.ivfSearch): vectors with
    * id % 5 = 0 act as the incoming query batch, the rest as the
    * indexed corpus (deterministic split, reproduced by the oracle).
    * The corpus participates only through its cell assignment — the
    * serving-mode shape where per-query cost tracks the batch and
    * cell density, never the corpus. nprobe=2, top-1. */
  val annIvfSearch = sql("ann_ivf_search",
    """WITH n AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       c AS (SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm
             FROM n WHERE vec_id < 8),
       corpus AS (SELECT * FROM n WHERE vec_id % 5 <> 0),
       batch AS (SELECT * FROM n WHERE vec_id % 5 = 0),
       chome AS (
         SELECT vec_id, embedding, nrm, cid FROM (
           SELECT a.vec_id, a.embedding, a.nrm, c.cid,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               (list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                    * CAST(c.cemb[CAST(i AS INT)] AS DOUBLE)))
                / (a.nrm * c.cnrm)) DESC, c.cid) AS rn
           FROM corpus a CROSS JOIN c) t WHERE rn = 1),
       bprobe AS (
         SELECT vec_id, embedding, nrm, cid FROM (
           SELECT a.vec_id, a.embedding, a.nrm, c.cid,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               (list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                    * CAST(c.cemb[CAST(i AS INT)] AS DOUBLE)))
                / (a.nrm * c.cnrm)) DESC, c.cid) AS rn
           FROM batch a CROSS JOIN c) t WHERE rn <= 2),
       p AS (
         SELECT a.vec_id, b.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosim
         FROM bprobe a JOIN chome b
           ON a.cid = b.cid AND a.vec_id <> b.vec_id)
       SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rank,
         round(cosim, 3) AS sim FROM (
         SELECT *, row_number() OVER (
           PARTITION BY vec_id ORDER BY cosim DESC, neighbor_id) AS rnk
         FROM p) t WHERE rnk <= 1""") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val cents = VectorSearch.firstKCodebook(emb, 8)
    val corpus = VectorSearch.assignWithCodebook(
      emb.where(col("vec_id") % 5 =!= 0), cents)
    val batch = emb.where(col("vec_id") % 5 === 0)
    VectorSearch.ivfSearch(batch, corpus, cents, k = 1, nprobe = 2)
      .select(col("vec_id"), col("neighbor_id"), col("rank"),
        round(col("cosim"), 3).as("sim"))
  }

  /** Int8 scalar quantization of the embedding table: per-dimension
    * min-max codes over fixed-point components — the compression pass
    * between profiling (emb_dim_stats) and indexing. All-integer
    * arithmetic end to end, so codes are bit-identical across engines
    * and accumulation orders. */
  val embQuantize = sql("emb_quantize",
    """WITH fx AS (
         SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
           CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)
             AS BIGINT) AS fx
         FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t),
       st AS (SELECT dim, min(fx) AS mn, max(fx) AS mx FROM fx GROUP BY dim)
       SELECT f.vec_id, f.dim,
         CAST((f.fx - s.mn) * 255 // greatest(s.mx - s.mn, 1) AS INT) AS code
       FROM fx f JOIN st s ON f.dim = s.dim""") { (s, d) =>
    VectorSearch.scalarQuantizeCodes(Tables.embeddings(s, d))
  }

  /** Product-quantization code words (VectorSearch.pqAssign): 4
    * subspaces of 16 dims, 16 codes each — 256-byte vectors become
    * 4-byte words (the memory-side compression that complements IVF's
    * search-side narrowing). Assignment is a shuffle-free broadcast-
    * codebook kernel; all distances are fixed-point INTEGER sums, so
    * the code words and distortions are bit-identical in DuckDB. */
  val embPqCodes = sql("emb_pq_codes",
    """WITH fx AS (
         SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS sub, i - 1 AS pos,
           CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)
             AS BIGINT) AS fx
         FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t),
       cb AS (SELECT vec_id AS code, sub, pos, fx AS cfx
              FROM fx WHERE vec_id < 16),
       dist AS (
         SELECT f.vec_id, f.sub, c.code,
           sum((f.fx - c.cfx) * (f.fx - c.cfx)) AS d2
         FROM fx f JOIN cb c ON c.sub = f.sub AND c.pos = f.pos
         GROUP BY 1, 2, 3),
       best AS (
         SELECT vec_id, sub, code, d2, row_number() OVER (
           PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
         FROM dist)
       SELECT vec_id,
         string_agg(CAST(code AS VARCHAR), '|' ORDER BY sub) AS pq,
         CAST(sum(d2) AS BIGINT) AS d2_total
       FROM best WHERE rn = 1 GROUP BY vec_id""") { (s, d) =>
    VectorSearch.pqAssign(Tables.embeddings(s, d), m = 4, codesPerSub = 16)
      .groupBy(col("vec_id"))
      .agg(expr("""array_join(transform(array_sort(collect_list(
             struct(sub, code))), x -> CAST(x.code AS STRING)), '|')""")
          .as("pq"),
        sum(col("d2")).as("d2_total"))
  }

  /** PQ codes from a TRAINED per-subspace codebook: 4 rounds of
    * integer-arithmetic Lloyd's per subspace
    * (VectorSearch.trainPqCodebook — fixed-point L2 assignment,
    * floorDiv integer means; one shuffle-free job per round), then the
    * same code-word rollup as `emb_pq_codes`. Training is pure integer
    * arithmetic end to end, so codes AND the learned codebook are
    * bit-identical on any partitioning; checked against the
    * independent driver replay via a verify-time VALUES oracle. The
    * trained codebook must not increase total distortion vs first-k —
    * VectorSearchSpec pins that too. */
  val embPqTrainedCodes = replayed("emb_pq_trained_codes") { (s, d) =>
    val cb = VectorSearch.trainPqCodebook(Tables.embeddings(s, d),
      m = 4, codesPerSub = 16, iters = 4)
    VectorSearch.pqAssignWith(Tables.embeddings(s, d), cb)
      .groupBy(col("vec_id"))
      .agg(expr("""array_join(transform(array_sort(collect_list(
             struct(sub, code))), x -> CAST(x.code AS STRING)), '|')""")
          .as("pq"),
        sum(col("d2")).as("d2_total"))
  } { (s, d) =>
    import s.implicits._
    // ORACLE GENERATION ONLY: full driver replay of training + codes.
    val vecs = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
    val m = 4
    val cb = VectorSearch.trainPqCodebookRef(vecs, m = m, codesPerSub = 16,
      iters = 4)
    val scale = 1048576L
    val rows = vecs.map { case (id, emb) =>
      val sd = emb.length / m
      val fx = emb.map(v => math.floor(v.toDouble * scale).toLong)
      val perSub = (0 until m).map { sub =>
        val (idx, d2) = VectorSearch.pqNearestRef(fx, cb(sub), sub * sd, sd)
        (cb(sub)(idx)._1, d2)
      }
      (id, perSub.map(_._1).mkString("|"), perSub.map(_._2).sum)
    }
    val values = rows.map { case (id, pq, d2) => s"($id, '$pq', $d2)" }
      .mkString(", ")
    s"""SELECT CAST(v AS BIGINT) AS vec_id, p AS pq,
          CAST(d AS BIGINT) AS d2_total
        FROM (VALUES $values) AS t(v, p, d)"""
  }

  /** PQ asymmetric-distance (ADC) top-1 (VectorSearch.pqAdcTop1):
    * queries (id % 5 = 0) search the corpus from its 4-byte PQ code
    * words alone — per-query lookup tables over the shared codebook,
    * m table lookups per candidate instead of d multiplies, corpus
    * embeddings never read. All-integer arithmetic end to end, so the
    * scores and ties are engine-exact and the oracle replays the LUT
    * join in SQL. */
  val annPqAdcTop1 = sql("ann_pq_adc_top1",
    """WITH fx AS (
         SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS sub, i - 1 AS pos,
           CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)
             AS BIGINT) AS fx
         FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t),
       cb AS (SELECT vec_id AS code, sub, pos, fx AS cfx
              FROM fx WHERE vec_id < 16),
       dist AS (
         SELECT f.vec_id, f.sub, c.code,
           sum((f.fx - c.cfx) * (f.fx - c.cfx)) AS d2
         FROM fx f JOIN cb c ON c.sub = f.sub AND c.pos = f.pos
         GROUP BY 1, 2, 3),
       codes AS (
         SELECT vec_id, sub, code FROM (
           SELECT vec_id, sub, code, row_number() OVER (
             PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
           FROM dist) t WHERE rn = 1),
       q AS (SELECT vec_id AS qid, sub, pos, fx AS qfx
             FROM fx WHERE vec_id % 5 = 0),
       lut AS (
         SELECT q.qid, c.sub, c.code,
           sum((q.qfx - c.cfx) * (q.qfx - c.cfx)) AS d2
         FROM q JOIN cb c ON c.sub = q.sub AND c.pos = q.pos
         GROUP BY 1, 2, 3),
       score AS (
         SELECT l.qid, k.vec_id AS nid, sum(l.d2) AS s
         FROM codes k JOIN lut l ON l.sub = k.sub AND l.code = k.code
         WHERE k.vec_id <> l.qid
         GROUP BY 1, 2)
       SELECT qid AS vec_id, nid AS neighbor_id,
         CAST(s AS BIGINT) AS d2_adc FROM (
         SELECT *, row_number() OVER (
           PARTITION BY qid ORDER BY s, nid) AS rn FROM score) t
       WHERE rn = 1""") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val cb = VectorSearch.firstKPqCodebook(emb, m = 4, codesPerSub = 16)
    val codes = VectorSearch.pqAssignWith(emb, cb)
    VectorSearch.pqAdcTop1(emb.where(col("vec_id") % 5 === 0), codes, cb)
  }

  /** PQ quantization-quality measurement — recall@1 of ADC search
    * (integer LUT distances over 4-byte code words) against the exact
    * cosine answer for the same query batch: THE number that decides a
    * compression config (m × codesPerSub) before the index ships, and
    * the companion to `ann_ivf_recall` for the compression tier. ADC
    * minimizes quantized L2 while the truth maximizes exact cosine, so
    * the match count directly measures what quantization costs. All
    * integer counts → hash-exact oracle (the ADC side replays the
    * integer LUT join in SQL; the brute side the cosine argmax). */
  val annPqRecall = sql("ann_pq_recall",
    """WITH fx AS (
         SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS sub, i - 1 AS pos,
           CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)
             AS BIGINT) AS fx
         FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t),
       cb AS (SELECT vec_id AS code, sub, pos, fx AS cfx
              FROM fx WHERE vec_id < 16),
       dist AS (
         SELECT f.vec_id, f.sub, c.code,
           sum((f.fx - c.cfx) * (f.fx - c.cfx)) AS d2
         FROM fx f JOIN cb c ON c.sub = f.sub AND c.pos = f.pos
         GROUP BY 1, 2, 3),
       codes AS (
         SELECT vec_id, sub, code FROM (
           SELECT vec_id, sub, code, row_number() OVER (
             PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
           FROM dist) t WHERE rn = 1),
       q AS (SELECT vec_id AS qid, sub, pos, fx AS qfx
             FROM fx WHERE vec_id % 5 = 0),
       lut AS (
         SELECT q.qid, c.sub, c.code,
           sum((q.qfx - c.cfx) * (q.qfx - c.cfx)) AS d2
         FROM q JOIN cb c ON c.sub = q.sub AND c.pos = q.pos
         GROUP BY 1, 2, 3),
       score AS (
         SELECT l.qid, k.vec_id AS nid, sum(l.d2) AS s
         FROM codes k JOIN lut l ON l.sub = k.sub AND l.code = k.code
         WHERE k.vec_id <> l.qid
         GROUP BY 1, 2),
       adc AS (
         SELECT qid AS vec_id, nid AS neighbor_id FROM (
           SELECT *, row_number() OVER (
             PARTITION BY qid ORDER BY s, nid) AS rn FROM score) t
         WHERE rn = 1),
       n AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       brute AS (
         SELECT vec_id, neighbor_id FROM (
           SELECT a.vec_id, b.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               (list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                    * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
                / (a.nrm * b.nrm)) DESC, b.vec_id) AS rn
           FROM n a JOIN n b ON a.vec_id <> b.vec_id
           WHERE a.vec_id % 5 = 0) t WHERE rn = 1)
       SELECT CAST(count(b.vec_id) AS BIGINT) AS n_queries,
         CAST(count(a.neighbor_id) AS BIGINT) AS n_found,
         CAST(sum(CASE WHEN a.neighbor_id = b.neighbor_id
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       FROM brute b LEFT JOIN adc a ON a.vec_id = b.vec_id""") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val batch = emb.where(col("vec_id") % 5 === 0)
    val cb = VectorSearch.firstKPqCodebook(emb, m = 4, codesPerSub = 16)
    val codes = VectorSearch.pqAssignWith(emb, cb)
    val adc = VectorSearch.pqAdcTop1(batch, codes, cb)
      .select(col("vec_id"), col("neighbor_id"))
    val brute = VectorSearch.bruteForceCosineTop1(batch, emb)
      .select(col("vec_id"), col("neighbor_id").as("bn"))
    brute.join(adc, Seq("vec_id"), "left")
      .agg(count(col("vec_id")).as("n_queries"),
        count(col("neighbor_id")).as("n_found"),
        sum(when(col("neighbor_id") === col("bn"), 1L).otherwise(0L))
          .as("n_correct"))
  }

  /** IVF-PQ composite search (VectorSearch.ivfPqSearch) — the
    * billion-vector serving architecture (FAISS IndexIVFPQ,
    * no-residual): vectors with id % 5 = 0 are the query batch, the
    * rest the indexed corpus, materialized as the (vec_id, cell, sub,
    * code) inverted-list relation (pqAssignWithCell over the coarse
    * assignment). Each query probes its 2 nearest coarse cells and
    * ADC-scores ONLY the code words living there — the IVF tier
    * narrows where to look, the PQ tier shrinks what is read, and
    * corpus embeddings are never touched at query time. The oracle
    * replays both tiers in SQL: coarse assignment + probe windows from
    * the ann_ivf_search oracle, code assignment + LUT scoring from the
    * ann_pq_* oracles, joined through the cell gate. */
  val annIvfPqSearch = sql("ann_ivfpq_search",
    """WITH n AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       c AS (SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm
             FROM n WHERE vec_id < 8),
       chome AS (
         SELECT vec_id, cid FROM (
           SELECT a.vec_id, c.cid,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               (list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                    * CAST(c.cemb[CAST(i AS INT)] AS DOUBLE)))
                / (a.nrm * c.cnrm)) DESC, c.cid) AS rn
           FROM (SELECT * FROM n WHERE vec_id % 5 <> 0) a CROSS JOIN c) t
         WHERE rn = 1),
       bprobe AS (
         SELECT vec_id, cid FROM (
           SELECT a.vec_id, c.cid,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               (list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                    * CAST(c.cemb[CAST(i AS INT)] AS DOUBLE)))
                / (a.nrm * c.cnrm)) DESC, c.cid) AS rn
           FROM (SELECT * FROM n WHERE vec_id % 5 = 0) a CROSS JOIN c) t
         WHERE rn <= 2),
       fx AS (
         SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS sub, i - 1 AS pos,
           CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)
             AS BIGINT) AS fx
         FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t),
       cbk AS (SELECT vec_id AS code, sub, pos, fx AS cfx
               FROM fx WHERE vec_id < 16),
       dist AS (
         SELECT f.vec_id, f.sub, c.code,
           sum((f.fx - c.cfx) * (f.fx - c.cfx)) AS d2
         FROM (SELECT * FROM fx WHERE vec_id % 5 <> 0) f
         JOIN cbk c ON c.sub = f.sub AND c.pos = f.pos
         GROUP BY 1, 2, 3),
       codes AS (
         SELECT vec_id, sub, code FROM (
           SELECT vec_id, sub, code, row_number() OVER (
             PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
           FROM dist) t WHERE rn = 1),
       q AS (SELECT vec_id AS qid, sub, pos, fx AS qfx
             FROM fx WHERE vec_id % 5 = 0),
       lut AS (
         SELECT q.qid, c.sub, c.code,
           sum((q.qfx - c.cfx) * (q.qfx - c.cfx)) AS d2
         FROM q JOIN cbk c ON c.sub = q.sub AND c.pos = q.pos
         GROUP BY 1, 2, 3),
       score AS (
         SELECT l.qid, k.vec_id AS nid, sum(l.d2) AS s
         FROM codes k
         JOIN chome ch ON ch.vec_id = k.vec_id
         JOIN bprobe bp ON bp.cid = ch.cid
         JOIN lut l ON l.qid = bp.vec_id
           AND l.sub = k.sub AND l.code = k.code
         GROUP BY 1, 2)
       SELECT qid AS vec_id, nid AS neighbor_id,
         CAST(s AS BIGINT) AS d2_adc
       FROM (SELECT *, row_number() OVER (
         PARTITION BY qid ORDER BY s, nid) AS rn FROM score) t
       WHERE rn = 1""") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val cents = VectorSearch.firstKCodebook(emb, 8)
    val cb = VectorSearch.firstKPqCodebook(emb, m = 4, codesPerSub = 16)
    val corpus = VectorSearch.assignWithCodebook(
      emb.where(col("vec_id") % 5 =!= 0), cents)
    val codes = VectorSearch.pqAssignWithCell(corpus, cb)
    val batch = emb.where(col("vec_id") % 5 === 0)
    VectorSearch.ivfPqSearch(batch, codes, cb, cents, nprobe = 2)
  }

  /** ANN index-quality measurement — recall@1 of the IVF index against
    * the exact brute-force answer, per nprobe — the acceptance check a
    * production pipeline runs before deploying an index (and the
    * monotone recall-vs-cost curve the nprobe knob exists for). All
    * counts are integers (no float recall division), so the row is
    * hash-exact. At 100 TB the brute side runs over a SAMPLE of probes
    * (the maxCandidates-capped kernel); recall estimation needs only a
    * sample — here the corpus is check-sized and the bound admits it
    * whole. The oracle replays probing, home cells, both top-1s, and
    * the match counts in SQL. */
  val annIvfRecall = sql("ann_ivf_recall",
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
       brute AS (
         SELECT vec_id, neighbor_id FROM (
           SELECT a.vec_id, b.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               (list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                    * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
                / (a.nrm * b.nrm)) DESC, b.vec_id) AS rn
           FROM n a JOIN n b ON a.vec_id <> b.vec_id) t WHERE rn = 1),
       probes AS (SELECT 1 AS nprobe UNION ALL SELECT 2),
       ivf AS (
         SELECT pr.nprobe, a.vec_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY pr.nprobe, a.vec_id ORDER BY
             (list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                  * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
              / (a.nrm * b.nrm)) DESC, b.vec_id) AS rn
         FROM probes pr
         JOIN scored a ON a.rn <= pr.nprobe
         JOIN (SELECT * FROM scored WHERE rn = 1) b
           ON b.cid = a.cid AND a.vec_id <> b.vec_id),
       top AS (SELECT nprobe, vec_id, neighbor_id FROM ivf WHERE rn = 1)
       SELECT CAST(pr.nprobe AS BIGINT) AS nprobe,
         CAST(count(b.vec_id) AS BIGINT) AS n_vectors,
         CAST(count(t.neighbor_id) AS BIGINT) AS n_found,
         CAST(sum(CASE WHEN t.neighbor_id = b.neighbor_id
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       FROM probes pr
       CROSS JOIN brute b
       LEFT JOIN top t ON t.nprobe = pr.nprobe AND t.vec_id = b.vec_id
       GROUP BY pr.nprobe""") { (s, d) =>
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val brute = VectorSearch.bruteForceCosineTop1(emb, emb)
      .select(col("vec_id"), col("neighbor_id").as("bn"))
    val ivf = Seq(1, 2).map { np =>
      VectorSearch.ivfCosineTopK(emb, k = 1, numCentroids = 8, nprobe = np)
        .where(col("rank") === 1)
        .select(lit(np.toLong).as("nprobe"), col("vec_id"),
          col("neighbor_id"))
    }.reduce(_ unionByName _)
    Seq(1L, 2L).toDF("nprobe").crossJoin(brute)
      .join(ivf, Seq("nprobe", "vec_id"), "left")
      .groupBy(col("nprobe"))
      .agg(count(col("vec_id")).as("n_vectors"),
        count(col("neighbor_id")).as("n_found"),
        sum(when(col("neighbor_id") === col("bn"), 1L).otherwise(0L))
          .as("n_correct"))
  }

  val all: Seq[QueryDef] = Seq(
    qualityFunnel, dedupKeepBest, annIvfTop1, annIvfTrainedTop1,
    annIvfTopK, annIvfSearch, embQuantize, embPqCodes, embPqTrainedCodes,
    annPqAdcTop1, annIvfRecall, annPqRecall, annIvfPqSearch)
}
