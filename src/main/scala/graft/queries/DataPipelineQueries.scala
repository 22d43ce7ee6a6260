package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Large-scale training-data pipeline operators (the north-star extension
  * surface): deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash),
  * similarity search (brute-force cosine top-k and a bucketed scale
  * variant), and text analysis (language ID, quality scoring, token
  * counting, fingerprinting).
  *
  * Everything is expressed with codegen'd built-in functions (no UDFs) so
  * the whole pipeline stays inside WholeStageCodegen, and every operator
  * has a DuckDB oracle. Portable hashing uses md5 — identical output in
  * both engines — so even the probabilistic operators (MinHash bands) are
  * bit-deterministic and hash-checkable.
  *
  * Scale notes (100 TB): the pairwise n-gram Jaccard join is the
  * *verification* stage only; candidate generation at scale is the
  * MinHash/LSH operator (shuffle keyed on band signature, candidates ≪
  * pairs). The brute-force cosine join is the correctness baseline for the
  * bucketed variant, which prunes the cross product by sign-pattern
  * buckets (an IVF-style coarse quantizer).
  */
object DataPipelineQueries {
  import QueryDef._

  /** Whitespace tokens, empties dropped — the tokenization contract
    * shared with the DuckDB oracle (string_split + list_filter). The
    * operators themselves live in graft.functions.TextDedup; these
    * queries are its oracle-checked exercises. */
  private def docsWithTokens(s: SparkSession, d: String): DataFrame =
    graft.functions.TextDedup.withTokens(Tables.documents(s, d))

  /** The distinct shingle relation — the dedup FAMILY's shared scan,
    * memoized per (session, dataset) and `persist()`ed: every dedup
    * consumer across the suite (jaccard verify, LSH, clusters,
    * keep-best, incremental) branches from the same cached relation,
    * so the tokenize+shingle pass over the corpus runs once per suite
    * run instead of once per query (at sf0.1 that pass dominated the
    * bench's five most expensive queries). Each query stays
    * independently correct — a cold session just computes it on first
    * use; this is a materialized intermediate, not cross-query result
    * coupling.
    *
    * `persist()`, NOT `localCheckpoint`: a checkpoint truncates
    * lineage, so a harness that clears storage between timed runs
    * (graft.Bench.resetStorage) or a memory-pressure eviction on a
    * contended host kills the blocks with nothing to recompute from —
    * every later read throws, unrecoverably (this was the one recorded
    * failure in the round-5 driver bench). A persisted plan keeps its
    * lineage: an evicted or unpersisted block silently recomputes from
    * the parquet scan — worst case the shared pass re-runs, never a
    * failure. If a storage reset dropped the cache entry entirely we
    * re-register it at hand-out so within-query branch sharing (the
    * dedup queries each read the relation 2-4×) is always in effect. */
  private val shingleCache =
    scala.collection.mutable.HashMap.empty[(SparkSession, String), DataFrame]
  private[queries] def checkpointedShingles(s: SparkSession, d: String): DataFrame =
    shingleCache.synchronized {
      // drop entries for stopped sessions: test suites create many
      // sessions and the memo must not retain them (or their plans)
      // past stop()
      shingleCache.filterInPlace { case ((sess, _), _) =>
        !sess.sparkContext.isStopped }
      val df = shingleCache.getOrElseUpdate((s, d),
        graft.functions.TextDedup.shingles(Tables.documents(s, d)))
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    }

  /** Run `body` with a temporarily lowered shuffle-partition count —
    * for iterative driver loops over small derived relations (e.g. the
    * near-dup edge graph), where per-round fixed task overhead at the
    * session's full partition count dwarfs the actual work. Restored
    * afterward; a big-graph run would keep the session setting. */
  private[queries] def withFewPartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }

  /** Shared oracle CTE: distinct word 3-gram shingles per doc. */
  private val shingleCte =
    """WITH w AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-1, 1))) AS i) t)"""

  // ---- embedding column analytics --------------------------------------

  /** Per-dimension statistics over the whole embedding table — the
    * columnar profile pass a vector store runs before indexing (means
    * feed centroid seeds; min/max feed scalar quantization). Float
    * components are fixed-pointed by floor(v·2^20): scaling by a power
    * of two is exact in IEEE arithmetic and floor is engine-portable,
    * so the integer sums are bit-exact where a raw float sum would
    * depend on accumulation order. One posexplode + one hash aggregate
    * — at 100 TB this is a single shuffle keyed on the (tiny) dim. */
  val embDimStats = sql("emb_dim_stats",
    """SELECT CAST(i - 1 AS BIGINT) AS dim, count(*) AS n,
       CAST(SUM(CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
             * 1048576) AS BIGINT)) AS BIGINT) AS sum_fx,
       CAST(MIN(CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
             * 1048576) AS BIGINT)) AS BIGINT) AS min_fx,
       CAST(MAX(CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
             * 1048576) AS BIGINT)) AS BIGINT) AS max_fx
       FROM embeddings,
         LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
       GROUP BY 1""") { (s, d) =>
    Tables.embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("pos").cast("long").as("dim"),
        floor(col("v").cast("double") * 1048576).cast("long").as("fx"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("fx")).as("sum_fx"),
        min(col("fx")).as("min_fx"), max(col("fx")).as("max_fx"))
  }

  /** Top-k vectors by fixed-point squared norm (vec_id tiebreak): the
    * magnitude screen that precedes normalization. Executes as
    * TakeOrderedAndProject over one aggregate — no global sort. */
  val embNormTopk = sql("emb_norm_topk",
    """SELECT vec_id, CAST(norm_fx AS BIGINT) AS norm_fx FROM (
         SELECT vec_id,
           SUM(CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
               * 1048576) AS BIGINT)
             * CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
               * 1048576) AS BIGINT)) AS norm_fx
         FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
         GROUP BY vec_id) z
       ORDER BY norm_fx DESC, vec_id LIMIT 10""") { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"), explode(col("embedding")).as("v"))
      .select(col("vec_id"),
        floor(col("v").cast("double") * 1048576).cast("long").as("fx"))
      .groupBy(col("vec_id"))
      .agg(sum(col("fx") * col("fx")).as("norm_fx"))
      .orderBy(col("norm_fx").desc, col("vec_id"))
      .limit(10)
  }

  // ---- deduplication ---------------------------------------------------

  /** Exact dedup: hash-groupBy on content. At 100 TB this groups on
    * md5(text) (fixed-width shuffle key) rather than the raw text. */
  val dedupExactStats = sql("dedup_exact_stats",
    """SELECT count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_distinct,
       count(*) - count(DISTINCT md5(text)) AS n_dups
       FROM documents""") { (s, d) =>
    Tables.documents(s, d).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_distinct"),
      (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dups"))
  }

  /** Exact dedup keep-first: survivors are min(doc_id) per content hash. */
  val dedupKeepFirst = sql("dedup_keep_first",
    """SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS group_size
       FROM documents GROUP BY md5(text)""") { (s, d) =>
    Tables.documents(s, d).groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_size"))
      .select(col("keep_id"), col("group_size"))
  }

  /** N-gram Jaccard near-dup pairs, jaccard >= 0.8 — kept in integer
    * arithmetic (5*common >= 4*union) so there is no float boundary.
    * This is the exhaustive verifier; LSH below is the candidate
    * generator at scale. */
  val dedupJaccard = sql("dedup_jaccard",
    shingleCte + """,
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       pairs AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT d1, d2, common, x.n AS n1, y.n AS n2
       FROM pairs JOIN sz x ON x.doc_id = d1 JOIN sz y ON y.doc_id = d2
       WHERE 5 * common >= 4 * (x.n + y.n - common)""") { (s, d) =>
    graft.functions.TextDedup.jaccardPairs(
      checkpointedShingles(s, d), num = 4, den = 5)
  }

  /** The same exhaustive verifier behind a HOT-SHINGLE STOP LIST
    * (TextDedup.stopListedShingles, maxDF=5): grams in more than
    * maxDF docs leave the shingle universe before pair generation —
    * the k² mitigation for boilerplate grams that the jaccardPairs
    * scaladoc names. The stop list is ≤ total/maxDF entries, applied
    * as a broadcast anti join — no extra corpus shuffle. On this
    * corpus the surviving pairs are identical to `dedup_jaccard`
    * (boilerplate carries no dedup signal — that is the point), but
    * the per-doc sizes and commons legitimately shrink, which the
    * oracle reproduces gram-for-gram. */
  val dedupJaccardStoplist = sql("dedup_jaccard_stoplist",
    shingleCte + """,
       keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 5),
       sh2 AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
       sz AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
       pairs AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
         FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT d1, d2, common, x.n AS n1, y.n AS n2
       FROM pairs JOIN sz x ON x.doc_id = d1 JOIN sz y ON y.doc_id = d2
       WHERE 5 * common >= 4 * (x.n + y.n - common)""") { (s, d) =>
    graft.functions.TextDedup.jaccardPairs(
      graft.functions.TextDedup.stopListedShingles(
        checkpointedShingles(s, d), maxDF = 5),
      num = 4, den = 5)
  }

  /** Dedup clustering: connected components over the near-dup pair
    * graph (Jaccard >= 0.8 edges), cluster id = min doc_id reachable —
    * the reusable operator is functions.ConnectedComponents (iterative
    * min-label propagation; see its scaladoc for the convergence and
    * scale story, and ConnectedComponentsSpec for the long-chain /
    * star / clique topology tests this corpus can't exercise). The
    * oracle walks the same graph with a recursive CTE. */
  val dedupClusters = sql("dedup_clusters",
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
         SELECT e.dst, wk.label FROM walk wk JOIN edges e ON e.src = wk.node)
       SELECT CAST(node AS BIGINT) AS doc_id,
         CAST(min(label) AS BIGINT) AS cluster_id
       FROM walk GROUP BY node""") { (s, d) =>
    val ed = graft.functions.TextDedup.jaccardPairs(
        checkpointedShingles(s, d), num = 4, den = 5)
      .select(col("d1").as("src"), col("d2").as("dst"))
    // the edge graph is a small derived relation: run the iterative
    // loop at few partitions (per-round task overhead dominates)
    val labels = withFewPartitions(s, 4) {
      graft.functions.ConnectedComponents.run(s, ed)
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** MinHash + LSH near-dup detection, fully deterministic via md5:
    * hash_i(shingle) = md5(i || ':' || shingle); signature_i = min over
    * shingles; 12 hashes in 4 bands of 3; band signature = md5 of the
    * band's minhashes; candidates = pairs sharing a band bucket;
    * candidates verified with exact integer Jaccard >= 0.8.
    *
    * At scale: candidate generation is one shuffle keyed on
    * (band, band_sig) — cost O(docs × hashes), never O(docs²). */
  val dedupMinhashLsh = sql("dedup_minhash_lsh",
    shingleCte + """,
       hs AS (
         SELECT doc_id, i,
           min(md5(concat(CAST(i AS VARCHAR), ':', s))) AS mh
         FROM sh, LATERAL (SELECT unnest(range(0, 12)) AS i) t
         GROUP BY doc_id, i),
       bands AS (
         SELECT doc_id, i // 3 AS band, md5(string_agg(mh, '|' ORDER BY i)) AS sig
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
         GROUP BY c.d1, c.d2)
       SELECT m.d1, m.d2 FROM common m
       JOIN sz x ON x.doc_id = m.d1 JOIN sz y ON y.doc_id = m.d2
       WHERE 5 * m.common >= 4 * (x.n + y.n - m.common)""") { (s, d) =>
    graft.functions.TextDedup.lshVerifiedPairs(
      checkpointedShingles(s, d),
      numHashes = 12, bands = 4, num = 4, den = 5)
  }

  /** Incremental ingestion dedup (TextDedup.incrementalDedup): docs
    * with doc_id % 4 = 0 play the incoming batch, the rest the indexed
    * corpus. Each batch doc is labeled corpus_dup / batch_dup / new
    * with the id it duplicates. The corpus is touched only through its
    * LSH band index plus a by-id shingle fetch for colliding docs —
    * at 100 TB the per-ingest cost tracks the BATCH, not the corpus.
    * The oracle replays the same deterministic md5 LSH + exact-Jaccard
    * verify restricted to the same split. */
  val dedupIncremental = sql("dedup_incremental",
    shingleCte + """,
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
    val sh = checkpointedShingles(s, d)
    val isBatch = col("doc_id") % 4 === 0
    graft.functions.TextDedup.incrementalDedup(
      corpusSh = sh.where(!isBatch),
      batchSh = sh.where(isBatch),
      batchIds = Tables.documents(s, d).where(isBatch).select(col("doc_id")))
  }

  /** The LSH banding ACCEPTANCE CURVE — `emb_srp_curve`'s trick
    * applied to the text MinHash tables: treating each of the 4
    * 3-hash bands as an independent OR-amplification table, the
    * first-L-bands union finds exactly the pairs whose FIRST
    * colliding band index is < L, so one min-aggregate per candidate
    * pair + a cumulative count carries candidates AND exact-Jaccard
    * verified pairs for every band count L in 1..4 simultaneously —
    * the table a deployment reads to pick its band count (recall
    * 1-(1-p³)^L rises in L, candidate volume with it). Candidate and
    * verified tiers only — both linear-in-collisions; the exhaustive
    * truth these divide by lives in `dedup_lsh_recall` at the SAME
    * scope (full check corpus here; both run over a document sample
    * at 100 TB), so recall@L = n_found(L) / that row's n_true without
    * re-paying the n² tier per L. Integer counts → hash-exact. */
  val dedupLshCurve = sql("dedup_lsh_curve",
    """WITH w AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' ||
             w[CAST(i AS INT)+2] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-1, 1))) AS i) t),
       hs AS (
         SELECT doc_id, i,
           min(md5(concat(CAST(i AS VARCHAR), ':', s))) AS mh
         FROM sh, LATERAL (SELECT unnest(range(0, 12)) AS i) t
         GROUP BY doc_id, i),
       bands AS (
         SELECT doc_id, i // 3 AS band,
           md5(string_agg(mh, '|' ORDER BY i)) AS sig
         FROM hs GROUP BY doc_id, band),
       first_c AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, min(a.band) AS mb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       scored AS (
         SELECT f.mb,
           CASE WHEN 5 * com.common >= 4 * (x.n + y.n - com.common)
                THEN 1 ELSE 0 END AS hit
         FROM first_c f
         JOIN (SELECT c.d1, c.d2, count(*) AS common
               FROM first_c c
               JOIN sh a ON a.doc_id = c.d1
               JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
               GROUP BY 1, 2) com ON com.d1 = f.d1 AND com.d2 = f.d2
         JOIN sz x ON x.doc_id = f.d1
         JOIN sz y ON y.doc_id = f.d2)
       SELECT CAST(l.l AS INT) AS bands_l,
         CAST(coalesce(sum(CASE WHEN scored.mb < l.l THEN 1 END), 0)
           AS BIGINT) AS n_candidates,
         CAST(coalesce(sum(CASE WHEN scored.mb < l.l THEN hit END), 0)
           AS BIGINT) AS n_found
       FROM range(1, 5) l(l)
       LEFT JOIN scored ON true
       GROUP BY 1""") { (s, d) =>
    import graft.functions.TextDedup
    val docs = Tables.documents(s, d)
    val sh = TextDedup.shingles(docs).localCheckpoint(true)
    val bandRel = TextDedup
      .lshBands(TextDedup.minhashSignatures(sh, numHashes = 12),
        bands = 4, rowsPerBand = 3)
      .localCheckpoint(true)
    // per candidate pair: FIRST colliding band — the whole curve
    val first = bandRel.toDF("d1", "band", "sig")
      .join(bandRel.toDF("d2", "band2", "sig2"),
        col("band") === col("band2") && col("sig") === col("sig2") &&
          col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(min(col("band")).as("mb"))
      .localCheckpoint(true)
    val verified = TextDedup
      .verifyCandidates(sh, first.select(col("d1"), col("d2")),
        num = 4, den = 5)
      .withColumn("hit", lit(1L))
    val hist = first
      .join(verified, Seq("d1", "d2"), "left")
      .select(col("mb"), coalesce(col("hit"), lit(0L)).as("hit"))
      .groupBy(col("mb"))
      .agg(count(lit(1)).as("nc"), sum(col("hit")).as("nf"))
    s.range(1, 5).select(col("id").cast("int").as("bands_l"))
      .join(hist, col("mb") < col("bands_l"), "left")
      .groupBy(col("bands_l"))
      .agg(coalesce(sum(col("nc")), lit(0L)).as("n_candidates"),
        coalesce(sum(col("nf")), lit(0L)).as("n_found"))
  }

  /** LSH index-quality measurement — the candidate FUNNEL against the
    * exhaustive truth: band-bucket candidate pairs generated, pairs
    * surviving exact verification, and the true near-dup pair count
    * from the exhaustive verifier. Verified pairs are a subset of true
    * pairs by construction (same integer-Jaccard criterion), so
    * n_found/n_true IS recall and n_found/n_candidates the verify
    * precision — the two numbers that size a production banding
    * config (more bands → recall up, candidates up). Integer counts →
    * hash-exact oracle. At 100 TB the exhaustive side runs over a
    * document SAMPLE (recall estimation needs only a sample); here the
    * check corpus admits it whole. One-row output via three 1-row
    * aggregates cross-joined (BroadcastNestedLoopJoin over single
    * rows — the allowed shape PlanSpec's cartesian sweep notes). */
  val dedupLshRecall = sql("dedup_lsh_recall",
    shingleCte + """,
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       pr AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       true_pairs AS (
         SELECT d1, d2 FROM pr
         JOIN sz x ON x.doc_id = d1 JOIN sz y ON y.doc_id = d2
         WHERE 5 * common >= 4 * (x.n + y.n - common)),
       hs AS (
         SELECT doc_id, i,
           min(md5(concat(CAST(i AS VARCHAR), ':', s))) AS mh
         FROM sh, LATERAL (SELECT unnest(range(0, 12)) AS i) t
         GROUP BY doc_id, i),
       bands AS (
         SELECT doc_id, i // 3 AS band, md5(string_agg(mh, '|' ORDER BY i)) AS sig
         FROM hs GROUP BY doc_id, band),
       cand AS (
         SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       common AS (
         SELECT c.d1, c.d2, count(*) AS common
         FROM cand c JOIN sh a ON a.doc_id = c.d1
                     JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
         GROUP BY c.d1, c.d2),
       found AS (
         SELECT m.d1, m.d2 FROM common m
         JOIN sz x ON x.doc_id = m.d1 JOIN sz y ON y.doc_id = m.d2
         WHERE 5 * m.common >= 4 * (x.n + y.n - m.common))
       SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
         CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
         CAST((SELECT count(*) FROM true_pairs) AS BIGINT) AS n_true""") { (s, d) =>
    val sh = checkpointedShingles(s, d)
    // candidates computed ONCE: counted directly and fed to the verify
    // tier (verifyCandidates), instead of lshVerifiedPairs re-running
    // the minhash+banding pass a second time
    val cand = graft.functions.TextDedup
      .lshCandidatePairs(sh, numHashes = 12, bands = 4)
      .localCheckpoint(true)
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val nFound = graft.functions.TextDedup
      .verifyCandidates(sh, cand, num = 4, den = 5)
      .agg(count(lit(1)).as("n_found"))
    val nTrue = graft.functions.TextDedup.jaccardPairs(sh, num = 4, den = 5)
      .agg(count(lit(1)).as("n_true"))
    nCand.crossJoin(nFound).crossJoin(nTrue)
  }

  /** SimHash document fingerprint: 32 bits; bit p is the sign of the
    * frequency-weighted vote of md5-hex-digit-p's high bit across all
    * tokens. Near-dup docs get near-identical signatures; grouping or
    * banding the signature is the scale path. */
  val dedupSimhash = sql("dedup_simhash",
    """WITH w AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       tok AS (SELECT doc_id, unnest(w) AS tok FROM w),
       bits AS (
         SELECT doc_id, i AS p,
           sum(CASE WHEN substr(md5(tok), CAST(i AS INT)+1, 1) BETWEEN '8' AND '9'
                      OR substr(md5(tok), CAST(i AS INT)+1, 1) BETWEEN 'a' AND 'f'
                    THEN 1 ELSE -1 END) AS sv
         FROM tok, LATERAL (SELECT unnest(range(0, 32)) AS i) t
         GROUP BY doc_id, i)
       SELECT doc_id,
         string_agg(CASE WHEN sv > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS simhash
       FROM bits GROUP BY doc_id""") { (s, d) =>
    docsWithTokens(s, d)
      .select(col("doc_id"), explode(col("w")).as("tok"))
      .select(col("doc_id"), col("tok"),
        explode(lit((0 until 32).toArray)).as("p"))
      .withColumn("ch", expr("substring(md5(tok), p + 1, 1)"))
      .withColumn("v",
        when(col("ch").between("8", "9") || col("ch").between("a", "f"), 1)
          .otherwise(-1))
      .groupBy(col("doc_id"), col("p")).agg(sum(col("v")).as("sv"))
      .withColumn("bit", when(col("sv") > 0, "1").otherwise("0"))
      .groupBy(col("doc_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(p, bit))), x -> x.bit), '')")
        .as("simhash"))
  }

  // ---- similarity search ----------------------------------------------

  /** Brute-force cosine top-1 neighbor per vector — the exactness
    * baseline. All arithmetic in double with identical evaluation order
    * on both engines (ascending-index multiply-add, then sqrt-normalize).
    *
    * Execution: the explicit (probes, candidates) kernel with its hard
    * `maxCandidates` bound on the collected side — here candidates =
    * the (small) embeddings table itself, which the bound admits; a
    * 100 TB corpus would fail the `require` and must route through the
    * bucketed/IVF candidate tiers below with this kernel re-ranking. */
  val annCosineTop1 = sql("ann_cosine_top1",
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
         FROM n a JOIN n b ON a.vec_id <> b.vec_id)
       SELECT vec_id, neighbor_id, round(cosim, 3) AS sim FROM (
         SELECT *, row_number() OVER (
           PARTITION BY vec_id ORDER BY cosim DESC, neighbor_id) AS rn
         FROM p) t WHERE rn = 1""") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    graft.functions.VectorSearch.bruteForceCosineTop1(emb, emb)
      .select(col("vec_id"), col("neighbor_id"), round(col("cosim"), 3).as("sim"))
  }

  /** Bucketed (IVF-style) ANN: coarse-quantize each vector by the sign
    * pattern of its first 6 dimensions, search only within the bucket.
    * 64× fewer pairs than brute force; the approximation contract (only
    * same-bucket neighbors found) is deterministic and oracle-checked. */
  val annBucketedTop1 = sql("ann_bucketed_top1",
    """WITH n AS (
         SELECT vec_id, embedding,
           array_to_string(list_transform(embedding[1:6],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       p AS (
         SELECT a.vec_id AS vec_id, a.bucket AS bucket, b.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosim
         FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
       SELECT vec_id, bucket, neighbor_id, round(cosim, 3) AS sim FROM (
         SELECT *, row_number() OVER (
           PARTITION BY vec_id ORDER BY cosim DESC, neighbor_id) AS rn
         FROM p) t WHERE rn = 1""") { (s, d) =>
    graft.functions.VectorSearch.bucketedCosineTop1(Tables.embeddings(s, d))
      .select(col("vec_id"), col("bucket"), col("neighbor_id"),
        round(col("cosim"), 3).as("sim"))
  }

  // ---- text analysis ---------------------------------------------------

  private val stopEn = Seq("the", "a", "of", "and", "to", "in")
  private val stopEs = Seq("el", "la", "los", "de", "y", "que")
  private val stopDe = Seq("der", "die", "das", "und", "ein", "ist")
  private val stopFr = Seq("le", "les", "des", "et", "un", "une")

  private def hitsExpr(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString(", ")
    s"size(filter(w, x -> array_contains(array($arr), x)))"
  }
  private def hitsSql(words: Seq[String]): String = {
    val in = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(w, x -> x IN ($in)))"
  }

  /** Heuristic language ID by stopword-set voting with a deterministic
    * precedence on ties (de > en > es > fr), 'und' when no hits. */
  val textLangid = sql("text_langid",
    s"""WITH w AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
        h AS (SELECT doc_id,
          ${hitsSql(stopEn)} AS he, ${hitsSql(stopEs)} AS hs,
          ${hitsSql(stopDe)} AS hd, ${hitsSql(stopFr)} AS hf FROM w)
        SELECT doc_id,
          CASE WHEN he = 0 AND hs = 0 AND hd = 0 AND hf = 0 THEN 'und'
               WHEN hd >= he AND hd >= hs AND hd >= hf THEN 'de'
               WHEN he >= hs AND he >= hf THEN 'en'
               WHEN hs >= hf THEN 'es'
               ELSE 'fr' END AS pred_lang
        FROM h""") { (s, d) =>
    docsWithTokens(s, d)
      .withColumn("pred_lang", graft.functions.TextStats.languageId("w",
        Seq("de" -> stopDe, "en" -> stopEn, "es" -> stopEs, "fr" -> stopFr)))
      .select(col("doc_id"), col("pred_lang"))
  }

  /** Document quality features: token counts, type-token ratio, stopword
    * ratio, and a composite score. Ratios are emitted as *floored basis
    * points* (integers): floor() of a rational a/b (b ≤ tokens) can never
    * sit within an ulp of an integer boundary, unlike round(x, 4), which
    * differs between engines at binary midpoints. */
  val textQuality = sql("text_quality",
    s"""WITH w AS (
          SELECT doc_id, length(text) AS n_chars2,
            list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
        f AS (SELECT doc_id, n_chars2,
          len(w) AS n_tokens,
          len(list_distinct(w)) AS n_uniq,
          ${hitsSql(stopEn)} AS stop_hits FROM w)
        SELECT doc_id, n_chars2, n_tokens, n_uniq,
          CAST(floor(n_uniq * 10000.0 / greatest(n_tokens, 1)) AS BIGINT) AS ttr_bp,
          CAST(floor(stop_hits * 10000.0 / greatest(n_tokens, 1)) AS BIGINT) AS stop_bp,
          CAST(floor((n_uniq * 7000.0 + stop_hits * 3000.0) / greatest(n_tokens, 1)) AS BIGINT) AS score_bp
        FROM f""") { (s, d) =>
    docsWithTokens(s, d)
      .withColumn("n_chars2", length(col("text")))
      .withColumn("n_tokens", size(col("w")))
      .withColumn("n_uniq", size(array_distinct(col("w"))))
      .withColumn("stop_hits", expr(hitsExpr(stopEn)))
      .select(col("doc_id"), col("n_chars2"), col("n_tokens"), col("n_uniq"),
        floor(col("n_uniq") * 10000.0 / greatest(col("n_tokens"), lit(1)))
          .cast("long").as("ttr_bp"),
        floor(col("stop_hits") * 10000.0 / greatest(col("n_tokens"), lit(1)))
          .cast("long").as("stop_bp"),
        floor((col("n_uniq") * 7000.0 + col("stop_hits") * 3000.0)
          / greatest(col("n_tokens"), lit(1))).cast("long").as("score_bp"))
  }

  /** Token counting: whitespace tokens and a regex (BPE-ish word piece)
    * token count. */
  val textTokenCount = sql("text_token_count",
    """SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+')) AS re_tokens
       FROM documents""") { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      expr("size(array_remove(split(text, ' '), ''))").as("ws_tokens"),
      expr("size(regexp_extract_all(text, '[a-z]+', 0))").as("re_tokens"))
  }

  /** Intra-document repetition rate (a Gopher-style quality rule):
    * fraction of word bigrams that are repeats, in floored basis points.
    * High repetition marks boilerplate/spam for filtering. */
  val textRepetition = sql("text_repetition",
    """WITH w AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       bg AS (
         SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] AS b
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w), 1))) AS i) t
         WHERE len(w) >= 2)
       SELECT doc_id, count(*) AS n_bigrams,
         count(DISTINCT b) AS n_distinct,
         CAST(floor((count(*) - count(DISTINCT b)) * 10000.0 / count(*))
           AS BIGINT) AS rep_bp
       FROM bg GROUP BY doc_id""") { (s, d) =>
    docsWithTokens(s, d)
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("w"),
        explode(expr("sequence(0, size(w) - 2)")).as("i"))
      .select(col("doc_id"), expr("concat_ws(' ', w[i], w[i+1])").as("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("b")).as("n_distinct"),
        floor((count(lit(1)) - countDistinct(col("b"))) * 10000.0
          / count(lit(1))).cast("long").as("rep_bp"))
  }

  /** Text normalization (the canonicalization pass that precedes exact
    * dedup): lowercase + collapse runs of spaces + trim, emitted as a
    * content signature (md5) plus normalized length. */
  val textNormalize = sql("text_normalize",
    """SELECT doc_id,
       md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS norm_sig,
       length(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS norm_len
       FROM documents""") { (s, d) =>
    val norm = graft.functions.TextStats.normalize(col("text"))
    Tables.documents(s, d).select(col("doc_id"),
      md5(norm).as("norm_sig"), length(norm).cast("long").as("norm_len"))
  }

  /** Benchmark decontamination: flag corpus docs sharing any word
    * 5-gram with a held-out benchmark set (doc_id % 7 = 0 stands in
    * for the eval suite). 5-grams are selective enough that overlap
    * means contamination, not chance. At 100 TB both sides reduce to
    * fixed-width md5 fingerprints and this is one semi-join keyed on
    * the fingerprint — the benchmark side is tiny and broadcasts. */
  val decontaminate = sql("decontaminate",
    """WITH w AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       g5 AS (
         SELECT DISTINCT doc_id,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' ||
           w[CAST(i AS INT)+2] || ' ' || w[CAST(i AS INT)+3] || ' ' ||
           w[CAST(i AS INT)+4] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-3, 1))) AS i) t
         WHERE len(w) >= 5)
       SELECT DISTINCT g.doc_id FROM g5 g
       JOIN (SELECT s FROM g5 WHERE doc_id % 7 = 0) b ON g.s = b.s
       WHERE g.doc_id % 7 <> 0""") { (s, d) =>
    // g5 feeds both join sides UNPERSISTED on purpose: the %7 branch
    // filters are disjoint and Catalyst pushes them below the explode,
    // so the two branches split the corpus rather than each scanning
    // all of it. Persisting here was measured 3× SLOWER (4.5 s vs
    // 1.3 s at sf0.1) — it materializes the full relation and blocks
    // the pushdown. Per-doc dedup is skipped on purpose: duplicate
    // grams change neither semi-join membership nor the final DISTINCT
    // doc_id (the oracle's DISTINCT is set-semantics-equivalent).
    val g5 = graft.functions.TextDedup.ngrams(Tables.documents(s, d), n = 5)
    val bench = g5.filter(col("doc_id") % 7 === 0).select(col("s"))
    g5.filter(col("doc_id") % 7 =!= 0)
      .join(broadcast(bench), Seq("s"), "leftsemi")
      .select(col("doc_id")).distinct()
  }

  /** Contamination FRACTION per document — the n-gram overlap REPORT
    * (the GPT-3/PaLM-style appendix: not just which docs touch the
    * benchmark, but how much of each doc is contaminated, the number
    * that separates a quoted sentence from a wholesale copy and
    * drives drop-vs-redact policy). Per non-benchmark doc with at
    * least one contaminated distinct 5-gram: total distinct 5-grams,
    * contaminated count, and floored basis points. Same plan shape as
    * `decontaminate` (benchmark side broadcasts; corpus side streams)
    * with a LEFT SEMI replaced by a conditional count so the clean
    * grams still count toward the denominator. */
  val decontaminateOverlap = sql("decontaminate_overlap",
    """WITH w AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       g5 AS (
         SELECT DISTINCT doc_id,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' ||
           w[CAST(i AS INT)+2] || ' ' || w[CAST(i AS INT)+3] || ' ' ||
           w[CAST(i AS INT)+4] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-3, 1))) AS i) t
         WHERE len(w) >= 5),
       b AS (SELECT DISTINCT s FROM g5 WHERE doc_id % 7 = 0)
       SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(b.s) AS BIGINT) AS n_contaminated,
         CAST(count(b.s) * 10000 // count(*) AS BIGINT) AS overlap_bp
       FROM g5 g LEFT JOIN b ON b.s = g.s
       WHERE g.doc_id % 7 <> 0
       GROUP BY g.doc_id
       HAVING count(b.s) > 0""") { (s, d) =>
    // distinct per-doc grams here (unlike `decontaminate`, where dups
    // don't change membership): the fraction's numerator and
    // denominator must count each gram once
    val g5 = graft.functions.TextDedup
      .shingles(Tables.documents(s, d), n = 5)
    val bench = g5.filter(col("doc_id") % 7 === 0)
      .select(col("s").as("bs")).distinct()
    g5.filter(col("doc_id") % 7 =!= 0)
      .join(broadcast(bench), col("s") === col("bs"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(col("bs")).as("n_contaminated"),
        expr("CAST(count(bs) * 10000 DIV count(1) AS BIGINT)")
          .as("overlap_bp"))
      .filter(col("n_contaminated") > 0)
  }

  /** Bloom-filter decontamination — same contract as `decontaminate`,
    * restructured the way a 100 TB pass is: the benchmark 5-gram set
    * reduces to a ~100 KB bloom sketch (Spark's native
    * BloomFilterAggregate, surfaced via functions.BloomFunctions),
    * embedded as a LITERAL in a codegen'd `might_contain` filter — so
    * ~all clean corpus grams are dropped map-side, before any join or
    * shuffle, and the exact semi-join verify (which removes bloom
    * false positives — output stays exact, same oracle) touches only
    * the suspected sliver. Against 100 TB this turns "broadcast-join
    * every corpus gram" into "filter the scan, join ~nothing". */
  val decontaminateBloom = sql("decontaminate_bloom",
    """WITH w AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       g5 AS (
         SELECT DISTINCT doc_id,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' ||
           w[CAST(i AS INT)+2] || ' ' || w[CAST(i AS INT)+3] || ' ' ||
           w[CAST(i AS INT)+4] AS s
         FROM w, LATERAL (SELECT unnest(range(1, greatest(len(w)-3, 1))) AS i) t
         WHERE len(w) >= 5)
       SELECT DISTINCT g.doc_id FROM g5 g
       JOIN (SELECT s FROM g5 WHERE doc_id % 7 = 0) b ON g.s = b.s
       WHERE g.doc_id % 7 <> 0""") { (s, d) =>
    graft.functions.BloomFunctions.register(s)
    val g5 = graft.functions.TextDedup.ngrams(Tables.documents(s, d), n = 5)
    val bench = g5.filter(col("doc_id") % 7 === 0).select(col("s"))
    // size the sketch to the benchmark side (8 bits/item ≈ 2% fpp).
    // SIZING IS A SCALE CLIFF, not a tuning nicety: every partial
    // aggregate buffer is a bits/8-byte bitmap and the merge moves
    // one per task — a 5× oversized sketch at the 100× probe turned
    // the build super-linear (6 s → 49 s; see BENCH_NOTES). In
    // production the benchmark-set size is known; here one cheap
    // count over the small side stands in.
    val items = math.max(bench.count(), 1024L)
    val sketch = bench
      .agg(expr(s"""graft_bloom_agg(xxhash64(s),
             CAST($items AS BIGINT), CAST(${8 * items} AS BIGINT))"""))
      .head().getAs[Array[Byte]](0)
    val bloomLit = graft.functions.BloomFunctions.sketchLiteral(sketch)
    g5.filter(col("doc_id") % 7 =!= 0)
      .filter(expr(s"graft_might_contain($bloomLit, xxhash64(s))"))
      .join(broadcast(bench), Seq("s"), "leftsemi")
      .select(col("doc_id")).distinct()
  }

  /** Rolling-hash document fingerprint: the minimum md5 over all 5-char
    * shingles (a winnowing-style content signature). */
  val textFingerprint = sql("text_fingerprint",
    """SELECT doc_id,
       list_aggregate(list_transform(range(1, greatest(length(text) - 4, 1) + 1),
         i -> md5(substr(text, CAST(i AS INT), 5))), 'min') AS fp
       FROM documents""") { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      graft.functions.TextStats.minFingerprint("text", k = 5).as("fp"))
  }

  /** TF-IDF-style top-3 terms per document. idf is the *rational* form
    * N/df rather than ln(N/df): transcendental libm functions differ
    * between engines by ulps (measured — ln broke bit-exact comparison),
    * while division and multiplication over identical integer operands
    * are IEEE-exact. The raw double scores and the top-3 ordering (term
    * tiebreak) then hash-match with no rounding at all. */
  val textTfidf = sql("text_tfidf",
    """WITH tok AS (
         SELECT doc_id, unnest(list_filter(string_split(text, ' '),
           x -> x <> '')) AS w
         FROM documents),
       tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
       df AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY w),
       n AS (SELECT count(*) AS n FROM documents),
       scored AS (
         SELECT tf.doc_id, tf.w AS term,
           tf.tf * (CAST(n.n AS DOUBLE) / df.df) AS score
         FROM tf JOIN df ON tf.w = df.w CROSS JOIN n)
       SELECT doc_id, term, score FROM (
         SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term) AS rn
         FROM scored) t WHERE rn <= 3""") { (s, d) =>
    // ONE pass over the token relation: tf is the (doc, term) count
    // aggregate, and df falls out of tf itself — each (doc, term) row
    // is one distinct doc for its term, so df = count(*) grouped by
    // term, with no second scan and no countDistinct. tf is
    // checkpointed because both the df branch and the join read it.
    val tf = docsWithTokens(s, d)
      .select(col("doc_id"), explode(col("w")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .withColumnRenamed("w", "w2")
    val n = Tables.documents(s, d).agg(count(lit(1)).cast("double").as("n"))
    val scored = tf.join(df, col("w") === col("w2")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("w").as("term"),
        (col("tf") * (col("n") / col("df"))).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("score"))
  }

  /** Deterministic content-hash sampling — the reproducible alternative
    * to rand(): membership depends only on the row key, so the sample is
    * stable across runs, retries, and engines (md5 is the portable
    * hash). First hex char '0' ⇒ a 1/16 sample. */
  val sampleHash = sql("sample_hash",
    """SELECT event_id, event_type FROM events
       WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'""") { (s, d) =>
    graft.functions.Sampling
      .hashSample(Tables.events(s, d), col("event_id"), sixteenths = 1)
      .select(col("event_id"), col("event_type"))
  }

  /** Deterministic train/val/test split assignment by hash bucket
    * (16-way: 0-11 train, 12-13 val, 14-15 test) with per-split counts —
    * the canonical dataset-split operator, engine-portable. */
  val sampleSplit = sql("sample_split",
    """SELECT split, count(*) AS cnt FROM (
         SELECT CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
           ELSE 'test' END AS split
         FROM documents) t GROUP BY split""") { (s, d) =>
    Tables.documents(s, d)
      .withColumn("split", graft.functions.Sampling.splitColumn(col("doc_id")))
      .groupBy(col("split")).agg(count(lit(1)).as("cnt"))
  }

  /** Deterministic stratified sampling: top-20 rows per event_type in
    * content-hash order — equal-size per-stratum samples, reproducible
    * and skew-proof (one window shuffle on the stratum key). */
  val sampleStratified = sql("sample_stratified",
    """SELECT event_type, event_id FROM (
         SELECT event_type, event_id, row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
         FROM events) t WHERE rn <= 20""") { (s, d) =>
    graft.functions.Sampling.stratified(Tables.events(s, d),
        stratum = col("event_type"), key = col("event_id"), perStratum = 20)
      .select(col("event_type"), col("event_id"))
  }

  /** Embedding-cosine near-duplicate detection, candidates-then-verify:
    * candidate pairs share a 6-bit sign bucket (equi join on the bucket
    * key — the LSH-banding architecture applied to embedding space, one
    * shuffle, never n²), verified with exact codegen'd cosine >= 0.5,
    * keep-first oriented (keep_id < dup_id). The approximation contract
    * (only same-bucket pairs surface) is deterministic and the oracle
    * applies the identical bucket restriction — the same contract shape
    * as ann_bucketed_top1. Nothing is collected to the driver. */
  val dedupEmbedding = sql("dedup_embedding",
    """WITH n AS (
         SELECT vec_id, embedding,
           array_to_string(list_transform(embedding[1:6],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       p AS (
         SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosim
         FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       SELECT keep_id, dup_id, round(cosim, 3) AS sim
       FROM p WHERE cosim >= 0.5""") { (s, d) =>
    graft.functions.VectorSearch
      .bucketedThresholdPairs(Tables.embeddings(s, d), minSim = 0.5)
      .select(col("keep_id"), col("dup_id"), round(col("cosim"), 3).as("sim"))
  }

  /** Embedding-dedup candidate funnel with a SAMPLED truth tier —
    * completing the measurement layer across all three near-dup
    * families (text LSH: `dedup_lsh_recall`; media bands:
    * `media_band_funnel`/`video_band_funnel`; embeddings: this).
    * Same-bucket candidate pairs and verified pairs (cosine >= 0.5)
    * are counted over the FULL corpus; recall is estimated on a
    * deterministic 1-in-5 vector sample, where the exhaustive
    * cosine-threshold truth runs through the bounded broadcast kernel
    * — the n² truth cost applies to the sample only, and the sign
    * bucketing is oblivious to the sampling key, so
    * found∩sample / true(sample) is an unbiased recall estimate. The
    * found/candidates ratio prices the verify tier; both numbers size
    * the bucket-bit count before a full-scale run.
    *
    * Measured (sf0.01): 1934 candidates → 59 found; sample recall
    * 2/42 ≈ 0.05. That LOW number is the measurement doing its job: at
    * threshold 0.3 only near-identical vectors share all 6 sign bits,
    * so a deployment targeting moderate-similarity dedup must drop
    * bucket bits or multi-probe — knowledge this row surfaces on a
    * sample before the full-scale run would silently under-recall
    * (`dedup_embedding` itself targets 0.5, where bucket recall is
    * high; the funnel deliberately measures the harder regime). */
  val embDedupFunnel = sql("emb_dedup_funnel",
    """WITH n AS (
         SELECT vec_id, embedding,
           array_to_string(list_transform(embedding[1:6],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       cand AS (
         SELECT a.vec_id AS keep_id, b.vec_id AS dup_id
         FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       p AS (
         SELECT a.vec_id AS keep_id, b.vec_id AS dup_id
         FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) >= 0.3),
       true_s AS (
         SELECT a.vec_id AS keep_id, b.vec_id AS dup_id
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 = 0
           AND list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) >= 0.3)
       SELECT
         CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
         CAST((SELECT count(*) FROM p) AS BIGINT) AS n_found,
         CAST((SELECT count(*) FROM p
               WHERE keep_id % 5 = 0 AND dup_id % 5 = 0) AS BIGINT)
           AS n_found_sample,
         CAST((SELECT count(*) FROM true_s) AS BIGINT)
           AS n_true_sample""") { (s, d) =>
    import graft.functions.VectorSearch
    val emb = Tables.embeddings(s, d)
    val e = emb.withColumn("bucket", VectorSearch.signBucket("embedding"))
    val nCand = e.select(col("vec_id").as("keep_id"), col("bucket"))
      .join(e.select(col("vec_id").as("dup_id"),
        col("bucket").as("bucket2")),
        col("bucket") === col("bucket2") && col("keep_id") < col("dup_id"))
      .agg(count(lit(1)).as("n_candidates"))
    val found = VectorSearch.bucketedThresholdPairs(emb, minSim = 0.3)
      .localCheckpoint(true)
    val nFound = found.agg(count(lit(1)).as("n_found"))
    val nFoundS = found
      .filter(col("keep_id") % 5 === 0 && col("dup_id") % 5 === 0)
      .agg(count(lit(1)).as("n_found_sample"))
    val sampleEmb = emb.filter(col("vec_id") % 5 === 0)
    val nTrueS = VectorSearch
      .cosineThresholdPairs(sampleEmb, sampleEmb, minSim = 0.3)
      .agg(count(lit(1)).as("n_true_sample"))
    nCand.crossJoin(nFound).crossJoin(nFoundS).crossJoin(nTrueS)
  }

  /** The REMEDIATION row for `emb_dedup_funnel`'s measured 0.05
    * recall: the same funnel with multi-probe bucketing (own bucket +
    * every one-bit sign flip, probes exploded on one side of the same
    * single equi join). Side-by-side with the baseline funnel the
    * record shows the trade the probe count buys — candidates grow
    * ~(1+dims)×, sample recall grows several-fold — which is exactly
    * how a deployment picks its probe schedule: run both measurement
    * rows on a sample, then choose. Counts are integers → hash-exact
    * oracle. */
  val embMultiprobeFunnel = sql("emb_multiprobe_funnel",
    """WITH n AS (
         SELECT vec_id, embedding,
           array_to_string(list_transform(embedding[1:6],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       pr AS (
         SELECT vec_id, embedding, nrm, unnest(list_prepend(bucket,
           list_transform(range(1, 7), i ->
             substr(bucket, 1, CAST(i - 1 AS INT)) ||
             (CASE WHEN substr(bucket, CAST(i AS INT), 1) = '1'
                   THEN '0' ELSE '1' END) ||
             substr(bucket, CAST(i + 1 AS INT), 6 - CAST(i AS INT)))))
           AS probe
         FROM n),
       cand AS (
         SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
           a.embedding AS ea, a.nrm AS na, b.embedding AS eb, b.nrm AS nb
         FROM pr a JOIN n b ON a.probe = b.bucket AND a.vec_id < b.vec_id),
       p AS (
         SELECT keep_id, dup_id FROM cand
         WHERE list_sum(list_transform(range(1, len(ea) + 1),
             i -> CAST(ea[CAST(i AS INT)] AS DOUBLE)
                * CAST(eb[CAST(i AS INT)] AS DOUBLE))) / (na * nb) >= 0.3),
       true_s AS (
         SELECT a.vec_id AS keep_id, b.vec_id AS dup_id
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 = 0
           AND list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) >= 0.3)
       SELECT
         CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
         CAST((SELECT count(*) FROM p) AS BIGINT) AS n_found,
         CAST((SELECT count(*) FROM p
               WHERE keep_id % 5 = 0 AND dup_id % 5 = 0) AS BIGINT)
           AS n_found_sample,
         CAST((SELECT count(*) FROM true_s) AS BIGINT)
           AS n_true_sample""") { (s, d) =>
    import graft.functions.VectorSearch
    val emb = Tables.embeddings(s, d)
    val e = emb.withColumn("bucket", VectorSearch.signBucket("embedding"))
    val nCand = e.select(col("vec_id").as("keep_id"),
        explode(VectorSearch.signBucketProbes("bucket")).as("probe"))
      .join(e.select(col("vec_id").as("dup_id"),
        col("bucket").as("bucket2")),
        col("probe") === col("bucket2") && col("keep_id") < col("dup_id"))
      .agg(count(lit(1)).as("n_candidates"))
    val found = VectorSearch
      .multiProbeBucketedThresholdPairs(emb, minSim = 0.3)
      .localCheckpoint(true)
    val nFound = found.agg(count(lit(1)).as("n_found"))
    val nFoundS = found
      .filter(col("keep_id") % 5 === 0 && col("dup_id") % 5 === 0)
      .agg(count(lit(1)).as("n_found_sample"))
    val sampleEmb = emb.filter(col("vec_id") % 5 === 0)
    val nTrueS = VectorSearch
      .cosineThresholdPairs(sampleEmb, sampleEmb, minSim = 0.3)
      .agg(count(lit(1)).as("n_true_sample"))
    nCand.crossJoin(nFound).crossJoin(nFoundS).crossJoin(nTrueS)
  }

  /** SRP-LSH funnel — the second-stage remediation for the recall the
    * baseline (0.05) and multi-probe (0.24) funnel rows measured at
    * cosine 0.3: OR-amplification over `tables` INDEPENDENT
    * random-hyperplane sign-hash tables (Rademacher ±1 hyperplanes,
    * md5-derived so both engines replay them; fixed-point integer dots
    * so signatures are bit-identical — see VectorSearch.srpSignatures).
    * Per-table collision probability p = (1 - θ/π)^bits is small, but
    * the union over L tables recalls 1-(1-p)^L — exponential in L.
    * Measured at sf0.01 with (bits=6, tables=24): 41,299 candidates
    * (0.33·n² — sub-quadratic) → sample recall 30/42 ≈ 0.71, vs 0.05
    * baseline and 0.24 multi-probe; the three rows side by side are
    * the probe-schedule sizing table a deployment reads before a full
    * run. Candidates are exactly-once WITHOUT a distinct pass (pairs
    * surface only in their first colliding table — spec-pinned), so
    * the candidate count is a true volume measure. */
  val embSrpFunnel = sql("emb_srp_funnel",
    """WITH e AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       sgt AS (
         SELECT vec_id, t.t AS t,
           list_sum(list_transform(range(0, 6), j ->
             CASE WHEN list_sum(list_transform(range(0, 64), d ->
               (CASE WHEN strpos('13579bdf', substr(
                    md5('srp:' || t.t || ':' || j || ':' || d), 1, 1)) > 0
                  THEN 1 ELSE -1 END)
               * CAST(floor(CAST(embedding[CAST(d + 1 AS INT)] AS DOUBLE)
                   * 1048576) AS BIGINT))) >= 0
             THEN (1 << CAST(5 - j AS INT)) ELSE 0 END)) AS sig
         FROM embeddings, range(0, 24) t(t)),
       cand AS (
         SELECT a.vec_id AS keep_id, b.vec_id AS dup_id
         FROM sgt a JOIN sgt b
           ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
         GROUP BY 1, 2),
       p AS (
         SELECT c.keep_id, c.dup_id
         FROM cand c
         JOIN e a ON a.vec_id = c.keep_id
         JOIN e b ON b.vec_id = c.dup_id
         WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) >= 0.3),
       true_s AS (
         SELECT a.vec_id AS keep_id, b.vec_id AS dup_id
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 = 0
           AND list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) >= 0.3)
       SELECT
         CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
         CAST((SELECT count(*) FROM p) AS BIGINT) AS n_found,
         CAST((SELECT count(*) FROM p
               WHERE keep_id % 5 = 0 AND dup_id % 5 = 0) AS BIGINT)
           AS n_found_sample,
         CAST((SELECT count(*) FROM true_s) AS BIGINT)
           AS n_true_sample""") { (s, d) =>
    import graft.functions.VectorSearch
    val emb = Tables.embeddings(s, d)
    // ONE pass scores every distinct candidate with its exact cosine
    // (raw collisions → broadcast embedding fetch → codegen'd cosine →
    // keyed dedup aggregate); the funnel's three corpus-wide counts
    // all read the checkpointed scored relation
    val scored = VectorSearch
      .srpScoredCandidatePairs(emb, bits = 6, tables = 24)
      .localCheckpoint(true)
    val nCand = scored.agg(count(lit(1)).as("n_candidates"))
    val found = scored.filter(col("cosim") >= 0.3)
    val nFound = found.agg(count(lit(1)).as("n_found"))
    val nFoundS = found
      .filter(col("keep_id") % 5 === 0 && col("dup_id") % 5 === 0)
      .agg(count(lit(1)).as("n_found_sample"))
    val sampleEmb = emb.filter(col("vec_id") % 5 === 0)
    val nTrueS = VectorSearch
      .cosineThresholdPairs(sampleEmb, sampleEmb, minSim = 0.3)
      .agg(count(lit(1)).as("n_true_sample"))
    nCand.crossJoin(nFound).crossJoin(nFoundS).crossJoin(nTrueS)
  }

  /** The full OR-amplification ACCEPTANCE CURVE in one pass — the
    * sizing table a deployment reads to pick its SRP table count:
    * recall and candidate volume per L for EVERY L in 1..24
    * simultaneously, on the 1-in-5 measurement sample. Key identity:
    * the first-L-tables union finds exactly the pairs whose FIRST
    * colliding table index is < L, so one min-aggregate per pair
    * (VectorSearch.srpFirstCollisionTable) + a cumulative count over
    * the 24-row histogram carries the whole curve — 24 candidate runs
    * collapse into one. Verified tier = exact cosine >= 0.3 on the
    * (distinct) sample pairs; truth = the bounded exhaustive kernel on
    * the same sample, constant across L. Full-corpus candidate volume
    * for the SHIPPED config stays `emb_srp_funnel`'s job; this row is
    * the L-selection curve beside it. Integer counts → hash-exact. */
  val embSrpCurve = sql("emb_srp_curve",
    """WITH s AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings WHERE vec_id % 5 = 0),
       sgt AS (
         SELECT vec_id, t.t AS t,
           list_sum(list_transform(range(0, 6), j ->
             CASE WHEN list_sum(list_transform(range(0, 64), d ->
               (CASE WHEN strpos('13579bdf', substr(
                    md5('srp:' || t.t || ':' || j || ':' || d), 1, 1)) > 0
                  THEN 1 ELSE -1 END)
               * CAST(floor(CAST(embedding[CAST(d + 1 AS INT)] AS DOUBLE)
                   * 1048576) AS BIGINT))) >= 0
             THEN (1 << CAST(5 - j AS INT)) ELSE 0 END)) AS sig
         FROM s, range(0, 24) t(t)),
       first_c AS (
         SELECT a.vec_id AS keep_id, b.vec_id AS dup_id, min(a.t) AS mt
         FROM sgt a JOIN sgt b
           ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
         GROUP BY 1, 2),
       scored AS (
         SELECT f.mt,
           CASE WHEN list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                  * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
               / (a.nrm * b.nrm) >= 0.3 THEN 1 ELSE 0 END AS hit
         FROM first_c f
         JOIN s a ON a.vec_id = f.keep_id
         JOIN s b ON b.vec_id = f.dup_id),
       truth AS (
         SELECT count(*) AS n_true FROM s a JOIN s b
           ON a.vec_id < b.vec_id
         WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) >= 0.3)
       SELECT CAST(l.l AS INT) AS tables_l,
         CAST(coalesce(sum(CASE WHEN scored.mt < l.l THEN 1 END), 0)
           AS BIGINT) AS n_candidates_sample,
         CAST(coalesce(sum(CASE WHEN scored.mt < l.l THEN hit END), 0)
           AS BIGINT) AS n_found_sample,
         CAST(max(truth.n_true) AS BIGINT) AS n_true_sample
       FROM range(1, 25) l(l), truth
       LEFT JOIN scored ON true
       GROUP BY 1""") { (s, d) =>
    import graft.functions.{VectorSearch, VectorExpressions}
    VectorExpressions.register(s)
    val sample = Tables.embeddings(s, d).filter(col("vec_id") % 5 === 0)
    val scored = VectorSearch
      .srpFirstCollisionTable(sample, bits = 6, tables = 24)
      .join(sample.select(col("vec_id").as("keep_id"),
        col("embedding").as("ea")), "keep_id")
      .join(sample.select(col("vec_id").as("dup_id"),
        col("embedding").as("eb")), "dup_id")
      .select(col("mt"),
        when(expr("cosine_sim(ea, eb)") >= 0.3, 1L).otherwise(0L).as("hit"))
    // 24-row histogram keyed on the first-collision table, then the
    // cumulative counts per L — the whole curve from one aggregate
    val hist = scored.groupBy(col("mt"))
      .agg(count(lit(1)).as("nc"), sum(col("hit")).as("nf"))
    val nTrue = VectorSearch
      .cosineThresholdPairs(sample, sample, minSim = 0.3)
      .agg(count(lit(1)).as("n_true"))
    s.range(1, 25).select(col("id").cast("int").as("tables_l"))
      .join(hist, col("mt") < col("tables_l"), "left")
      .groupBy(col("tables_l"))
      .agg(coalesce(sum(col("nc")), lit(0L)).as("n_candidates_sample"),
        coalesce(sum(col("nf")), lit(0L)).as("n_found_sample"))
      .crossJoin(broadcast(nTrue))
      .select(col("tables_l"), col("n_candidates_sample"),
        col("n_found_sample"), col("n_true").as("n_true_sample"))
  }

  /** Incremental ingestion dedup for EMBEDDINGS — closing the serving-
    * mode symmetry with the text family (`dedup_incremental` /
    * `stream_incremental_dedup`): vectors with vec_id % 4 = 0 play the
    * incoming batch, the rest the indexed corpus; each batch vector is
    * labeled corpus_dup / batch_dup (keep-first) / new with the id it
    * duplicates at exact cosine >= 0.5. The corpus participates only
    * through its SRP signature index (6 bits × 16 tables — recall
    * ~0.77 at cosine 0.5 by the OR-amplification formula) plus a by-id
    * embedding fetch for colliding ids — per-ingest cost tracks the
    * BATCH, not the corpus. min() over raw collisions needs no dedup
    * pass (duplicate-insensitive). The oracle replays the identical
    * md5-derived integer signatures and verify. */
  val embIncrementalDedup = sql("emb_incremental_dedup",
    """WITH e AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       sgt AS (
         SELECT vec_id, t.t AS t,
           list_sum(list_transform(range(0, 6), j ->
             CASE WHEN list_sum(list_transform(range(0, 64), d ->
               (CASE WHEN strpos('13579bdf', substr(
                    md5('srp:' || t.t || ':' || j || ':' || d), 1, 1)) > 0
                  THEN 1 ELSE -1 END)
               * CAST(floor(CAST(embedding[CAST(d + 1 AS INT)] AS DOUBLE)
                   * 1048576) AS BIGINT))) >= 0
             THEN (1 << CAST(5 - j AS INT)) ELSE 0 END)) AS sig
         FROM embeddings, range(0, 16) t(t)),
       cosim AS (
         SELECT a.vec_id AS v1, b.vec_id AS v2,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cs
         FROM e a JOIN e b ON a.vec_id <> b.vec_id),
       cdup AS (
         SELECT x.bvec, min(x.cvec) AS cdup FROM (
           SELECT DISTINCT b.vec_id AS bvec, c.vec_id AS cvec
           FROM sgt b JOIN sgt c ON b.t = c.t AND b.sig = c.sig
           WHERE b.vec_id % 4 = 0 AND c.vec_id % 4 <> 0) x
         JOIN cosim ON cosim.v1 = x.bvec AND cosim.v2 = x.cvec
         WHERE cosim.cs >= 0.5 GROUP BY 1),
       bdup AS (
         SELECT x.d2, min(x.d1) AS bfirst FROM (
           SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
           FROM sgt a JOIN sgt b
             ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
           WHERE a.vec_id % 4 = 0 AND b.vec_id % 4 = 0) x
         JOIN cosim ON cosim.v1 = x.d1 AND cosim.v2 = x.d2
         WHERE cosim.cs >= 0.5 GROUP BY 1)
       SELECT v.vec_id,
         CASE WHEN cd.cdup IS NOT NULL THEN 'corpus_dup'
              WHEN bd.bfirst IS NOT NULL THEN 'batch_dup'
              ELSE 'new' END AS status,
         CAST(coalesce(cd.cdup, bd.bfirst, -1) AS BIGINT) AS dup_of
       FROM embeddings v
       LEFT JOIN cdup cd ON cd.bvec = v.vec_id
       LEFT JOIN bdup bd ON bd.d2 = v.vec_id
       WHERE v.vec_id % 4 = 0""") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val isBatch = col("vec_id") % 4 === 0
    graft.functions.VectorSearch.incrementalEmbeddingDedup(
      corpus = emb.where(!isBatch),
      batch = emb.where(isBatch),
      batchIds = emb.where(isBatch).select(col("vec_id")),
      minSim = 0.5, bits = 6, tables = 16)
  }

  /** Fuzzy matching: exact nearest other part name by Levenshtein
    * distance (integer DP — exact in both engines) for a deterministic
    * 1/97 probe sample. Probes × corpus is linear in |part| (broadcast
    * nested-loop, no shuffle of the big side), not the quadratic full
    * self-join; the all-pairs version at scale reuses the LSH candidate
    * machinery above — this is the exact verification kernel. */
  val textEditDistance = sql("text_editdist",
    """SELECT p_partkey, neighbor, dist FROM (
         SELECT a.p_partkey, b.p_name AS neighbor,
           levenshtein(a.p_name, b.p_name) AS dist,
           row_number() OVER (PARTITION BY a.p_partkey
             ORDER BY levenshtein(a.p_name, b.p_name), b.p_name) AS rn
         FROM part a JOIN part b ON a.p_partkey <> b.p_partkey
         WHERE a.p_partkey % 97 = 0) t
       WHERE rn = 1""") { (s, d) =>
    val a = Tables.part(s, d)
      .filter(col("p_partkey") % 97 === 0)
      .select(col("p_partkey"), col("p_name"))
    // the corpus side of the broadcast nested-loop join is a single
    // parquet split at small SF — spread it so the O(probes × corpus)
    // levenshtein projection parallelizes across all cores
    val b = Tables.part(s, d).select(
        col("p_partkey").as("pk2"), col("p_name").as("p_name2"))
      .repartition(s.sparkContext.defaultParallelism)
    val w = Window.partitionBy(col("p_partkey"))
      .orderBy(col("dist"), col("p_name2"))
    broadcast(a).join(b, col("p_partkey") =!= col("pk2"))
      .withColumn("dist", levenshtein(col("p_name"), col("p_name2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_partkey"), col("p_name2").as("neighbor"), col("dist"))
  }

  /** Multimodal column plumbing: treat content as opaque bytes with typed
    * metadata; "decode" is a deterministic stand-in (byte length, sha256,
    * fake width/height) — the real decode would run in
    * graft.multimodal.Multimodal over the same schema. */
  val multimodalFeatures = sql("multimodal_features",
    """SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       sha256(text) AS sha,
       octet_length(CAST(text AS BLOB)) % 640 AS width,
       (octet_length(CAST(text AS BLOB)) // 7) % 480 AS height
       FROM documents""") { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      octet_length(col("text")).as("n_bytes"),
      sha2(col("text").cast("binary"), 256).as("sha"),
      (octet_length(col("text")) % 640).as("width"),
      (expr("octet_length(text) div 7") % 480).as("height"))
  }

  /** REAL audio/video container parsing, oracle-checked end-to-end:
    * every document synthesizes a deterministic REAL media file from
    * its own fields — even doc_ids a canonical PCM WAV whose header
    * encodes (channels, sample rate, data size), odd ones a minimal
    * valid MP4 (ftyp + moov/mvhd/trak/tkhd) — the distributed parser
    * (Multimodal.extractAvMeta: RIFF chunk walk, ISO-BMFF box walk)
    * recovers the metadata, and the oracle recomputes what a correct
    * parse MUST yield arithmetically from the same fields (duration =
    * data bytes over byte rate, etc.). A parser bug in byte order,
    * offsets, or chunk advance breaks the hash match. */
  val multimodalAvMeta = sql("multimodal_av_meta",
    """SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'audio' ELSE 'video' END AS kind,
       CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS container,
       CASE WHEN doc_id % 2 = 0 THEN 'pcm' ELSE 'isom' END AS codec,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + (doc_id // 2) % 2
            ELSE 0 END AS INT) AS channels,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 + (doc_id % 8) * 1000
            ELSE 0 END AS INT) AS sample_rate,
       CAST(CASE WHEN doc_id % 2 = 0
            THEN (n_chars * 4 * 1000) // ((8000 + (doc_id % 8) * 1000)
                 * (1 + (doc_id // 2) % 2) * 2)
            ELSE n_chars * 3 END AS BIGINT) AS duration_ms,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 0
            ELSE 160 + (doc_id % 16) * 8 END AS INT) AS width,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 0
            ELSE 90 + (doc_id % 9) * 8 END AS INT) AS height,
       CAST(1 AS INT) AS tracks,
       CAST(CASE WHEN doc_id % 2 = 0
            THEN (n_chars * 4) // ((1 + (doc_id // 2) % 2) * 2)
            ELSE n_chars END AS INT) AS samples
       FROM documents""") { (s, d) =>
    import s.implicits._
    import graft.multimodal.Multimodal
    val recs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"))
      .repartition(s.sparkContext.defaultParallelism) // cores, not files
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val bytes =
          if (id % 2 == 0)
            Multimodal.synthWav(
              channels = (1 + (id / 2) % 2).toInt,
              sampleRate = (8000 + (id % 8) * 1000).toInt,
              dataLen = (nc * 4).toInt)
          else
            Multimodal.synthMp4(
              timescale = 1000, duration = (nc * 3).toInt,
              w = (160 + (id % 16) * 8).toInt,
              h = (90 + (id % 9) * 8).toInt,
              samples = nc.toInt)
        Multimodal.MediaRecord(id,
          if (id % 2 == 0) "audio" else "video", bytes, 0, 0)
      })
    Multimodal.extractAvMeta(recs).toDF()
      .select(col("id").as("doc_id"), col("kind"), col("container"),
        col("codec"), col("channels"),
        col("sampleRate").as("sample_rate"),
        col("durationMs").as("duration_ms"),
        col("width"), col("height"), col("tracks"), col("samples"))
  }

  /** REAL sample-level audio decode, oracle-checked end-to-end: every
    * document synthesizes a valid 16-bit PCM WAV whose data chunk
    * holds deterministic samples s(i) = ((doc_id·131 + i·17) mod
    * 65536) − 32768 (Multimodal.synthPcmWav), the distributed decoder
    * (Multimodal.decodePcm — RIFF walk + raw int16 reads, no codec
    * library because PCM needs none) reads every sample back and
    * folds the integer audio features a filtering pipeline wants
    * (peak/clipping, Σ|s| and Σs² loudness/energy, zero-crossing
    * count), and the oracle recomputes the same stats from the
    * generating arithmetic — a byte-order, offset, or sign-extension
    * bug anywhere in the sample path breaks the hash. All-integer →
    * engine- and partitioning-independent. */
  val audioPcmStats = sql("audio_pcm_stats",
    """WITH p AS (
         SELECT doc_id,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
           (120 + doc_id % 37) * (1 + doc_id % 2) AS n
         FROM documents),
       s AS (
         SELECT doc_id, channels, sample_rate, n, i,
           ((doc_id * 131 + i * 17) % 65536) - 32768 AS v
         FROM p, LATERAL (SELECT unnest(range(0, n)) AS i) t),
       z AS (
         SELECT doc_id, channels, sample_rate, n, v,
           lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
         FROM s)
       SELECT doc_id, channels, sample_rate,
         CAST(max(n) AS BIGINT) AS n_samples,
         CAST(max(abs(v)) AS BIGINT) AS peak,
         CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
         CAST(sum(v * v) AS BIGINT) AS sum_sq,
         CAST(sum(CASE WHEN pv IS NOT NULL AND (pv < 0) <> (v < 0)
                  THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
       FROM z GROUP BY 1, 2, 3""") { (s, d) =>
    import s.implicits._
    import graft.multimodal.Multimodal
    Tables.documents(s, d)
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism) // cores, not files
      .as[Long]
      .mapPartitions(_.map { id =>
        val bytes = Multimodal.synthPcmWav(
          channels = (1 + id % 2).toInt,
          sampleRate = (8000 + (id % 8) * 1000).toInt,
          frames = (120 + id % 37).toInt,
          seed = id)
        val st = Multimodal.decodePcm(bytes).getOrElse(
          throw new IllegalStateException(
            s"audio_pcm_stats: synthesized WAV for doc $id failed to " +
              "decode — the PCM path is broken"))
        (id, st.channels, st.sampleRate, st.nSamples, st.peak,
          st.sumAbs, st.sumSq, st.zeroCrossings)
      })
      .toDF("doc_id", "channels", "sample_rate", "n_samples", "peak",
        "sum_abs", "sum_sq", "zero_crossings")
  }

  val all: Seq[QueryDef] = Seq(
    dedupExactStats, dedupKeepFirst, dedupJaccard, dedupJaccardStoplist,
    dedupMinhashLsh, dedupIncremental, dedupLshRecall, dedupLshCurve,
    dedupSimhash, dedupEmbedding, embDedupFunnel, embMultiprobeFunnel,
    embSrpFunnel, embSrpCurve, embIncrementalDedup,
    dedupClusters, annCosineTop1,
    annBucketedTop1, embDimStats, embNormTopk,
    textLangid, textQuality, textTokenCount, textFingerprint, textTfidf,
    textRepetition, textNormalize, decontaminate, decontaminateOverlap,
    decontaminateBloom,
    sampleHash, sampleSplit, sampleStratified, textEditDistance,
    multimodalFeatures, multimodalAvMeta, audioPcmStats)
}
