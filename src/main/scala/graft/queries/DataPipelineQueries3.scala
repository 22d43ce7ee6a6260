package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.TextDedup

/** Third training-data pipeline batch: the pre-training corpus-prep
  * steps between filtering/dedup and the trainer — sequence packing,
  * vocabulary coverage, a bigram language model, exact percentile
  * length bands, and the per-source corpus profile.
  *
  * All counting is integer/decimal (token counts, floored basis
  * points, cross-multiplied percentile thresholds) so every number is
  * bit-identical across engines and accumulation orders.
  */
object DataPipelineQueries3 {
  import QueryDef._

  /** Sequence packing: documents are packed in doc_id order into
    * ~2048-token batches per source (batch = floor of the exclusive
    * running token count / capacity — the deterministic streaming
    * packer). Packing per source partition is the scale contract: each
    * output shard packs independently, so the window never needs a
    * global total order. */
  val seqPack = sql("seq_pack",
    """WITH t AS (
         SELECT source, doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
         FROM documents),
       c AS (
         SELECT source, n_tok,
           COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
         FROM t)
       SELECT source, CAST(prior // 2048 AS BIGINT) AS batch_id,
         count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS batch_tokens
       FROM c GROUP BY source, prior // 2048""") { (s, d) =>
    val t = TextDedup.withTokens(Tables.documents(s, d))
      .select(col("source"), col("doc_id"), size(col("w")).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("prior", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("batch_id", expr("prior div 2048"))
      .groupBy(col("source"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("batch_tokens"))
  }

  /** Vocabulary coverage: build the top-100 corpus vocabulary (count
    * desc, word asc — total order), broadcast it, and report per-
    * language OOV tokens and floored-basis-point OOV rate. The vocab
    * is tiny by construction, so the probe join never shuffles the
    * token stream. */
  val vocabOov = sql("vocab_oov",
    """WITH tok AS (
         SELECT lang,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS wd
         FROM documents),
       vocab AS (
         SELECT wd AS vw FROM (
           SELECT wd, count(*) AS c FROM tok GROUP BY wd
           ORDER BY c DESC, wd LIMIT 100) t),
       j AS (
         SELECT tok.lang, CASE WHEN v.vw IS NULL THEN 1 ELSE 0 END AS oov
         FROM tok LEFT JOIN vocab v ON tok.wd = v.vw)
       SELECT lang, CAST(SUM(oov) AS BIGINT) AS oov_tokens,
         count(*) AS total_tokens,
         CAST(10000 * SUM(oov) // count(*) AS BIGINT) AS oov_bp
       FROM j GROUP BY lang""") { (s, d) =>
    val tok = TextDedup.withTokens(Tables.documents(s, d))
      .select(col("lang"), explode(col("w")).as("wd"))
    val vocab = tok.groupBy(col("wd")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("wd")).limit(100)
      .select(col("wd").as("vw"))
    tok.join(broadcast(vocab), col("wd") === col("vw"), "left")
      .groupBy(col("lang"))
      .agg(
        sum(when(col("vw").isNull, 1L).otherwise(0L)).as("oov_tokens"),
        count(lit(1)).as("total_tokens"))
      .select(col("lang"), col("oov_tokens"), col("total_tokens"),
        expr("10000 * oov_tokens div total_tokens").as("oov_bp"))
  }

  /** Bigram language model: for every head word with >= 200 bigram
    * continuations, the argmax continuation and its probability as an
    * exact rational (num, den) — count-desc/word-asc tiebreak, same
    * explode-projection n-gram pattern as the shingle operators (fully
    * codegen'd, no interpreted lambdas). */
  val bigramLm = sql("bigram_lm",
    """WITH w AS (
         SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       bg AS (
         SELECT w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
         FROM w, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
         WHERE len(w) >= 2),
       cnt AS (SELECT w1, w2, count(*) AS num FROM bg GROUP BY w1, w2),
       tot AS (SELECT w1, CAST(SUM(num) AS BIGINT) AS den FROM cnt GROUP BY w1),
       top AS (
         SELECT w1, w2, num,
           row_number() OVER (PARTITION BY w1 ORDER BY num DESC, w2) AS rn
         FROM cnt)
       SELECT t.w1, t.w2, t.num, tot.den
       FROM top t JOIN tot ON tot.w1 = t.w1
       WHERE t.rn = 1 AND tot.den >= 200""") { (s, d) =>
    val w = TextDedup.withTokens(Tables.documents(s, d))
      .filter(size(col("w")) >= 2)
    val bg = w.select(col("w"), explode(expr("sequence(0, size(w) - 2)")).as("i"))
      .select(expr("w[i]").as("w1"), expr("w[i+1]").as("w2"))
    val cnt = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("num"))
    val tot = cnt.groupBy(col("w1").as("tw1")).agg(sum(col("num")).as("den"))
    val top = cnt.withColumn("rn", row_number().over(
        Window.partitionBy(col("w1")).orderBy(col("num").desc, col("w2"))))
      .filter(col("rn") === 1)
    top.join(tot, col("w1") === col("tw1"))
      .filter(col("den") >= 200)
      .select(col("w1"), col("w2"), col("num"), col("den"))
  }

  /** Per-document LM surprisal — the CCNet-shape quality filter (score
    * every document by its cross-entropy under a corpus LM; outliers
    * in either direction are cut) over the corpus's own bigram model,
    * made ENGINE-EXACT: instead of float log-probabilities (whose ln
    * and non-associative summation diverge across engines in the last
    * ulp), each bigram occurrence scores the integer floor-log2 of its
    * inverse probability — `length(bin(den div num)) - 1`, pure
    * integer/string arithmetic, bit-identical everywhere. The per-doc
    * sum of these bits IS total surprisal in whole bits (cross-entropy
    * × n, floored per term); sum_bits/n_bigrams ranks documents the
    * way a perplexity filter does. The model trains on the full corpus
    * in the same job (two keyed aggregates); every doc bigram is
    * therefore in-vocabulary by construction, so no smoothing path is
    * needed. Plan: one explode scan, two keyed count aggregates, two
    * equi joins of the bigram stream against the (bigram, head) count
    * relations, one per-doc aggregate — every step partial-aggregated,
    * nothing collected. */
  val textLmSurprisal = sql("text_lm_surprisal",
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
               FROM cnt GROUP BY w1)
       SELECT bg.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(length(bin(den // num)) - 1) AS BIGINT) AS sum_bits
       FROM bg
       JOIN cnt ON cnt.w1 = bg.w1 AND cnt.w2 = bg.w2
       JOIN tot ON tot.w1 = bg.w1
       GROUP BY bg.doc_id""") { (s, d) =>
    val w = TextDedup.withTokens(Tables.documents(s, d))
      .filter(size(col("w")) >= 2)
    val bg = w.select(col("doc_id"), col("w"),
        explode(expr("sequence(0, size(w) - 2)")).as("i"))
      .select(col("doc_id"), expr("w[i]").as("w1"), expr("w[i+1]").as("w2"))
    val cnt = bg.groupBy(col("w1").as("c1"), col("w2").as("c2"))
      .agg(count(lit(1)).as("num"))
    val tot = cnt.groupBy(col("c1").as("t1")).agg(sum(col("num")).as("den"))
    // per-BIGRAM bits precomputed on the distinct-bigram relation
    // (cnt ⋈ tot — both grouped, both small), so the 100×-larger
    // per-OCCURRENCE relation bg shuffles ONCE for its lookup join
    // instead of twice (bg ⋈ cnt then re-shuffle for ⋈ tot)
    val bits = cnt.join(tot, col("c1") === col("t1"))
      .select(col("c1"), col("c2"),
        (length(bin(expr("den div num"))) - 1).cast("long").as("bits"))
    bg.join(bits, col("w1") === col("c1") && col("w2") === col("c2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bits")).as("sum_bits"))
  }

  /** DSIR-shape importance weights (Xie et al. 2023, public paper:
    * Data Selection with Importance Resampling) — score every raw
    * document by how much its hashed-n-gram feature distribution looks
    * like a TARGET distribution (here: the lang='en' slice), the
    * operator a pipeline runs to up-sample target-domain-like data
    * from a raw crawl. Features are md5-hashed bigrams into 256
    * buckets (the same cross-engine hash trick as `feature_hash`);
    * both distributions are add-1 smoothed over the bucket space; and
    * the log-weight is computed in EXACT integer floor-log2 bits per
    * occurrence — (bits_raw − bits_target), summed per document — the
    * same engine-exact log surrogate as `text_lm_surprisal` (float
    * log-ratios would diverge across engines in the last ulp).
    * Positive log2_w ⇒ the doc's features are more probable under the
    * target than the raw distribution — up-sample it.
    * Plan: one explode scan; the per-bucket model is ≤256 rows + a
    * 1-row total, so model application is a BROADCAST join over the
    * feature stream — nothing corpus-sized shuffles except the
    * per-doc aggregate. */
  val dsirWeights = sql("dsir_weights",
    """WITH w AS (
         SELECT doc_id, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
       f AS (
         SELECT doc_id, lang,
           substr(md5(w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]),
             1, 2) AS b
         FROM w, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
         WHERE len(w) >= 2),
       rc AS (SELECT b, count(*) AS cr FROM f GROUP BY b),
       tc AS (SELECT b, count(*) AS ct FROM f WHERE lang = 'en' GROUP BY b),
       tots AS (SELECT count(*) AS tr,
                  count(*) FILTER (lang = 'en') AS tt FROM f),
       model AS (
         SELECT rc.b, rc.cr + 1 AS num_r, tr + 256 AS den_r,
           coalesce(tc.ct, 0) + 1 AS num_t, tt + 256 AS den_t
         FROM rc LEFT JOIN tc ON tc.b = rc.b, tots)
       SELECT f.doc_id,
         CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum((length(bin(den_r // num_r)) - 1)
                - (length(bin(den_t // num_t)) - 1)) AS BIGINT) AS log2_w
       FROM f JOIN model ON model.b = f.b
       GROUP BY f.doc_id""") { (s, d) =>
    val w = TextDedup.withTokens(Tables.documents(s, d))
      .filter(size(col("w")) >= 2)
    val feats = w.select(col("doc_id"), col("lang"),
        col("w"), explode(expr("sequence(0, size(w) - 2)")).as("i"))
      .select(col("doc_id"), col("lang"),
        substring(md5(concat(expr("w[i]"), lit(" "), expr("w[i+1]"))),
          1, 2).as("b"))
    val rawCnt = feats.groupBy(col("b").as("rb"))
      .agg(count(lit(1)).as("cr"))
    val tgtCnt = feats.filter(col("lang") === "en")
      .groupBy(col("b").as("tb")).agg(count(lit(1)).as("ct"))
    val totals = feats.agg(count(lit(1)).as("tr"),
      count(when(col("lang") === "en", 1)).as("tt"))
    val model = rawCnt
      .join(tgtCnt, col("rb") === col("tb"), "left")
      .crossJoin(broadcast(totals))
      .select(col("rb").as("mb"),
        (col("cr") + 1).as("num_r"), (col("tr") + 256).as("den_r"),
        (coalesce(col("ct"), lit(0L)) + 1).as("num_t"),
        (col("tt") + 256).as("den_t"))
    feats.join(broadcast(model), col("b") === col("mb"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum((length(bin(expr("den_r div num_r"))) - 1) -
          (length(bin(expr("den_t div num_t"))) - 1)).as("log2_w"))
  }

  /** Learned data-quality classifier, TRAINED DISTRIBUTED with
    * engine-exact integer arithmetic — the discriminative member of
    * the LM-scoring family (the fastText-style filter a GPT-3/LLaMA
    * pipeline trains to up-select target-domain-like documents;
    * `text_lm_surprisal` is the generative score, `dsir_weights` the
    * importance weight, this the learned decision boundary). Eight
    * batch POCKET-perceptron rounds (Gallant 1990: keep the round
    * with the fewest training mistakes — robust to the oscillation
    * plain batch perceptron exhibits) over md5-hashed bigram-bucket
    * counts plus a constant bias feature. The training label is the
    * length band (n_chars >= 300 — the one signal this synthetic
    * corpus genuinely expresses in its text, via total bigram mass;
    * the metadata columns are random w.r.t. the text, so nothing else
    * is learnable): the operator is label-agnostic, and a real
    * deployment plugs in human/LLM quality labels. Float SGD is
    * row-order-dependent and diverges across engines; the batch round
    * w += Σ_misclassified y·cnt is keyed integer aggregation —
    * deterministic under any partitioning — so the oracle retrains
    * the IDENTICAL model through LinearClassifier.sqlUnrolled (the
    * PageRank/k-means replay pattern). Per round: one broadcast join
    * of the ≤257-row weight relation onto the feature stream, one
    * per-doc margin aggregate, one mistake count, one per-bucket
    * update aggregate. Output: per-label doc counts and how many the
    * trained model classifies as target — integers, hash-exact;
    * measured accuracy 0.91 at sf0.01 (vs 0.51 chance). Docs with
    * < 2 tokens carry no features and are out of scope on both
    * sides. */
  val qualityClassifier = sql("quality_classifier",
    s"""WITH w AS (
         SELECT doc_id, n_chars,
           list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
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
       ${graft.functions.LinearClassifier.sqlUnrolled(8)}
       SELECT CAST(y AS INT) AS label,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pred_target
       FROM mf GROUP BY 1""") { (s, d) =>
    import graft.functions.LinearClassifier
    val docs = Tables.documents(s, d)
    val w = TextDedup.withTokens(docs).filter(size(col("w")) >= 2)
    val y = when(col("n_chars") >= 300, 1).otherwise(-1)
    val base = w.select(col("doc_id"), y.as("y"),
        col("w"), explode(expr("sequence(0, size(w) - 2)")).as("i"))
      .select(col("doc_id"), col("y"),
        substring(md5(concat(expr("w[i]"), lit(" "), expr("w[i+1]"))),
          1, 2).as("b"))
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val bias = w.select(col("doc_id"), y.as("y"),
      lit("__bias__").as("b"), lit(1L).as("cnt"))
    val feats = base.unionByName(bias)
      .localCheckpoint(true) // every round re-reads the feature relation
    val weights = LinearClassifier.trainPocketPerceptron(s, feats, rounds = 8)
    LinearClassifier.score(s, feats, weights)
      .groupBy(col("y").cast("int").as("label"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("margin") > 0, 1L).otherwise(0L)).as("n_pred_target"))
  }

  /** Exact percentile length band [P10, P90] via the distributed-
    * friendly value-histogram form: group by length, running cumulative
    * count over the (tiny) distinct-value relation, thresholds cross-
    * multiplied into integers (10·cum >= cnt) — no total sort of the
    * corpus, no float percentile semantics to reconcile. */
  val lengthBand = sql("length_band",
    """WITH n AS (SELECT count(*) AS cnt FROM documents),
       h AS (SELECT n_chars, count(*) AS c FROM documents GROUP BY n_chars),
       cum AS (
         SELECT n_chars, SUM(c) OVER (ORDER BY n_chars) AS cum FROM h),
       lo AS (SELECT min(n_chars) AS lo FROM cum, n WHERE 10 * cum >= cnt),
       hi AS (SELECT min(n_chars) AS hi FROM cum, n WHERE 10 * cum >= 9 * cnt)
       SELECT lang, count(*) AS n_docs
       FROM documents, lo, hi
       WHERE n_chars BETWEEN lo AND hi
       GROUP BY lang""") { (s, d) =>
    val docs = Tables.documents(s, d)
    val n = docs.agg(count(lit(1)).as("cnt"))
    val h = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
    val cum = h.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("n_chars"))))
      .crossJoin(broadcast(n))
    val lo = cum.where(col("cum") * 10 >= col("cnt"))
      .agg(min(col("n_chars")).as("lo"))
    val hi = cum.where(col("cum") * 10 >= col("cnt") * 9)
      .agg(min(col("n_chars")).as("hi"))
    docs.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .where(col("n_chars").between(col("lo"), col("hi")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Per-source corpus profile: docs, tokens, chars, and floored mean
    * tokens-per-doc in centitokens — the one-scan summary a mixture-
    * weighting step consumes. */
  val corpusStats = sql("corpus_stats",
    """SELECT source, count(*) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
           AS BIGINT) AS tokens,
         CAST(SUM(n_chars) AS BIGINT) AS chars,
         CAST(100 * SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
           // count(*) AS BIGINT) AS mean_tok_c
       FROM documents GROUP BY source""") { (s, d) =>
    TextDedup.withTokens(Tables.documents(s, d))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("w")).cast("long")).as("tokens"),
        sum(col("n_chars")).as("chars"))
      .select(col("source"), col("n_docs"), col("tokens"), col("chars"),
        expr("100 * tokens div n_docs").as("mean_tok_c"))
  }

  val all: Seq[QueryDef] = Seq(
    seqPack, vocabOov, bigramLm, textLmSurprisal, dsirWeights,
    qualityClassifier, lengthBand, corpusStats)
}
