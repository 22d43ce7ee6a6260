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
    seqPack, vocabOov, bigramLm, lengthBand, corpusStats)
}
