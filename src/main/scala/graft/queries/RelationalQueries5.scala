package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TopK

/** Fifth relational batch: the bounded-heap top-k aggregate (shuffle
  * volume k·groups instead of the whole relation), robust statistics
  * (median absolute deviation), and feature hashing for the training
  * pipeline.
  */
object RelationalQueries5 {
  import QueryDef._

  /** Bounded-heap top-k per group (functions.TopK): top-2 parts per
    * brand by exact revenue cents. Identical output contract to the
    * window-rank topk_per_group, but as an algebraic aggregate: the
    * partial side sends at most k rows per (group, map task) across
    * the shuffle — at 100 TB the wire carries a dimension-sized
    * result, not the fact table, and nothing is sorted. */
  val topkPerGroupAgg = sql("topk_per_group_agg",
    """SELECT p_brand, l_partkey, cents, rn FROM (
         SELECT p.p_brand, l.l_partkey,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           row_number() OVER (PARTITION BY p.p_brand
             ORDER BY SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) DESC,
                      l.l_partkey) AS rn
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY p.p_brand, l.l_partkey) t
       WHERE rn <= 2""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    val perPart = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
    TopK.perGroup(perPart, "p_brand", "cents", "l_partkey", 2)
      .select(col("p_brand"), col("l_partkey"), col("cents"),
        col("rn").cast("long").as("rn"))
  }

  /** Median absolute deviation per group — the robust dispersion
    * statistic. Two exact medians (integer-valued quantity keeps every
    * interpolation on exact binary fractions); the per-group median
    * joins back as a broadcast. */
  val aggMad = sql("agg_mad",
    """WITH m AS (
         SELECT l_returnflag, median(l_quantity) AS med
         FROM lineitem GROUP BY l_returnflag)
       SELECT l.l_returnflag,
         round(median(abs(l.l_quantity - m.med)), 6) AS mad
       FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
       GROUP BY l.l_returnflag""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val med = li.groupBy(col("l_returnflag").as("mrf"))
      .agg(expr("median(l_quantity)").as("med"))
    li.join(broadcast(med), col("l_returnflag") === col("mrf"))
      .groupBy(col("l_returnflag"))
      .agg(round(expr("median(abs(l_quantity - med))"), 6).as("mad"))
  }

  /** Feature hashing (the hashing trick): 16-bucket term-count vectors
    * per document via the first md5 nibble — the same engine-portable
    * bucket id Sampling uses, so the featurization is reproducible
    * across runs, engines, and retries. Emitted as (doc, bucket,
    * count) triples — the sparse representation a trainer consumes. */
  val featureHash = sql("feature_hash",
    """WITH tok AS (
         SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS wd
         FROM documents)
       SELECT doc_id, substr(md5(wd), 1, 1) AS bucket, count(*) AS cnt
       FROM tok GROUP BY doc_id, bucket""") { (s, d) =>
    graft.functions.TextDedup.withTokens(Tables.documents(s, d))
      .select(col("doc_id"), explode(col("w")).as("wd"))
      .groupBy(col("doc_id"), substring(md5(col("wd")), 1, 1).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  val all: Seq[QueryDef] = Seq(topkPerGroupAgg, aggMad, featureHash)
}
