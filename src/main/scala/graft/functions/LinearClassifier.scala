package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed training of a LINEAR data-quality classifier with
  * engine-exact integer arithmetic — the discriminative member of the
  * LM-scoring family (surprisal = generative, DSIR = importance
  * weighting, this = the fastText-style learned filter a pipeline
  * trains to keep "looks like the target" documents).
  *
  * The model is a batch POCKET perceptron (Gallant 1990, public
  * algorithm) over hashed integer features: float SGD diverges across
  * engines in the last ulp and depends on row order, while the batch
  * round
  *
  *   w_{k+1}[b] = w_k[b] + Σ_{d misclassified under w_k} y_d · cnt[d, b]
  *
  * is pure integer arithmetic over keyed aggregates — deterministic
  * under any partitioning — and the POCKET rule (return the w_k with
  * the fewest training mistakes, earliest k on ties, k = 0..rounds)
  * makes the result robust to the oscillation plain batch perceptron
  * exhibits on non-separable data. Both pieces unroll exactly in SQL
  * ([[sqlUnrolled]] — the PageRank/k-means replay pattern), so the
  * oracle retrains the identical model.
  *
  * Scale shape per round: ONE broadcast join of the (≤ bucket-space)-
  * row weight relation onto the feature stream, one per-doc margin
  * aggregate, one mistake count, one per-bucket update aggregate —
  * nothing corpus-sized shuffles except on the doc and bucket keys.
  * The weight vector is driver-held between rounds like the IVF
  * codebook (bounded by construction: one row per hash bucket).
  */
object LinearClassifier {

  /** Train `rounds` batch-perceptron updates over a feature relation
    * `feats` with columns (doc_id: Long, y: Int ∈ {-1, +1}, b: String,
    * cnt: Long), returning the POCKET weights: of the rounds+1 weight
    * vectors w_0 = 0, w_1, ..., w_rounds, the one with the fewest
    * training mistakes (y·margin <= 0), earliest on ties. Under w_0
    * every doc has margin 0 and counts as a mistake — the standard
    * all-misclassified cold start.
    *
    * The feature relation MUST carry a constant bias feature: bucket
    * `biasBucket` with cnt = 1 on EVERY doc (enforced). A threshold
    * task needs the bias anyway, and it also makes each round ONE
    * Spark job: the per-bucket update aggregate's row count for the
    * bias bucket IS the misclassified-doc count (every doc contributes
    * exactly one bias row), so scoring, mistake counting, and the
    * update all ride a single collect per round instead of three
    * driver round-trips. */
  def trainPocketPerceptron(spark: SparkSession, feats: DataFrame,
      rounds: Int, maxBuckets: Int = 4096,
      biasBucket: String = "__bias__"): Map[String, Long] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // NOTE (round 15): round 14 pre-shuffled the feature relation by
    // doc_id and localCheckpointed it here so the rounds+1 score
    // passes share one exchange. That shuffles and PINS raw feature
    // rows where each round otherwise shuffles map-side
    // partially-aggregated per-doc rows — backwards for a
    // cardinality-reducing aggregate (guide §2.3: aggregate before
    // you shuffle), and the driver's bench convicted it
    // (text_curation_apply 0.61x). Reverted to the per-round
    // partial-agg form.
    val f = feats
    var w = Map.empty[String, Long]
    var bestW = w
    var bestMis = Long.MaxValue
    for (k <- 0 to rounds) {
      val mis = score(spark, f, w)
        .filter(col("y") * col("margin") <= 0)
        .select(col("doc_id"))
      val delta = f
        .join(mis, Seq("doc_id"), "leftsemi")
        .groupBy(col("b"))
        .agg(sum(col("y") * col("cnt")).as("d"),
          count(lit(1)).as("n"))
        .collect() // bounded: one row per hash bucket
      require(delta.length <= maxBuckets,
        s"perceptron bucket space exceeds $maxBuckets — hash " +
          "features into a bounded bucket space before training")
      require(delta.isEmpty || delta.exists(_.getString(0) == biasBucket),
        s"trainPocketPerceptron requires a constant '$biasBucket' " +
          "feature (cnt = 1) on every doc — see scaladoc")
      val misCount = delta.find(_.getString(0) == biasBucket)
        .map(_.getLong(2)).getOrElse(0L)
      if (misCount < bestMis) { bestMis = misCount; bestW = w }
      if (k < rounds && misCount > 0) {
        val upd = delta.map(r => r.getString(0) -> r.getLong(1)).toMap
        w = (w.keySet ++ upd.keySet).iterator
          .map(b => b -> (w.getOrElse(b, 0L) + upd.getOrElse(b, 0L)))
          .filter(_._2 != 0L).toMap
      }
    }
    bestW
  }

  /** Margins of every doc under a weight map: (doc_id, y, margin). The
    * weights enter as a broadcast relation (≤ bucket-space rows). */
  def score(spark: SparkSession, feats: DataFrame,
      w: Map[String, Long]): DataFrame = {
    import spark.implicits._
    val wDf = w.toSeq.toDF("wb", "wv")
    feats
      .join(broadcast(wDf), col("b") === col("wb"), "left")
      .groupBy(col("doc_id"))
      .agg(max(col("y")).as("y"),
        coalesce(sum(col("cnt") * col("wv")), lit(0L)).as("margin"))
  }

  /** The CTE chain replaying [[trainPocketPerceptron]] in SQL, for
    * interpolation after a CTE named `f` with columns (doc_id, y, b,
    * cnt) — the PageRank.sqlUnrolled pattern. Defines m0..m`rounds`
    * (per-round margins), w1..w`rounds` (weights AFTER k updates),
    * `mcnt` (per-k training mistakes), `pick` (the pocket round),
    * `wbest`, and finally `mf` (doc_id, y, margin under the pocket
    * weights). Starts with a leading comma. */
  def sqlUnrolled(rounds: Int): String = {
    require(rounds >= 1)
    val sb = new StringBuilder
    sb.append(
      """,
        m0 AS MATERIALIZED (SELECT doc_id, max(y) AS y, CAST(0 AS BIGINT) AS margin
               FROM f GROUP BY 1)""")
    for (k <- 0 until rounds) {
      sb.append(s""",
        u$k AS MATERIALIZED (
          SELECT f.b, sum(f.y * f.cnt) AS d
          FROM f JOIN m$k ON m$k.doc_id = f.doc_id
          WHERE m$k.y * m$k.margin <= 0 GROUP BY 1)""")
      if (k == 0)
        sb.append(""",
        w1 AS MATERIALIZED (SELECT b, d AS wv FROM u0)""")
      else
        sb.append(s""",
        w${k + 1} AS MATERIALIZED (
          SELECT coalesce(w$k.b, u$k.b) AS b,
            coalesce(w$k.wv, 0) + coalesce(u$k.d, 0) AS wv
          FROM w$k FULL JOIN u$k ON u$k.b = w$k.b)""")
      sb.append(s""",
        m${k + 1} AS MATERIALIZED (
          SELECT f.doc_id, max(f.y) AS y,
            coalesce(sum(f.cnt * w${k + 1}.wv), 0) AS margin
          FROM f LEFT JOIN w${k + 1} ON w${k + 1}.b = f.b GROUP BY 1)""")
    }
    val mcnt = (0 to rounds).map(k =>
      s"SELECT $k AS k, (SELECT count(*) FROM m$k " +
        "WHERE y * margin <= 0) AS mis").mkString(" UNION ALL ")
    val allw = (1 to rounds).map(k =>
      s"SELECT $k AS k, b, wv FROM w$k").mkString(" UNION ALL ")
    sb.append(s""",
        mcnt AS MATERIALIZED ($mcnt),
        allw AS MATERIALIZED ($allw),
        pick AS MATERIALIZED (SELECT k FROM mcnt ORDER BY mis, k LIMIT 1),
        wbest AS MATERIALIZED (SELECT b, wv FROM allw JOIN pick USING (k)),
        mf AS MATERIALIZED (
          SELECT f.doc_id, max(f.y) AS y,
            coalesce(sum(f.cnt * wbest.wv), 0) AS margin
          FROM f LEFT JOIN wbest ON wbest.b = f.b GROUP BY 1)""")
    sb.toString
  }
}
