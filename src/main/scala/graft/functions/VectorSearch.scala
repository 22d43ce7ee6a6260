package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity-search operators over an embedding column
  * (`Array[Float]`) — the two-tier ANN design: a sign-pattern coarse
  * quantizer (IVF-style bucketing) generates candidates at scale, and
  * the brute-force kernel re-ranks / verifies a BOUNDED candidate set.
  *
  * Scale contract (100 TB): nothing here ever collects an unbounded
  * relation to the driver. The exact kernels take an explicit
  * `(probes, candidates)` pair and enforce `maxCandidates` on the
  * collected side (`require` — a clean failure, not a driver OOM);
  * corpus-wide dedup/top-1 goes through the bucketed/IVF operators,
  * whose candidate generation is an equi join on a bucket key.
  *
  * Determinism contract: all cosine arithmetic is double with
  * ascending-index multiply-add then sqrt-normalize — the same
  * evaluation order in the broadcast kernel, the codegen'd
  * `CosineSimilarity` expression, and the DuckDB oracles, so
  * similarities are bit-identical everywhere (ties broken by id).
  */
object VectorSearch {

  /** Default hard cap on the collected candidate side of the exact
    * kernels: 64-dim floats at 100k rows is ~26 MB broadcast — safely
    * inside driver/executor memory with headroom for wider vectors. */
  val DefaultMaxCandidates = 100000

  private def collectBounded(candidates: DataFrame,
      maxCandidates: Int): Array[(Long, Array[Float])] = {
    val sp = candidates.sparkSession
    import sp.implicits._
    val rows = candidates.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .take(maxCandidates + 1)
    require(rows.length <= maxCandidates,
      s"candidate side exceeds maxCandidates=$maxCandidates rows; " +
        "generate candidates with signBucket/IVF/LSH and re-rank those " +
        "instead of collecting an unbounded relation")
    rows.sortBy(_._1)
  }

  /** Exact cosine top-1 among `candidates` for every probe: (vec_id,
    * neighbor_id, cosim). The candidate set is collected (bounded by
    * `maxCandidates`, enforced) and broadcast; each partition streams
    * its probes against it in a tight loop — a relational n² self-join
    * would materialize and shuffle every pair (measured ~10× slower).
    * At scale this is the re-rank kernel over candidates from the
    * bucketed/IVF tiers, never the full corpus. */
  def bruteForceCosineTop1(probes: DataFrame, candidates: DataFrame,
      maxCandidates: Int = DefaultMaxCandidates): DataFrame = {
    val sp = probes.sparkSession
    import sp.implicits._
    val bc = sp.sparkContext.broadcast(collectBounded(candidates, maxCandidates))
    probes.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cand = bc.value
        val norms = cand.map { case (_, v) =>
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
          math.sqrt(acc)
        }
        it.map { case (id, emb) =>
          var acc = 0.0; var i = 0
          while (i < emb.length) { acc += emb(i).toDouble * emb(i).toDouble; i += 1 }
          val na = math.sqrt(acc)
          var bestSim = Double.NegativeInfinity
          var bestId = Long.MaxValue
          var j = 0
          while (j < cand.length) {
            val (cid, cv) = cand(j)
            if (cid != id) {
              var dot = 0.0; var k = 0
              while (k < cv.length) { dot += emb(k).toDouble * cv(k).toDouble; k += 1 }
              val sim = dot / (na * norms(j))
              if (sim > bestSim || (sim == bestSim && cid < bestId)) {
                bestSim = sim; bestId = cid
              }
            }
            j += 1
          }
          (id, bestId, bestSim)
        }
      }.toDF("vec_id", "neighbor_id", "cosim")
  }

  /** Exact cosine top-K among `candidates` for every probe — the
    * kNN-graph construction kernel: one output row per (probe, rank)
    * with rank 1..k ordered by cosine desc, ties broken by ascending
    * neighbor id (the suite-wide convention, and the same ORDER BY the
    * oracle's window uses). Same broadcast streaming shape and
    * `maxCandidates` enforcement as the top-1 kernel; the per-probe
    * state is a k-slot insertion buffer (k is small — the kernel is
    * O(candidates · k) per probe, not a sort). At scale this re-ranks
    * candidates from the bucketed/IVF tiers, never the full corpus. */
  def bruteForceCosineTopK(probes: DataFrame, candidates: DataFrame,
      k: Int, maxCandidates: Int = DefaultMaxCandidates): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sp = probes.sparkSession
    import sp.implicits._
    val bc = sp.sparkContext.broadcast(collectBounded(candidates, maxCandidates))
    probes.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cand = bc.value
        val norms = cand.map { case (_, v) =>
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
          math.sqrt(acc)
        }
        it.flatMap { case (id, emb) =>
          var acc = 0.0; var i = 0
          while (i < emb.length) { acc += emb(i).toDouble * emb(i).toDouble; i += 1 }
          val na = math.sqrt(acc)
          // k-slot insertion buffer, kept sorted best-first
          val topSim = new Array[Double](k)
          val topId = new Array[Long](k)
          var filled = 0
          var j = 0
          while (j < cand.length) {
            val (cid, cv) = cand(j)
            if (cid != id) {
              var dot = 0.0; var m = 0
              while (m < cv.length) { dot += emb(m).toDouble * cv(m).toDouble; m += 1 }
              val sim = dot / (na * norms(j))
              val beatsLast = filled < k || sim > topSim(filled - 1) ||
                (sim == topSim(filled - 1) && cid < topId(filled - 1))
              if (beatsLast) {
                var pos = if (filled < k) filled else k - 1
                while (pos > 0 && (sim > topSim(pos - 1) ||
                    (sim == topSim(pos - 1) && cid < topId(pos - 1)))) {
                  topSim(pos) = topSim(pos - 1); topId(pos) = topId(pos - 1)
                  pos -= 1
                }
                topSim(pos) = sim; topId(pos) = cid
                if (filled < k) filled += 1
              }
            }
            j += 1
          }
          (0 until filled).map(r => (id, r + 1, topId(r), topSim(r)))
        }
      }.toDF("vec_id", "rank", "neighbor_id", "cosim")
  }

  /** Exact near-duplicate pairs between probes and a BOUNDED candidate
    * set: ordered pairs (keep_id < dup_id) with cosine >= minSim — the
    * verification kernel of embedding dedup. Same broadcast streaming
    * shape as the top-1 kernel, same `maxCandidates` enforcement; the
    * corpus-wide operator is `bucketedThresholdPairs` below. */
  def cosineThresholdPairs(probes: DataFrame, candidates: DataFrame,
      minSim: Double,
      maxCandidates: Int = DefaultMaxCandidates): DataFrame = {
    val sp = probes.sparkSession
    import sp.implicits._
    val bc = sp.sparkContext.broadcast(collectBounded(candidates, maxCandidates))
    probes.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cand = bc.value
        val norms = cand.map { case (_, v) =>
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
          math.sqrt(acc)
        }
        it.flatMap { case (id, emb) =>
          var acc = 0.0; var i = 0
          while (i < emb.length) { acc += emb(i).toDouble * emb(i).toDouble; i += 1 }
          val na = math.sqrt(acc)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var j = 0
          while (j < cand.length) {
            val (cid, cv) = cand(j)
            if (cid > id) {
              var dot = 0.0; var k = 0
              while (k < cv.length) { dot += emb(k).toDouble * cv(k).toDouble; k += 1 }
              val sim = dot / (na * norms(j))
              if (sim >= minSim) out += ((id, cid, sim))
            }
            j += 1
          }
          out
        }
      }.toDF("keep_id", "dup_id", "cosim")
  }

  /** Corpus-scale embedding near-dup: candidate pairs share a sign
    * bucket (equi join on the bucket key — one shuffle, never a cross
    * product), verified with the codegen'd exact cosine. This is the
    * candidates-then-verify architecture of the text LSH dedup applied
    * to embedding space; recall is governed by `dims` exactly like LSH
    * banding (fewer bucket bits → more candidates → higher recall).
    * Returns (keep_id, dup_id, cosim) with keep_id < dup_id. */
  def bucketedThresholdPairs(df: DataFrame, minSim: Double,
      dims: Int = 6): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    val e = df.withColumn("bucket", signBucket("embedding", dims))
    val a = e.select(col("vec_id").as("keep_id"), col("bucket"),
      col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("dup_id"), col("bucket").as("bucket2"),
      col("embedding").as("eb"))
    a.join(b, col("bucket") === col("bucket2") && col("keep_id") < col("dup_id"))
      .withColumn("cosim", expr("cosine_sim(ea, eb)"))
      .filter(col("cosim") >= minSim)
      .select(col("keep_id"), col("dup_id"), col("cosim"))
  }

  /** Sign-pattern coarse quantizer: the bucket id is the sign bit of
    * the first `dims` dimensions — 2^dims buckets, no training pass
    * needed, deterministic. (A learned-centroid IVF would replace this
    * column; everything downstream is unchanged.) */
  def signBucket(embCol: String, dims: Int = 6): Column =
    expr(s"""concat_ws('', transform(slice($embCol, 1, $dims),
         x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END))""")

  /** Multi-probe set over a sign bucket: the bucket itself plus every
    * one-bit flip — 1 + dims probes. */
  def signBucketProbes(bucketCol: String, dims: Int = 6): Column =
    array((col(bucketCol) +: (1 to dims).map(i =>
      expr(s"""concat(substr($bucketCol, 1, ${i - 1}),
        CASE WHEN substr($bucketCol, $i, 1) = '1' THEN '0' ELSE '1' END,
        substr($bucketCol, ${i + 1}, ${dims - i}))"""))): _*)

  /** Multi-probe sign-bucket near-dup: recall extends from same-bucket
    * to sign-Hamming <= 1 for a bounded (1 + dims)× candidate
    * multiplier — the remediation `emb_dedup_funnel`'s measured recall
    * motivates at moderate thresholds, where requiring ALL sign bits
    * equal is too selective. The probe expansion happens on ONE side
    * only: a distance-1 pair differs in exactly one sign bit, so that
    * side's flip of the bit lands on the other's bucket, and a
    * same-bucket pair matches via the un-flipped probe — each
    * unordered pair is generated exactly once, no distinct pass. Still
    * one equi join; still never n². Returns (keep_id, dup_id, cosim)
    * with keep_id < dup_id, exact cosine >= minSim. */
  def multiProbeBucketedThresholdPairs(df: DataFrame, minSim: Double,
      dims: Int = 6): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    val e = df.withColumn("bucket", signBucket("embedding", dims))
    val a = e.select(col("vec_id").as("keep_id"),
      explode(signBucketProbes("bucket", dims)).as("probe"),
      col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("dup_id"),
      col("bucket").as("bucket2"), col("embedding").as("eb"))
    a.join(b, col("probe") === col("bucket2") &&
        col("keep_id") < col("dup_id"))
      .withColumn("cosim", expr("cosine_sim(ea, eb)"))
      .filter(col("cosim") >= minSim)
      .select(col("keep_id"), col("dup_id"), col("cosim"))
  }

  /** Rademacher (±1) hyperplane weights for SRP-LSH, md5-derived so
    * both engines replay them exactly: w(t, j, d) = +1 iff the first
    * hex nibble of md5("srp:t:j:d") is odd. ±1 random projections
    * preserve angles like Gaussian ones (Achlioptas 2003, public
    * result) and keep the dot product in INTEGER arithmetic once the
    * embedding is fixed-pointed — no float-summation-order risk across
    * engines. */
  private def srpWeights(bits: Int, tables: Int,
      dims: Int): Array[Array[Array[Int]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables, bits, dims) { (t, j, d) =>
      md.reset()
      val h = md.digest(s"srp:$t:$j:$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 1) 1 else -1
    }
  }

  /** Fixed-point multiplier shared with the DuckDB oracle: floor(v·2^20)
    * is IEEE-exact (power-of-two scale), so SRP dots are integer sums —
    * bit-identical across engines, summation-order-independent. */
  val SrpFixedPointScale = 1048576L

  /** Per-vector SRP-LSH signatures: `tables` independent sign-hash
    * signatures of `bits` bits each — sig t bit j is the sign of the
    * Rademacher projection Σ_d w(t,j,d)·floor(emb(d)·2^20), packed as
    * an INTEGER in [0, 2^bits) (bit j contributes 2^(bits-1-j) when
    * the dot is >= 0). Returns (vec_id, sigs: Array[Int]); the
    * signature relation is tiny (L ints per vector — integers, not
    * strings, so the downstream join keys are fixed-width and the
    * exploded relation stays narrow), computed in one shuffle-free
    * broadcast-weights kernel pass (the weight tensor is
    * tables×bits×dims ints — KBs). */
  def srpSignatures(df: DataFrame, bits: Int, tables: Int,
      dims: Int = 64): DataFrame = {
    require(bits >= 1 && bits <= 30 && tables >= 1 && dims >= 1)
    val sp = df.sparkSession
    import sp.implicits._
    val bc = sp.sparkContext.broadcast(srpWeights(bits, tables, dims))
    df.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, emb) =>
        require(emb.length == dims,
          s"srpSignatures: expected $dims dims, got ${emb.length}")
        val w = bc.value
        val fx = new Array[Long](dims)
        var d = 0
        while (d < dims) {
          fx(d) = math.floor(emb(d).toDouble * SrpFixedPointScale).toLong
          d += 1
        }
        val sigs = new Array[Int](tables)
        var t = 0
        while (t < tables) {
          var sig = 0
          var j = 0
          while (j < bits) {
            var dot = 0L
            var k = 0
            while (k < dims) { dot += w(t)(j)(k) * fx(k); k += 1 }
            if (dot >= 0L) sig |= 1 << (bits - 1 - j)
            j += 1
          }
          sigs(t) = sig
          t += 1
        }
        (id, sigs)
      }.toDF("vec_id", "sigs")
  }

  /** SRP-LSH candidate pairs with OR-amplification across `tables`
    * independent hash tables — the recall remediation the funnel rows
    * motivate: one sign-bucket table recalls only near-identical
    * vectors at moderate thresholds (`emb_dedup_funnel` measured 0.05
    * at cosine 0.3; one-bit multi-probe lifted it to 0.24), while L
    * independent tables recall 1-(1-p)^L — exponentially approaching 1
    * in L (measured at sf0.01: 6 bits × 24 tables → 0.71 sample recall
    * at 0.33·n² candidates; see `emb_srp_funnel`).
    *
    * Exactly-once pair generation: raw per-table collisions come from
    * ONE equi join on the exploded (t, sig) integer key, and a pair
    * colliding in several tables is collapsed by a keyed aggregate —
    * exactly-once BY CONSTRUCTION, with only narrow (id, id) rows in
    * the aggregate's shuffle. (A join-side first-colliding-table
    * residual over the signature arrays avoids that shuffle but costs
    * interpreted slice/zip_with/exists per RAW collision — measured 3×
    * slower than aggregating the narrow rows at sf0.1.) Embeddings are
    * NOT carried through the explode — candidates are id pairs; the
    * verify tier joins vectors back by id so embedding bytes shuffle
    * once, not L×. */
  def srpLshCandidatePairs(df: DataFrame, bits: Int, tables: Int,
      dims: Int = 64): DataFrame =
    srpRawCollisions(srpSignatures(df, bits, tables, dims))
      .groupBy(col("keep_id"), col("dup_id")).agg(count(lit(1)).as("_n"))
      .select(col("keep_id"), col("dup_id"))

  /** Raw per-table collision pairs (a pair appears once PER colliding
    * table): the shared join under the candidate tier and the
    * verify-then-dedup production path. */
  private def srpRawCollisions(sg: DataFrame): DataFrame = {
    val a = sg.select(col("vec_id").as("keep_id"),
      posexplode(col("sigs")).as(Seq("t", "sig")))
    val b = sg.select(col("vec_id").as("dup_id"),
      posexplode(col("sigs")).as(Seq("t2", "sig2")))
    a.join(b,
        col("t") === col("t2") && col("sig") === col("sig2") &&
          col("keep_id") < col("dup_id"))
      .select(col("keep_id"), col("dup_id"))
  }

  /** Raw collisions scored with the exact codegen'd cosine — shared by
    * the threshold and funnel tiers. A pair colliding in k tables is
    * scored k times (the OR-amplification overhead, ~25% extra cosine
    * evals at the funnel config) — cheaper than deduplicating FIRST,
    * which would shuffle every raw collision through a keyed aggregate
    * before any filter can shrink the stream. */
  private def srpScoredRaw(df: DataFrame, bits: Int, tables: Int,
      dims: Int): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    srpRawCollisions(srpSignatures(df, bits, tables, dims))
      .join(df.select(col("vec_id").as("keep_id"),
        col("embedding").as("ea")), "keep_id")
      .join(df.select(col("vec_id").as("dup_id"),
        col("embedding").as("eb")), "dup_id")
      .withColumn("cosim", expr("cosine_sim(ea, eb)"))
      .select(col("keep_id"), col("dup_id"), col("cosim"))
  }

  /** Every distinct SRP candidate pair with its exact cosine,
    * UNFILTERED — the funnel measurement relation: count = candidate
    * volume, count(cosim >= θ) = verified pairs, one pass. */
  def srpScoredCandidatePairs(df: DataFrame, bits: Int, tables: Int,
      dims: Int = 64): DataFrame =
    srpScoredRaw(df, bits, tables, dims)
      .groupBy(col("keep_id"), col("dup_id"))
      .agg(max(col("cosim")).as("cosim")) // duplicates carry equal cosims

  /** SRP-LSH near-dup: the OR-amplified candidate tier verified with
    * the exact codegen'd cosine — the production embedding-dedup
    * operator for moderate similarity thresholds where
    * [[bucketedThresholdPairs]] under-recalls. The threshold filter
    * runs BEFORE the exactly-once dedup, so the aggregate's shuffle
    * carries only verified pairs, not every raw collision. Returns
    * (keep_id, dup_id, cosim) with keep_id < dup_id, cosine >=
    * minSim. */
  def srpThresholdPairs(df: DataFrame, minSim: Double, bits: Int,
      tables: Int, dims: Int = 64): DataFrame =
    srpScoredRaw(df, bits, tables, dims)
      .filter(col("cosim") >= minSim)
      .groupBy(col("keep_id"), col("dup_id"))
      .agg(max(col("cosim")).as("cosim"))

  /** Per-pair FIRST colliding table over the SRP tables: (keep_id,
    * dup_id, mt) where mt = min table index on which the pair's
    * signatures agree. Because OR-amplification over the first L
    * tables finds exactly the pairs with mt < L, this single relation
    * carries the ENTIRE recall-vs-L curve — one min-aggregate instead
    * of L separate candidate runs. */
  def srpFirstCollisionTable(df: DataFrame, bits: Int, tables: Int,
      dims: Int = 64): DataFrame = {
    val sg = srpSignatures(df, bits, tables, dims)
    val a = sg.select(col("vec_id").as("keep_id"),
      posexplode(col("sigs")).as(Seq("t", "sig")))
    val b = sg.select(col("vec_id").as("dup_id"),
      posexplode(col("sigs")).as(Seq("t2", "sig2")))
    a.join(b,
        col("t") === col("t2") && col("sig") === col("sig2") &&
          col("keep_id") < col("dup_id"))
      .groupBy(col("keep_id"), col("dup_id")).agg(min(col("t")).as("mt"))
  }

  /** Incremental ingestion dedup for embeddings — the vector analogue
    * of TextDedup.incrementalDedup (band index + by-id fetch), built
    * on the SRP tables: every batch vector is labeled `corpus_dup`
    * (cosine >= minSim against an indexed corpus vector — dup_of is
    * the smallest such id), `batch_dup` (duplicates an EARLIER batch
    * vector, keep-first), or `new`. Corpus precedence over batch, like
    * the text operator.
    *
    * Scale contract: the corpus is touched only through its SRP
    * signature relation (at 100 TB a materialized index table — L ints
    * per vector) plus a by-id embedding fetch for COLLIDING ids; the
    * per-ingest cost tracks the batch and its collisions, never the
    * corpus. No dedup pass anywhere: min() is duplicate-insensitive,
    * so raw per-table collisions feed the verify join directly and the
    * per-vector aggregate collapses multiplicity for free. */
  def incrementalEmbeddingDedup(corpus: DataFrame, batch: DataFrame,
      batchIds: DataFrame, minSim: Double, bits: Int, tables: Int,
      dims: Int = 64): DataFrame = {
    VectorExpressions.register(batch.sparkSession)
    def sigRows(df: DataFrame, idName: String): DataFrame =
      srpSignatures(df, bits, tables, dims)
        .select(col("vec_id").as(idName),
          posexplode(col("sigs")).as(Seq(s"_t_$idName", s"_s_$idName")))
    val bs = sigRows(batch, "bvec")
    val be = batch.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    // batch vs corpus: collide on (t, sig), verify exact cosine, keep
    // the smallest corpus id per batch vector
    val cdup = bs
      .join(sigRows(corpus, "cvec"),
        col("_t_bvec") === col("_t_cvec") && col("_s_bvec") === col("_s_cvec"))
      .select(col("bvec"), col("cvec"))
      .join(be, col("bvec") === col("b_id"))
      .join(corpus.select(col("vec_id").as("c_id"),
        col("embedding").as("ec")), col("cvec") === col("c_id"))
      .filter(expr("cosine_sim(eb, ec)") >= minSim)
      .groupBy(col("bvec")).agg(min(col("cvec")).as("cdup"))
    // batch vs earlier batch: keep-first orientation d1 < d2
    val b2 = sigRows(batch, "d2")
      .withColumnRenamed("_t_d2", "t2").withColumnRenamed("_s_d2", "s2")
    val bdup = sigRows(batch, "d1")
      .join(b2, col("_t_d1") === col("t2") && col("_s_d1") === col("s2") &&
        col("d1") < col("d2"))
      .select(col("d1"), col("d2"))
      .join(be, col("d1") === col("b_id"))
      .join(batch.select(col("vec_id").as("b2_id"),
        col("embedding").as("eb2")), col("d2") === col("b2_id"))
      .filter(expr("cosine_sim(eb, eb2)") >= minSim)
      .groupBy(col("d2")).agg(min(col("d1")).as("bfirst"))
    batchIds
      .join(cdup, col("vec_id") === col("bvec"), "left")
      .join(bdup, col("vec_id") === col("d2"), "left")
      .select(col("vec_id"),
        when(col("cdup").isNotNull, "corpus_dup")
          .when(col("bfirst").isNotNull, "batch_dup")
          .otherwise("new").as("status"),
        coalesce(col("cdup"), col("bfirst"), lit(-1L)).as("dup_of"))
  }

  /** Scalar quantization codes (the int8 compression pass a vector
    * store runs after profiling): per-dimension min-max codes in
    * [0, levels). Floats are fixed-pointed by floor(v·2^20) first —
    * power-of-two scaling is IEEE-exact — so the whole code path is
    * integer arithmetic: deterministic, order-independent, and
    * engine-portable. Two linear passes: a 64-row per-dim stats
    * aggregate (broadcast back) and the code projection; no shuffle of
    * vector rows at all. Returns (vec_id, dim, code). */
  def scalarQuantizeCodes(df: DataFrame, levels: Int = 256,
      scale: Long = 1048576L): DataFrame = {
    def fx = df
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        floor(col("v").cast("double") * scale).cast("long").as("fx"))
    val stats = fx.groupBy(col("dim"))
      .agg(min(col("fx")).as("mn"), max(col("fx")).as("mx"))
    fx.join(broadcast(stats), Seq("dim"))
      .select(col("vec_id"), col("dim"),
        expr(s"CAST(((fx - mn) * ${levels - 1}) DIV greatest(mx - mn, 1) AS INT)")
          .as("code"))
  }

  /** Spark-SQL literal for a float vector that round-trips exactly:
    * Float.toString → CAST(string AS FLOAT) is bit-exact by the
    * Float.toString contract. */
  private def vecLiteral(emb: Array[Float]): String =
    emb.map(f => s"CAST('$f' AS FLOAT)").mkString("array(", ",", ")")

  /** Above this codebook size, assignment switches from the inline
    * codegen projection to the broadcast kernel: the projection form
    * inlines k array literals into generated code, and Janino method
    * size limits (plus compile time) degrade it past a few dozen
    * centroids (measured: k=80 ran 3× slower than the kernel). */
  val ProjectionCodebookMax = 16

  /** IVF cell assignment with data-derived centroids: the first
    * `numCentroids` vectors by id act as the coarse codebook (the
    * deterministic stand-in for a trained k-means codebook — swapping
    * in learned centroids changes nothing downstream), and every
    * vector goes to its max-cosine centroid (centroid-id tiebreak).
    *
    * Execution shape: the codebook is k rows (collected bounded — the
    * codebook of a real IVF always fits the driver), and assignment is
    * shuffle-free either way (asserted in PlanSpec): a small codebook
    * becomes ONE codegen'd projection (`greatest` over k (cosine,
    * -cid) structs — the argmax inline per row); a large one is a
    * broadcast-codebook mapPartitions kernel (tight double loop, O(1)
    * generated-code size). No join, no window, no Exchange between the
    * scan and the assignment. Cost is O(n·k) in both forms. Returns
    * (vec_id, embedding, cell). */
  def ivfAssign(df: DataFrame, numCentroids: Int = 8): DataFrame =
    assignWithCodebook(df, firstKCodebook(df, numCentroids))

  /** Deterministic init codebook: the first `k` vectors by id (also
    * the Lloyd's-iteration seed — k-means++ would sharpen convergence
    * but costs k extra passes and a random source; first-k is the
    * reproducible choice). */
  def firstKCodebook(df: DataFrame, k: Int): Array[(Long, Array[Float])] = {
    val sp = df.sparkSession
    import sp.implicits._
    df.filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .take(k + 1)
      .sortBy(_._1)
  }

  /** Cell assignment against an EXPLICIT codebook — the shared kernel
    * of the untrained (first-k) and k-means-trained IVF tiers. See
    * [[ivfAssign]] for the execution-shape contract (shuffle-free
    * either way). `cents` must be sorted by centroid id. */
  def assignWithCodebook(df: DataFrame,
      cents: Array[(Long, Array[Float])]): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    val sp = df.sparkSession
    import sp.implicits._
    require(cents.nonEmpty, "ivfAssign: empty codebook")
    if (cents.length <= ProjectionCodebookMax) {
      // struct(csim, -cid): greatest picks max cosine, then (via max
      // of the negated id) the SMALLEST centroid id on ties.
      val scored = cents.map { case (cid, emb) =>
        struct(
          expr(s"cosine_sim(embedding, ${vecLiteral(emb)})").as("csim"),
          lit(-cid).as("ncid"))
      }
      val best =
        if (scored.length == 1) scored.head
        else greatest(scored.toIndexedSeq: _*)
      df.select(col("vec_id"), col("embedding"),
        (lit(0L) - best.getField("ncid")).cast("long").as("cell"))
    } else {
      val bc = sp.sparkContext.broadcast(cents)
      df.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val cb = bc.value // sorted by cid: strict > keeps min cid on ties
          val norms = cb.map { case (_, v) =>
            var acc = 0.0; var i = 0
            while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
            math.sqrt(acc)
          }
          it.map { case (id, emb) =>
            var acc = 0.0; var i = 0
            while (i < emb.length) { acc += emb(i).toDouble * emb(i).toDouble; i += 1 }
            val na = math.sqrt(acc)
            var bestSim = Double.NegativeInfinity
            var bestCid = 0L
            var j = 0
            while (j < cb.length) {
              val (cid, cv) = cb(j)
              var dot = 0.0; var k = 0
              while (k < cv.length) { dot += emb(k).toDouble * cv(k).toDouble; k += 1 }
              val sim = dot / (na * norms(j))
              if (sim > bestSim) { bestSim = sim; bestCid = cid }
              j += 1
            }
            (id, emb, bestCid)
          }
        }.toDF("vec_id", "embedding", "cell")
    }
  }

  /** IVF cosine top-1: assign to centroid cells, then search only
    * within the vector's own cell — the single-probe IVF query. The
    * assignment is a pure projection (no shuffle — see `ivfAssign`), so
    * both sides of the in-cell candidate join just re-project the scan;
    * the join is an equi join on the cell id (one shuffle, never a
    * cross product); at scale nprobe>1 means unioning a few cell keys
    * per query vector, same plan shape. Returns (vec_id, cell,
    * neighbor_id, cosim); vectors alone in their cell are absent. */
  def ivfCosineTop1(df: DataFrame, numCentroids: Int = 8): DataFrame =
    inCellTop1(ivfAssign(df, numCentroids))

  /** IVF cosine top-1 over a TRAINED codebook: Lloyd's k-means
    * ([[trainKmeansCodebook]]) replaces the first-k stand-in; the
    * assignment and in-cell search shapes are identical. */
  def ivfCosineTop1Trained(df: DataFrame, numCentroids: Int = 8,
      iters: Int = 4): DataFrame =
    inCellTop1(assignWithCodebook(df,
      trainKmeansCodebook(df, numCentroids, iters)))

  /** Exact top-1 within each assigned cell (see [[ivfCosineTop1]] for
    * the contract): equi join on the cell id, one window on vec_id. */
  def inCellTop1(assigned: DataFrame): DataFrame = {
    val a = assigned.select(col("vec_id"), col("cell"), col("embedding").as("ea"))
    val b = assigned.select(col("vec_id").as("neighbor_id"),
      col("cell").as("cell2"), col("embedding").as("eb"))
    val pairs = a.join(b,
        col("cell") === col("cell2") && col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosim", expr("cosine_sim(ea, eb)"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosim").desc, col("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("neighbor_id"), col("cosim"))
  }

  /** Product-quantization codes — the memory-side compression of a
    * vector store (IVF narrows the search, PQ shrinks the residency:
    * 64 floats → `m` byte-sized codes, 64× here). The vector splits
    * into `m` contiguous subvectors; each is assigned to its nearest
    * per-subspace centroid by squared L2 distance. Codebook = the
    * subvectors of the first `codesPerSub` vectors by id (the
    * deterministic stand-in for a trained per-subspace k-means — a
    * learned codebook swaps in without touching the shape, exactly as
    * in `ivfAssign`).
    *
    * Determinism/oracle contract: components are fixed-pointed by
    * floor(v·2^20) (IEEE-exact power-of-two scale), so distances are
    * INTEGER sums — order-independent, engine-portable; ties take the
    * smallest code. Execution: the codebook is m·k tiny rows collected
    * bounded and broadcast; assignment is one mapPartitions kernel —
    * no join, no Exchange between the scan and the codes (same
    * shuffle-free contract as `ivfAssign`, asserted in PlanSpec). Cost
    * O(n·m·k·d/m) = O(n·k·d), one pass.
    *
    * Returns (vec_id, sub, code, d2) with d2 the integer distortion —
    * callers roll up per-vector code words or per-cell occupancy. */
  def pqAssign(df: DataFrame, m: Int = 4, codesPerSub: Int = 16,
      scale: Long = 1048576L): DataFrame =
    pqAssignWith(df, firstKPqCodebook(df, m, codesPerSub, scale), scale)

  /** First-k PQ init codebook in fixed-point space: code j of every
    * subspace is the j-th vector's subvector, LABELED by that vector's
    * id (the label the `emb_pq_codes` oracle uses; the same
    * deterministic stand-in/seed role as [[firstKCodebook]]). Layout:
    * [sub] → codes as (label, components(dim/m)), label-ascending. */
  def firstKPqCodebook(df: DataFrame, m: Int, codesPerSub: Int,
      scale: Long = 1048576L): Array[Array[(Long, Array[Long])]] = {
    val sp = df.sparkSession
    import sp.implicits._
    val firsts = df.filter(col("vec_id") < codesPerSub)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .take(codesPerSub + 1)
      .sortBy(_._1)
      .map { case (cid, emb) =>
        (cid, emb.map(v => math.floor(v.toDouble * scale).toLong))
      }
    require(firsts.nonEmpty, "pqAssign: empty codebook")
    val d = firsts.head._2.length
    require(d % m == 0, s"pqAssign: m=$m must divide dim=$d")
    val sd = d / m
    Array.tabulate(m)(sub =>
      firsts.map { case (cid, fx) =>
        (cid, fx.slice(sub * sd, (sub + 1) * sd))
      })
  }

  /** PQ assignment against an EXPLICIT per-subspace fixed-point
    * codebook `cb[sub] = [(label, components)]` (label-ascending) —
    * shared by the first-k and trained tiers; see [[pqAssign]] for
    * the execution contract. */
  def pqAssignWith(df: DataFrame, cb: Array[Array[(Long, Array[Long])]],
      scale: Long = 1048576L): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val m = cb.length
    val bc = sp.sparkContext.broadcast(cb)
    df.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        val codebook = bc.value
        val d = emb.length
        require(d % m == 0, s"pqAssign: m=$m must divide dim=$d")
        val sd = d / m
        val fx = emb.map(v => math.floor(v.toDouble * scale).toLong)
        (0 until m).map { sub =>
          val subCb = codebook(sub)
          val off = sub * sd
          var bestD2 = Long.MaxValue
          var bestCode = 0L
          var j = 0
          while (j < subCb.length) {
            val (label, cfx) = subCb(j)
            var d2 = 0L; var i = 0
            while (i < sd) {
              val diff = fx(off + i) - cfx(i)
              d2 += diff * diff; i += 1
            }
            // strict < keeps the smallest label on ties (ordered)
            if (d2 < bestD2) { bestD2 = d2; bestCode = label }
            j += 1
          }
          (id, sub.toLong, bestCode, bestD2)
        }
      }.toDF("vec_id", "sub", "code", "d2")
  }

  /** [[pqAssignWith]] carrying each vector's IVF cell through to its
    * code rows — the materialized IVF-PQ index layout (FAISS-style
    * inverted lists: codes clustered by coarse cell, 4-byte words in
    * place of embeddings; Jégou et al. 2011 §IV). Input needs
    * (vec_id, cell, embedding) — i.e. [[assignWithCodebook]] output;
    * output rows (vec_id, cell, sub, code) keep each vector's m rows
    * adjacent in one partition with one constant cell — the adjacency
    * contract [[ivfPqSearch]]'s run-fold kernel enforces. Same
    * fixed-point integer assignment as [[pqAssignWith]] (min code on
    * ties), so codes are bit-identical on any partitioning/engine. */
  def pqAssignWithCell(df: DataFrame,
      cb: Array[Array[(Long, Array[Long])]],
      scale: Long = 1048576L): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val m = cb.length
    val bc = sp.sparkContext.broadcast(cb)
    df.select(col("vec_id"), col("cell"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .flatMap { case (id, cell, emb) =>
        val codebook = bc.value
        val d = emb.length
        require(d % m == 0, s"pqAssignWithCell: m=$m must divide dim=$d")
        val sd = d / m
        val fx = emb.map(v => math.floor(v.toDouble * scale).toLong)
        (0 until m).map { sub =>
          val subCb = codebook(sub)
          val off = sub * sd
          var bestD2 = Long.MaxValue
          var bestCode = 0L
          var j = 0
          while (j < subCb.length) {
            val (label, cfx) = subCb(j)
            var d2 = 0L; var i = 0
            while (i < sd) {
              val diff = fx(off + i) - cfx(i)
              d2 += diff * diff; i += 1
            }
            // strict < keeps the smallest label on ties (ordered)
            if (d2 < bestD2) { bestD2 = d2; bestCode = label }
            j += 1
          }
          (id, cell, sub.toLong, bestCode)
        }
      }.toDF("vec_id", "cell", "sub", "code")
  }

  /** Distributed per-subspace k-means for the PQ codebook — the
    * trained upgrade of the first-k stand-in, same Lloyd's discipline
    * as [[trainKmeansCodebook]] but ENTIRELY in integer arithmetic:
    * assignment by fixed-point squared-L2 (min code on ties), update
    * by floorDiv integer means — every round is exactly reproducible
    * on any partitioning and any engine, no float accumulation
    * anywhere. One shuffle-free job per round; partials are
    * (sub, code) keyed — ≤ m·k rows per partition to the driver.
    * Empty codes keep their previous centroid. */
  def trainPqCodebook(df: DataFrame, m: Int = 4, codesPerSub: Int = 16,
      iters: Int = 4,
      scale: Long = 1048576L): Array[Array[(Long, Array[Long])]] = {
    val sp = df.sparkSession
    import sp.implicits._
    var cb = firstKPqCodebook(df, m, codesPerSub, scale)
    val vecs = df.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    var round = 0
    while (round < iters) {
      val bc = sp.sparkContext.broadcast(cb)
      val partials = vecs.mapPartitions { it =>
        val codebook = bc.value
        val mm = codebook.length
        val acc = scala.collection.mutable.HashMap
          .empty[(Int, Int), (Array[Long], Long)]
        it.foreach { case (_, emb) =>
          val d = emb.length
          val sd = d / mm
          val fx = emb.map(v => math.floor(v.toDouble * scale).toLong)
          var sub = 0
          while (sub < mm) {
            val subCb = codebook(sub)
            val off = sub * sd
            var bestD2 = Long.MaxValue
            var bestIdx = 0
            var j = 0
            while (j < subCb.length) {
              val cfx = subCb(j)._2
              var d2 = 0L; var i = 0
              while (i < sd) {
                val diff = fx(off + i) - cfx(i); d2 += diff * diff; i += 1
              }
              if (d2 < bestD2) { bestD2 = d2; bestIdx = j }
              j += 1
            }
            val slot = acc.getOrElseUpdate((sub, bestIdx),
              (new Array[Long](sd), 0L))
            var q = 0
            while (q < sd) { slot._1(q) += fx(off + q); q += 1 }
            acc((sub, bestIdx)) = (slot._1, slot._2 + 1)
            sub += 1
          }
        }
        acc.iterator.map { case ((sub, idx), (s, n)) => (sub, idx, s, n) }
      }.collect() // bounded: ≤ m·k rows per partition
      val merged = scala.collection.mutable.HashMap
        .empty[(Int, Int), (Array[Long], Long)]
      partials.foreach { case (sub, idx, s, n) =>
        merged.get((sub, idx)) match {
          case Some((ms, mn)) =>
            var i = 0; while (i < ms.length) { ms(i) += s(i); i += 1 }
            merged((sub, idx)) = (ms, mn + n)
          case None => merged((sub, idx)) = (s.clone(), n)
        }
      }
      cb = Array.tabulate(cb.length)(sub =>
        Array.tabulate(cb(sub).length) { idx =>
          val (label, old) = cb(sub)(idx)
          merged.get((sub, idx)) match {
            case Some((s, n)) => (label, s.map(v => Math.floorDiv(v, n)))
            case None => (label, old) // empty code: centroid unchanged
          }
        })
      round += 1
    }
    cb
  }

  /** Driver-side reference PQ k-means (same integer arithmetic as
    * [[trainPqCodebook]], plain loops) — specs and replay oracles. */
  def trainPqCodebookRef(vecs: Seq[(Long, Array[Float])], m: Int = 4,
      codesPerSub: Int = 16, iters: Int = 4,
      scale: Long = 1048576L): Array[Array[(Long, Array[Long])]] = {
    val firsts = vecs.filter(_._1 < codesPerSub).sortBy(_._1)
      .map { case (cid, e) =>
        (cid, e.map(v => math.floor(v.toDouble * scale).toLong))
      }
    require(firsts.nonEmpty, "trainPqCodebookRef: empty codebook")
    val d = firsts.head._2.length
    val sd = d / m
    var cb: Array[Array[(Long, Array[Long])]] =
      Array.tabulate(m)(sub => firsts.toArray.map { case (cid, fx) =>
        (cid, fx.slice(sub * sd, (sub + 1) * sd))
      })
    for (_ <- 1 to iters) {
      val sums = scala.collection.mutable.HashMap
        .empty[(Int, Int), (Array[Long], Long)]
      vecs.foreach { case (_, emb) =>
        val fx = emb.map(v => math.floor(v.toDouble * scale).toLong)
        for (sub <- 0 until m) {
          val (idx, _) = pqNearestRef(fx, cb(sub), sub * sd, sd)
          val slot = sums.getOrElseUpdate((sub, idx),
            (new Array[Long](sd), 0L))
          var i = 0
          while (i < sd) { slot._1(i) += fx(sub * sd + i); i += 1 }
          sums((sub, idx)) = (slot._1, slot._2 + 1)
        }
      }
      cb = Array.tabulate(m)(sub => Array.tabulate(cb(sub).length) { idx =>
        val (label, old) = cb(sub)(idx)
        sums.get((sub, idx)) match {
          case Some((s, n)) => (label, s.map(v => Math.floorDiv(v, n)))
          case None => (label, old)
        }
      })
    }
    cb
  }

  /** Reference nearest PQ code for one subvector: (index, d2) into the
    * label-ascending sub-codebook (strict < keeps the smallest). */
  def pqNearestRef(fx: Array[Long], subCb: Array[(Long, Array[Long])],
      off: Int, sd: Int): (Int, Long) = {
    var bestD2 = Long.MaxValue
    var bestIdx = 0
    var j = 0
    while (j < subCb.length) {
      val cfx = subCb(j)._2
      var d2 = 0L; var i = 0
      while (i < sd) { val diff = fx(off + i) - cfx(i); d2 += diff * diff; i += 1 }
      if (d2 < bestD2) { bestD2 = d2; bestIdx = j }
      j += 1
    }
    (bestIdx, bestD2)
  }

  /** Multi-probe cell assignment: every vector gets its `nprobe`
    * NEAREST centroids as (vec_id, embedding, cell, prank) rows,
    * prank 1 = home cell (identical to [[assignWithCodebook]]'s
    * choice). Shuffle-free: one broadcast-codebook flatMap kernel —
    * row count grows by nprobe, never the corpus. Ties break toward
    * the smaller centroid id, same as everywhere else. */
  def multiProbeAssign(df: DataFrame, cents: Array[(Long, Array[Float])],
      nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val sp = df.sparkSession
    import sp.implicits._
    val bc = sp.sparkContext.broadcast(cents)
    df.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      // mapPartitions so the centroid-norm array is computed once per
      // partition, not once per row (same hoist as trainKmeansCodebook
      // and assignWithCodebook — O(k·d) per row saved)
      .mapPartitions { rows =>
        val cb = bc.value
        val norms = cb.map { case (_, v) =>
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
          math.sqrt(acc)
        }
        rows.flatMap { case (id, emb) =>
          var na = 0.0
          var i = 0
          while (i < emb.length) { na += emb(i).toDouble * emb(i).toDouble; i += 1 }
          na = math.sqrt(na)
          // (sim, cid) for every centroid, then take the top nprobe by
          // (sim desc, cid asc) — k is codebook-sized, a simple sort
          val scored = new Array[(Double, Long)](cb.length)
          var j = 0
          while (j < cb.length) {
            val (cid, cv) = cb(j)
            var dot = 0.0; var p = 0
            while (p < cv.length) { dot += emb(p).toDouble * cv(p).toDouble; p += 1 }
            scored(j) = (dot / (na * norms(j)), cid)
            j += 1
          }
          scored.sortBy { case (sim, cid) => (-sim, cid) }
            .take(math.min(nprobe, scored.length))
            .zipWithIndex
            .map { case ((_, cid), rank) => (id, emb, cid, rank + 1) }
        }
      }.toDF("vec_id", "embedding", "cell", "prank")
  }

  /** Multi-probe IVF cosine top-k: every vector probes its `nprobe`
    * nearest cells and ranks the exact cosine against the vectors
    * whose HOME cell (prank 1 — each vector lives in exactly one
    * cell, so no candidate dedup is ever needed) is among them;
    * keep the best `k` (cosine desc, neighbor-id tiebreak). This is
    * the production recall knob the single-probe operators lack:
    * nprobe scales candidates linearly (n·nprobe/cells) while the
    * plan shape stays the single-probe one — a broadcast-codebook
    * probe projection, ONE equi join on the cell id, one window.
    * Returns (vec_id, neighbor_id, rank, cosim); vectors with no
    * candidate in any probed cell are absent. */
  def ivfCosineTopK(df: DataFrame, k: Int = 3, numCentroids: Int = 8,
      nprobe: Int = 2): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    val cents = firstKCodebook(df, numCentroids)
    val probed = multiProbeAssign(df, cents, nprobe)
    val a = probed.select(col("vec_id"), col("cell"), col("embedding").as("ea"))
    val home = probed.filter(col("prank") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cell").as("cell2"),
        col("embedding").as("eb"))
    val pairs = a.join(home,
        col("cell") === col("cell2") && col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosim", expr("cosine_sim(ea, eb)"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosim").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cosim"))
  }

  /** Query-time IVF search — the incremental/serving mode, where a
    * BATCH of query vectors searches an already-indexed corpus
    * without the corpus ever re-shuffling (the ANN analogue of
    * `TextDedup.incrementalDedup`): the corpus participates only
    * through its cell assignment (the thing a production pipeline
    * keeps materialized between ingests), the batch probes its
    * `nprobe` nearest cells via the broadcast-codebook kernel, and
    * the candidate join is the one equi join on the cell id — cost
    * tracks the batch size and cell density, never the corpus.
    * Returns (vec_id, neighbor_id, rank, cosim) for batch vectors;
    * batch vectors probing only empty cells are absent. */
  def ivfSearch(batch: DataFrame, corpusAssigned: DataFrame,
      cents: Array[(Long, Array[Float])], k: Int = 1,
      nprobe: Int = 2): DataFrame = {
    VectorExpressions.register(batch.sparkSession)
    val probes = multiProbeAssign(batch, cents, nprobe)
      .select(col("vec_id"), col("cell"), col("embedding").as("ea"))
    val members = corpusAssigned.select(col("vec_id").as("neighbor_id"),
      col("cell").as("cell2"), col("embedding").as("eb"))
    val pairs = probes.join(members,
        col("cell") === col("cell2") && col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosim", expr("cosine_sim(ea, eb)"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosim").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cosim"))
  }

  /** Distributed k-means (Lloyd's) codebook training for the IVF/PQ
    * tiers: deterministic first-k init, a FIXED number of rounds (no
    * data-dependent stopping — job count is known up front), empty
    * cells keep their previous centroid.
    *
    * Execution shape per round: ONE job — the broadcast-codebook
    * assignment kernel fused with per-partition partial aggregation
    * (each partition emits ≤ k rows of (cell, component sums, count)),
    * partials merged on the driver. Nothing corpus-sized moves: no
    * shuffle at all, and the driver sees O(k · partitions) tiny rows
    * per round — the same bounded-collect discipline as `Bpe
    * .trainMerges`' 1-row argmax.
    *
    * Determinism contract (why centroids are bit-identical regardless
    * of partitioning or engine): components are fixed-pointed by
    * floor(v·2^20) (IEEE-exact power-of-two scale) BEFORE summation,
    * so per-cell sums are INTEGER adds — order-independent; the new
    * centroid is floorDiv(sum, count) / 2^20, exactly representable
    * as a float for |v| ≲ 16. Assignment cosines are ascending-index
    * double multiply-adds, same as every other kernel here. */
  def trainKmeansCodebook(df: DataFrame, k: Int, iters: Int = 4,
      scale: Long = 1048576L): Array[(Long, Array[Float])] = {
    val sp = df.sparkSession
    import sp.implicits._
    var cb = firstKCodebook(df, k)
    require(cb.nonEmpty, "trainKmeans: empty init codebook")
    val vecs = df.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    var round = 0
    while (round < iters) {
      val bc = sp.sparkContext.broadcast(cb)
      val partials = vecs.mapPartitions { it =>
        val codebook = bc.value
        val norms = codebook.map { case (_, v) =>
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
          math.sqrt(acc)
        }
        val acc = scala.collection.mutable.HashMap
          .empty[Long, (Array[Long], Long)]
        it.foreach { case (_, emb) =>
          var na = 0.0; var i = 0
          while (i < emb.length) { na += emb(i).toDouble * emb(i).toDouble; i += 1 }
          na = math.sqrt(na)
          var bestSim = Double.NegativeInfinity
          var bestCid = 0L
          var j = 0
          while (j < codebook.length) {
            val (cid, cv) = codebook(j)
            var dot = 0.0; var p = 0
            while (p < cv.length) { dot += emb(p).toDouble * cv(p).toDouble; p += 1 }
            val sim = dot / (na * norms(j))
            if (sim > bestSim) { bestSim = sim; bestCid = cid } // sorted: min cid on ties
            j += 1
          }
          val slot = acc.getOrElseUpdate(bestCid,
            (new Array[Long](emb.length), 0L))
          var q = 0
          while (q < emb.length) {
            slot._1(q) += math.floor(emb(q).toDouble * scale).toLong; q += 1
          }
          acc(bestCid) = (slot._1, slot._2 + 1)
        }
        acc.iterator.map { case (cell, (s, n)) => (cell, s, n) }
      }.collect() // bounded: ≤ k rows per partition
      val merged = scala.collection.mutable.HashMap.empty[Long, (Array[Long], Long)]
      partials.foreach { case (cell, s, n) =>
        merged.get(cell) match {
          case Some((ms, mn)) =>
            var i = 0; while (i < ms.length) { ms(i) += s(i); i += 1 }
            merged(cell) = (ms, mn + n)
          case None => merged(cell) = (s.clone(), n)
        }
      }
      cb = cb.map { case (cid, old) =>
        merged.get(cid) match {
          case Some((sums, n)) =>
            (cid, sums.map(s2 => (Math.floorDiv(s2, n).toDouble / scale).toFloat))
          case None => (cid, old) // empty cell: centroid unchanged
        }
      }
      round += 1
    }
    cb
  }

  /** Driver-side reference k-means for specs and replay oracles: the
    * same arithmetic spec as [[trainKmeansCodebook]] (fixed-point
    * integer sums, floorDiv means, ascending-index double cosines,
    * min-cid ties) implemented as independent plain-Scala loops —
    * bit-identical output by construction. ORACLE/SPEC ONLY. */
  def trainKmeansRef(vecs: Seq[(Long, Array[Float])], k: Int,
      iters: Int = 4, scale: Long = 1048576L): Array[(Long, Array[Float])] = {
    var cb = vecs.filter(_._1 < k).sortBy(_._1).toArray
    require(cb.nonEmpty, "trainKmeansRef: empty init codebook")
    for (_ <- 1 to iters) {
      val sums = scala.collection.mutable.HashMap.empty[Long, (Array[Long], Long)]
      vecs.foreach { case (_, emb) =>
        val cell = assignRef(emb, cb)
        val slot = sums.getOrElseUpdate(cell, (new Array[Long](emb.length), 0L))
        var i = 0
        while (i < emb.length) {
          slot._1(i) += math.floor(emb(i).toDouble * scale).toLong; i += 1
        }
        sums(cell) = (slot._1, slot._2 + 1)
      }
      cb = cb.map { case (cid, old) =>
        sums.get(cid) match {
          case Some((s, n)) =>
            (cid, s.map(v => (Math.floorDiv(v, n).toDouble / scale).toFloat))
          case None => (cid, old)
        }
      }
    }
    cb
  }

  /** Reference max-cosine assignment (min cid on ties); `cb` sorted. */
  def assignRef(emb: Array[Float], cb: Array[(Long, Array[Float])]): Long = {
    var na = 0.0; var i = 0
    while (i < emb.length) { na += emb(i).toDouble * emb(i).toDouble; i += 1 }
    na = math.sqrt(na)
    var bestSim = Double.NegativeInfinity
    var bestCid = 0L
    var j = 0
    while (j < cb.length) {
      val (cid, cv) = cb(j)
      var nc = 0.0; var dot = 0.0; var p = 0
      while (p < cv.length) {
        nc += cv(p).toDouble * cv(p).toDouble
        dot += emb(p).toDouble * cv(p).toDouble
        p += 1
      }
      val sim = dot / (na * math.sqrt(nc))
      if (sim > bestSim) { bestSim = sim; bestCid = cid }
      j += 1
    }
    bestCid
  }

  /** PQ asymmetric-distance (ADC) top-1 — the serving path that makes
    * PQ compression pay at query time: each query precomputes a
    * lookup table LUT[sub][code] = ||q_sub − c_{sub,code}||² (m·k
    * integers — tiny), and every corpus vector is scored from its
    * CODE WORD alone as Σ_sub LUT[sub][code] — m table lookups per
    * (query, vector) instead of d multiplies, and the corpus side
    * reads 4-byte words, never embeddings (Jégou et al. 2011,
    * "Product Quantization for Nearest Neighbor Search").
    *
    * Execution shape: the query batch is collected BOUNDED
    * (maxCandidates-style require — the batch is the small side by
    * definition) and its LUTs broadcast; the corpus code relation
    * streams through one mapPartitions kernel that reassembles each
    * vector's m contiguous code rows (pqAssignWith emits them
    * adjacent, same run-fold trick as TextDedup.shingles) and keeps a
    * per-query running best — per-partition output is ≤ |batch| rows,
    * folded by one tiny min_by aggregate. All arithmetic is
    * fixed-point INTEGER (same contract as pqAssign): scores and
    * ties (smallest neighbor id) are bit-identical on any
    * partitioning and any engine.
    *
    * Returns (vec_id, neighbor_id, d2_adc) — one row per query that
    * found any neighbor. */
  def pqAdcTop1(queries: DataFrame, codes: DataFrame,
      cb: Array[Array[(Long, Array[Long])]], scale: Long = 1048576L,
      maxBatch: Int = DefaultMaxCandidates): DataFrame = {
    val qs = collectQueryBatch(queries, maxBatch, "pqAdcTop1")
    val (luts, labelIdx) = buildAdcLuts(qs, cb, scale, "pqAdcTop1")
    adcTop1Kernel(
      codes.select(col("vec_id"), lit(0L).as("cell"), col("sub"),
        col("code")),
      luts, labelIdx, None, cb.length)
  }

  /** Bounded-collect of a query batch (the small side by definition):
    * same `require` discipline as [[collectBounded]], sorted by id so
    * downstream LUT/probe arrays align deterministically. */
  private def collectQueryBatch(queries: DataFrame, maxBatch: Int,
      who: String): Array[(Long, Array[Float])] = {
    val sp = queries.sparkSession
    import sp.implicits._
    val q = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .take(maxBatch + 1)
    require(q.length <= maxBatch,
      s"query batch exceeds maxBatch=$maxBatch — ADC batches the small " +
        "side; stream larger batches through repeated calls")
    require(q.nonEmpty, s"$who: empty query batch")
    q.sortBy(_._1)
  }

  /** Per-query integer LUTs (LUT[sub][codeIdx] = fixed-point ‖q_sub −
    * c_{sub,code}‖²) plus the label→dense-index maps — the broadcast
    * payload of every ADC path. */
  private def buildAdcLuts(qs: Array[(Long, Array[Float])],
      cb: Array[Array[(Long, Array[Long])]], scale: Long, who: String)
      : (Array[(Long, Array[Array[Long]])], Array[Map[Long, Int]]) = {
    val m = cb.length
    val d = qs.head._2.length
    require(d % m == 0, s"$who: m=$m must divide dim=$d")
    val sd = d / m
    // label → dense index per subspace (labels are codebook row ids)
    val labelIdx: Array[Map[Long, Int]] =
      cb.map(_.iterator.zipWithIndex.map { case ((l, _), i) => l -> i }.toMap)
    // LUT[query][sub][codeIdx] = integer squared distance
    val luts: Array[(Long, Array[Array[Long]])] = qs.map { case (qid, emb) =>
      val fx = emb.map(v => math.floor(v.toDouble * scale).toLong)
      (qid, Array.tabulate(m) { sub =>
        cb(sub).map { case (_, cfx) =>
          var d2 = 0L; var i = 0
          while (i < sd) {
            val diff = fx(sub * sd + i) - cfx(i); d2 += diff * diff; i += 1
          }
          d2
        }
      })
    }
    (luts, labelIdx)
  }

  /** The shared ADC run-fold kernel: streams a (vec_id, cell, sub,
    * code) relation, reassembles each vector's m contiguous code rows,
    * and keeps a per-query running best of Σ_sub LUT[sub][code]. When
    * `probe` is given (aligned with `luts`, each array SORTED), a
    * vector is scored for a query only if the vector's cell is in that
    * query's probe set — the IVF gate of the IVF-PQ composite; `None`
    * scores every vector for every query (plain ADC). Per-partition
    * output is ≤ |batch| rows, folded by one tiny min aggregate. */
  private def adcTop1Kernel(codes: DataFrame,
      luts: Array[(Long, Array[Array[Long]])],
      labelIdx: Array[Map[Long, Int]],
      probe: Option[Array[Array[Long]]], m: Int): DataFrame = {
    val sp = codes.sparkSession
    import sp.implicits._
    require(probe.forall(_.length == luts.length),
      "adcTop1Kernel: probe sets must align 1:1 with the query LUTs")
    val bcLut = sp.sparkContext.broadcast(luts)
    val bcIdx = sp.sparkContext.broadcast(labelIdx)
    val bcProbe = sp.sparkContext.broadcast(probe)
    val partBests = codes
      .select(col("vec_id"), col("cell"), col("sub"), col("code"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        val lut = bcLut.value
        val idx = bcIdx.value
        val prb: Array[Array[Long]] = bcProbe.value.orNull
        val nq = lut.length
        val best = Array.fill(nq)(Long.MaxValue)
        val bestId = Array.fill(nq)(Long.MaxValue)
        val word = new Array[Int](m)
        val seen = new Array[Boolean](m)
        var got = 0
        var cur = Long.MinValue
        var curCell = Long.MinValue
        // The kernel's correctness rests on an input invariant: each
        // vector's m code rows arrive ADJACENT within one partition,
        // each sub exactly once, all carrying the vector's ONE cell
        // (pqAssignWith/pqAssignWithCell emit them that way, and a
        // cell filter drops whole runs without splitting them). A
        // repartitioned/re-read/duplicated code relation would
        // otherwise be scored from stale `word` slots or silently
        // skipped — enforce, don't assume.
        def scoreWord(vid: Long, cell: Long): Unit = {
          if (got != m) throw new IllegalStateException(
            s"adcTop1Kernel: vector $vid ended its run with $got of $m " +
              "code rows — the code relation must keep each vector's m " +
              "rows adjacent in one partition with every sub present " +
              "exactly once (was it repartitioned or partially written?)")
          var qi = 0
          while (qi < nq) {
            val (qid, ql) = lut(qi)
            if (qid != vid && (prb == null ||
                java.util.Arrays.binarySearch(prb(qi), cell) >= 0)) {
              var s = 0L; var sub = 0
              while (sub < m) { s += ql(sub)(word(sub)); sub += 1 }
              if (s < best(qi) || (s == best(qi) && vid < bestId(qi))) {
                best(qi) = s; bestId(qi) = vid
              }
            }
            qi += 1
          }
        }
        var started = false
        it.foreach { case (vid, cell, sub, code) =>
          if (!started || vid != cur) {
            if (started) scoreWord(cur, curCell)
            started = true; cur = vid; curCell = cell; got = 0
            java.util.Arrays.fill(seen, false)
          }
          if (cell != curCell) throw new IllegalStateException(
            s"adcTop1Kernel: vector $vid carries two cells ($curCell, " +
              s"$cell) within one run — the index relation is corrupt")
          val si = sub.toInt
          if (seen(si)) throw new IllegalStateException(
            s"adcTop1Kernel: duplicate code row (vec_id=$vid, sub=$si) " +
              "in one run — each (vec_id, sub) must appear exactly once")
          seen(si) = true
          word(si) = idx(si)(code)
          got += 1
        }
        if (started) scoreWord(cur, curCell)
        (0 until nq).iterator
          .filter(qi => bestId(qi) != Long.MaxValue)
          .map(qi => (lut(qi)._1, bestId(qi), best(qi)))
      }.toDF("vec_id", "neighbor_id", "d2_adc")
    // fold per-partition bests: min (score, id) per query
    partBests
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2_adc"), col("neighbor_id"))).as("b"))
      .select(col("vec_id"), col("b.neighbor_id").as("neighbor_id"),
        col("b.d2_adc").as("d2_adc"))
  }

  /** IVF-PQ composite search — the billion-vector serving index
    * (Jégou et al. 2011 §IV; the FAISS IndexIVFPQ architecture,
    * no-residual mode): the IVF tier narrows WHERE to look (each query
    * probes its `nprobe` nearest coarse cells through the SAME
    * distributed kernel as every other IVF path, so probe choices are
    * bit-identical), and the PQ tier shrinks WHAT is read (candidates
    * are scored from their 4-byte code words via the per-query integer
    * LUT — corpus embeddings are never touched at query time).
    *
    * `codes` is the materialized index relation (vec_id, cell, sub,
    * code) from [[pqAssignWithCell]] — clustered by cell like FAISS
    * inverted lists, so at scale the probed-cell restriction is
    * partition pruning on the storage layout; here it is one
    * `isInCollection` filter on the ≤|cells| probed-cell set, which
    * preserves the kernel's run adjacency (a filter on the
    * run-constant cell drops whole runs, never splits them).
    *
    * Per-query cost tracks batch size × probed-cell density; the
    * corpus participates only through its pruned code relation. All
    * arithmetic is fixed-point integer. Returns (vec_id, neighbor_id,
    * d2_adc) — top-1 by (quantized L2 asc, neighbor id asc); queries
    * probing only empty cells are absent. */
  def ivfPqSearch(batch: DataFrame, codes: DataFrame,
      cb: Array[Array[(Long, Array[Long])]],
      cents: Array[(Long, Array[Float])], nprobe: Int = 2,
      scale: Long = 1048576L,
      maxBatch: Int = DefaultMaxCandidates): DataFrame = {
    val sp = batch.sparkSession
    import sp.implicits._
    val qs = collectQueryBatch(batch, maxBatch, "ivfPqSearch")
    val (luts, labelIdx) = buildAdcLuts(qs, cb, scale, "ivfPqSearch")
    // probe assignment through the shared multi-probe kernel; the
    // collect is bounded by |batch| × nprobe (batch already bounded)
    val probeRows = multiProbeAssign(batch, cents, nprobe)
      .select(col("vec_id"), col("cell"))
      .as[(Long, Long)].collect()
    val byQuery: Map[Long, Array[Long]] = probeRows.groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).sorted }
    val probeSets: Array[Array[Long]] =
      qs.map { case (qid, _) => byQuery.getOrElse(qid, Array.empty[Long]) }
    val probedCells = probeRows.map(_._2).distinct.sorted.toSeq
    adcTop1Kernel(codes.filter(col("cell").isInCollection(probedCells)),
      luts, labelIdx, Some(probeSets), cb.length)
  }

  /** Bucketed (IVF-style) cosine top-1: search only within the
    * vector's own bucket — the candidate space shrinks by the bucket
    * fan-out, and the join is an equi join on the bucket key (one
    * shuffle, never a cross product). Cosine runs through the
    * codegen'd CosineSimilarity expression. Returns (vec_id, bucket,
    * neighbor_id, cosim); vectors alone in their bucket are absent. */
  def bucketedCosineTop1(df: DataFrame, dims: Int = 6): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    val e = df.withColumn("bucket", signBucket("embedding", dims))
    val a = e.select(col("vec_id"), col("bucket"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("neighbor_id"),
      col("bucket").as("bucket2"), col("embedding").as("eb"))
    val pairs = a.join(b,
        col("bucket") === col("bucket2") && col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosim", expr("cosine_sim(ea, eb)"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosim").desc, col("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("bucket"), col("neighbor_id"), col("cosim"))
  }
}
