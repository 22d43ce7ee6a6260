package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity-search operators over an embedding column
  * (`Array[Float]`) — the two-tier ANN design: a sign-pattern coarse
  * quantizer (IVF-style bucketing) generates candidates at scale, and
  * the brute-force kernel is the exactness baseline / re-ranker.
  *
  * Determinism contract: all cosine arithmetic is double with
  * ascending-index multiply-add then sqrt-normalize — the same
  * evaluation order in the broadcast kernel, the codegen'd
  * `CosineSimilarity` expression, and the DuckDB oracles, so
  * similarities are bit-identical everywhere (ties broken by id).
  */
object VectorSearch {

  /** Brute-force cosine top-1 neighbor per vector: (vec_id,
    * neighbor_id, cosim), exact. The candidate set is broadcast and
    * each partition streams its vectors against it in a tight loop —
    * a relational n² self-join would materialize and shuffle every
    * pair (measured ~10× slower); the loop streams them. At scale this
    * is the re-rank kernel over candidates, never the full corpus. */
  def bruteForceCosineTop1(df: DataFrame): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val vecs = df.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val bc = sp.sparkContext.broadcast(vecs.collect().sortBy(_._1))
    vecs.mapPartitions { it =>
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

  /** Embedding near-duplicate pairs: all ordered pairs (keep_id <
    * dup_id) with cosine >= minSim — the embedding-space analogue of
    * jaccard near-dup detection. Same broadcast streaming kernel as
    * the top-1 search; at scale candidates come from `signBucket`
    * bucketing (or a learned IVF) and this kernel verifies them. */
  def cosineThresholdPairs(df: DataFrame, minSim: Double): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val vecs = df.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val bc = sp.sparkContext.broadcast(vecs.collect().sortBy(_._1))
    vecs.mapPartitions { it =>
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

  /** Sign-pattern coarse quantizer: the bucket id is the sign bit of
    * the first `dims` dimensions — 2^dims buckets, no training pass
    * needed, deterministic. (A learned-centroid IVF would replace this
    * column; everything downstream is unchanged.) */
  def signBucket(embCol: String, dims: Int = 6): Column =
    expr(s"""concat_ws('', transform(slice($embCol, 1, $dims),
         x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END))""")

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

  /** IVF cell assignment with data-derived centroids: the first
    * `numCentroids` vectors by id act as the coarse codebook (the
    * deterministic stand-in for a trained k-means codebook — swapping
    * in learned centroids changes nothing downstream), and every
    * vector goes to its max-cosine centroid (centroid-id tiebreak).
    *
    * Execution shape is the real IVF one: the codebook is broadcast,
    * assignment is a broadcast nested-loop scan (numCentroids ≪ n, so
    * cost is O(n·k) inside codegen via CosineSimilarity), and the
    * argmax is one window over the (tiny) per-vector candidate set.
    * Returns (vec_id, embedding, cell). */
  def ivfAssign(df: DataFrame, numCentroids: Int = 8): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    val cents = df.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    df.select(col("vec_id"), col("embedding"))
      .join(broadcast(cents))
      .withColumn("csim", expr("cosine_sim(embedding, cemb)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
  }

  /** IVF cosine top-1: assign to centroid cells, then search only
    * within the vector's own cell — the single-probe IVF query. The
    * candidate join is an equi join on the cell id (one shuffle, never
    * a cross product); at scale nprobe>1 means unioning a few cell
    * keys per query vector, same plan shape. Returns (vec_id, cell,
    * neighbor_id, cosim); vectors alone in their cell are absent. */
  def ivfCosineTop1(df: DataFrame, numCentroids: Int = 8): DataFrame = {
    val assigned = ivfAssign(df, numCentroids)
      // both sides of the in-cell self-join need the SAME assignment
      // rows — persist so the broadcast argmax runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
