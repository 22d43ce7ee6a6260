package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class VectorSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    graft.core.Tables.embeddings(spark, TestSpark.sfDir)

  test("ivfAssign sends every vector to its max-cosine centroid") {
    VectorExpressions.register(spark)
    val assigned = VectorSearch.ivfAssign(emb, numCentroids = 4)
    assert(assigned.count() === emb.count())
    // recompute the argmax relationally and compare
    val cents = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val best = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", expr("cosine_sim(embedding, cemb)"))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("csim"), -col("cid"))).as("cell"))
    val mismatches = assigned.select(col("vec_id"), col("cell").as("got"))
      .join(best, "vec_id")
      .filter(col("got") =!= col("cell")).count()
    assert(mismatches === 0)
  }

  test("ivfCosineTop1 finds the exact in-cell nearest neighbor") {
    val top = VectorSearch.ivfCosineTop1(emb, numCentroids = 4)
    // soundness: neighbor is in the same cell and is the in-cell argmax
    val assigned = VectorSearch.ivfAssign(emb, numCentroids = 4)
      .select(col("vec_id"), col("cell"), col("embedding"))
    val a = assigned.toDF("vec_id", "cell", "ea")
    val b = assigned.toDF("nid", "cell2", "eb")
    val exact = a.join(b,
        col("cell") === col("cell2") && col("vec_id") =!= col("nid"))
      .withColumn("cs", expr("cosine_sim(ea, eb)"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("nid"), struct(col("cs"), -col("nid"))).as("want"))
    val bad = top.join(exact, "vec_id")
      .filter(col("neighbor_id") =!= col("want")).count()
    assert(bad === 0)
    assert(top.count() > 0)
  }

  test("trainKmeansCodebook: distributed == driver reference, bit-exact") {
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
    val dist = VectorSearch.trainKmeansCodebook(
      emb.repartition(7), k = 8, iters = 4) // partitioning must not matter
    val ref = VectorSearch.trainKmeansRef(vecs, k = 8, iters = 4)
    assert(dist.length === ref.length)
    dist.zip(ref).foreach { case ((cd, vd), (cr, vr)) =>
      assert(cd === cr)
      assert(vd.toSeq === vr.toSeq, s"centroid $cd differs")
    }
  }

  test("trainKmeansCodebook converges: the clustering objective never " +
      "degrades across rounds, and training beats the first-k init") {
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var na = 0.0; var nb = 0.0; var dot = 0.0; var i = 0
      while (i < a.length) {
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        dot += a(i).toDouble * b(i).toDouble; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // objective: mean cosine of every vector to its assigned centroid
    def objective(cb: Array[(Long, Array[Float])]): Double =
      vecs.map { case (_, e) =>
        cosine(e, cb(VectorSearch.assignRef(e, cb).toInt)._2)
      }.sum / vecs.size
    val objs = (0 to 4).map(i =>
      objective(VectorSearch.trainKmeansRef(vecs, k = 8, iters = i)))
    objs.sliding(2).foreach { case Seq(prev, next) =>
      assert(next >= prev - 1e-12, s"objective degraded: $objs")
    }
    assert(objs.last > objs.head,
      s"training must beat the first-k init on this corpus: $objs")
  }

  test("trained codebook improves the DISTRIBUTED assignment quality " +
      "over first-k (mean cosine to the assigned centroid)") {
    // k-means promises objective improvement, not balance (on this
    // near-uniform synthetic corpus first-k cells are already nearly
    // even) — so pin the objective, measured on the distributed path:
    // mean cosine of every vector to its assigned centroid.
    VectorExpressions.register(spark)
    def meanCentroidCosine(cb: Array[(Long, Array[Float])]): Double = {
      val cents = spark.createDataset(cb.toSeq)
        .toDF("cell", "cemb")
      VectorSearch.assignWithCodebook(emb, cb)
        .join(broadcast(cents), "cell")
        .agg(avg(expr("cosine_sim(embedding, cemb)")))
        .head.getDouble(0)
    }
    val init = meanCentroidCosine(VectorSearch.firstKCodebook(emb, 8))
    val trained = meanCentroidCosine(
      VectorSearch.trainKmeansCodebook(emb, k = 8, iters = 4))
    assert(trained > init,
      f"trained objective $trained%.4f must beat first-k $init%.4f")
  }

  test("trainPqCodebook: distributed == driver reference (pure integer " +
      "arithmetic), and training never increases total distortion") {
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
    val dist = VectorSearch.trainPqCodebook(
      emb.repartition(5), m = 4, codesPerSub = 16, iters = 4)
    val ref = VectorSearch.trainPqCodebookRef(vecs, m = 4,
      codesPerSub = 16, iters = 4)
    assert(dist.length === ref.length)
    dist.zip(ref).foreach { case (ds, rs) =>
      ds.zip(rs).foreach { case ((ld, vd), (lr, vr)) =>
        assert(ld === lr)
        assert(vd.toSeq === vr.toSeq)
      }
    }
    // distortion: sum of d2 over all (vector, sub) assignments
    def totalD2(cb: Array[Array[(Long, Array[Long])]]): Long =
      VectorSearch.pqAssignWith(emb, cb)
        .agg(sum(col("d2"))).head.getLong(0)
    val d2First = totalD2(VectorSearch.firstKPqCodebook(emb, 4, 16))
    val d2Trained = totalD2(dist)
    assert(d2Trained <= d2First,
      s"trained distortion $d2Trained vs first-k $d2First")
  }

  test("scalarQuantizeCodes spans [0, 255] per dimension") {
    val codes = VectorSearch.scalarQuantizeCodes(emb)
    val byDim = codes.groupBy("dim")
      .agg(min("code").as("lo"), max("code").as("hi"))
      .collect()
    assert(byDim.nonEmpty)
    byDim.foreach { r =>
      assert(r.getAs[Int]("lo") === 0)
      // integer floor division maps the max fx to exactly levels-1
      assert(r.getAs[Int]("hi") === 255)
    }
    assert(codes.count() === emb.count() * 64)
  }

  test("ivfAssign is a pure projection — no Exchange in its plan") {
    val assigned = VectorSearch.ivfAssign(emb, numCentroids = 4)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("pqAssign is shuffle-free — no Exchange between scan and codes") {
    val codes = VectorSearch.pqAssign(emb, m = 4, codesPerSub = 16)
    val plan = codes.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("exact kernels enforce the candidate row cap") {
    val e = intercept[IllegalArgumentException] {
      VectorSearch.bruteForceCosineTop1(emb, emb, maxCandidates = 10).count()
    }
    assert(e.getMessage.contains("maxCandidates"))
    val e2 = intercept[IllegalArgumentException] {
      VectorSearch.cosineThresholdPairs(emb, emb, minSim = 0.5,
        maxCandidates = 10).count()
    }
    assert(e2.getMessage.contains("maxCandidates"))
  }

  test("bucketedThresholdPairs = exact threshold pairs restricted to a bucket") {
    val pairs = VectorSearch.bucketedThresholdPairs(emb, minSim = 0.2)
    val exact = VectorSearch.cosineThresholdPairs(emb, emb, minSim = 0.2)
      .withColumnRenamed("cosim", "exact_sim")
    // soundness: every bucketed pair is a true threshold pair with the
    // identical similarity (keep_id < dup_id orientation matches)
    val joined = pairs.join(exact, Seq("keep_id", "dup_id"), "left")
    assert(joined.filter(col("exact_sim").isNull).count() === 0)
    assert(joined.filter(abs(col("cosim") - col("exact_sim")) > 1e-12)
      .count() === 0)
    // and the bucket restriction is the only loss: same-bucket exact
    // pairs are all found
    val e2 = emb.withColumn("bucket", VectorSearch.signBucket("embedding"))
      .select(col("vec_id"), col("bucket"))
    val sameBucket = exact
      .join(e2.toDF("keep_id", "b1"), "keep_id")
      .join(e2.toDF("dup_id", "b2"), "dup_id")
      .filter(col("b1") === col("b2"))
    assert(pairs.count() === sameBucket.count())
  }

  test("multiProbeBucketedThresholdPairs covers sign-Hamming <= 1, " +
      "emits each pair exactly once, and stays sound") {
    val mp = VectorSearch.multiProbeBucketedThresholdPairs(emb, minSim = 0.2)
      .localCheckpoint(true)
    // no duplicate pair rows: the one-sided probe expansion generates
    // each unordered pair exactly once
    assert(mp.count() === mp.select("keep_id", "dup_id").distinct().count())
    // soundness: every pair is a true threshold pair (exact cosine)
    val exact = VectorSearch.cosineThresholdPairs(emb, emb, minSim = 0.2)
      .withColumnRenamed("cosim", "exact_sim").localCheckpoint(true)
    val joined = mp.join(exact, Seq("keep_id", "dup_id"), "left")
    assert(joined.filter(col("exact_sim").isNull).count() === 0)
    // completeness boundary: found == exact pairs at sign-Hamming <= 1,
    // a strict superset of the same-bucket tier
    val e2 = emb.withColumn("bucket", VectorSearch.signBucket("embedding"))
      .select(col("vec_id"), col("bucket"))
    val withB = exact
      .join(e2.toDF("keep_id", "b1"), "keep_id")
      .join(e2.toDF("dup_id", "b2"), "dup_id")
    val withinOne = withB.filter(
      expr("""aggregate(zip_with(split(b1, ''), split(b2, ''),
               (x, y) -> CASE WHEN x <> y THEN 1 ELSE 0 END),
               0, (acc, v) -> acc + v) <= 1"""))
    assert(mp.count() === withinOne.count())
    assert(mp.count() >=
      VectorSearch.bucketedThresholdPairs(emb, minSim = 0.2).count())
  }

  test("pqAssign: every vector gets m in-range codes; codebook " +
      "vectors quantize to themselves with zero distortion") {
    val m = 4
    val k = 16
    val codes = VectorSearch.pqAssign(emb, m = m, codesPerSub = k).cache()
    val n = emb.count()
    assert(codes.count() === n * m)
    assert(codes.filter(col("code") < 0 || col("code") >= k).count() === 0)
    assert(codes.filter(col("sub") < 0 || col("sub") >= m).count() === 0)
    // a codebook vector's own subvector is in the codebook → exact match
    val self = codes.filter(col("vec_id") < k)
    assert(self.filter(col("code") =!= col("vec_id")).count() === 0)
    assert(self.filter(col("d2") =!= 0L).count() === 0)
    codes.unpersist()
  }

  test("multi-probe IVF: prank-1 equals the single-probe assignment, " +
      "and nprobe=cells recovers exact in-probed-set top-k") {
    VectorExpressions.register(spark)
    val cents = VectorSearch.firstKCodebook(emb, 4)
    val single = VectorSearch.assignWithCodebook(emb, cents)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val home = VectorSearch.multiProbeAssign(emb, cents, nprobe = 2)
      .filter(col("prank") === 1)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(home === single)
    // probing EVERY cell makes IVF top-k exact: compare against the
    // brute-force top-1 (rank 1 neighbor must coincide)
    val full = VectorSearch.ivfCosineTopK(emb, k = 1,
        numCentroids = 4, nprobe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = VectorSearch.bruteForceCosineTop1(emb, emb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full === brute)
  }

  test("multi-probe recall dominates single-probe at the same k") {
    val top1 = VectorSearch.ivfCosineTopK(emb, k = 1,
        numCentroids = 4, nprobe = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val top2 = VectorSearch.ivfCosineTopK(emb, k = 1,
        numCentroids = 4, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // a wider probe can only find an equal-or-better neighbor
    top1.foreach { case (id, sim1) =>
      assert(top2(id) >= sim1, s"vec $id: nprobe=2 ${top2(id)} < $sim1")
    }
    assert(top2.size >= top1.size)
  }

  test("ivfSearch with batch == corpus reproduces ivfCosineTopK") {
    val cents = VectorSearch.firstKCodebook(emb, 4)
    val served = VectorSearch.ivfSearch(emb,
        VectorSearch.assignWithCodebook(emb, cents), cents, k = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val direct = VectorSearch.ivfCosineTopK(emb, k = 2,
        numCentroids = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    assert(served === direct)
  }

  test("pqAdcTop1 matches a driver-side LUT replay and enforces the " +
      "batch cap") {
    val cb = VectorSearch.firstKPqCodebook(emb, m = 4, codesPerSub = 16)
    val codes = VectorSearch.pqAssignWith(emb, cb)
    val queries = emb.filter(col("vec_id") % 5 === 0)
    val got = VectorSearch.pqAdcTop1(queries, codes, cb)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // replay: integer LUT scoring over the collected code words
    val scale = 1048576L
    val sd = 16
    val wordRows = codes.collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
    val words = wordRows.groupBy(_._1).map { case (vid, rs) =>
      vid -> rs.sortBy(_._2).map(_._3)
    }
    val labelIdx = cb.map(_.zipWithIndex.map { case ((l, _), i) => l -> i }.toMap)
    val want = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().map { case (qid, embq) =>
      val fx = embq.map(v => math.floor(v.toDouble * scale).toLong)
      val lut = Array.tabulate(4)(sub => cb(sub).map { case (_, cfx) =>
        (0 until sd).map(i => { val df = fx(sub * sd + i) - cfx(i); df * df }).sum
      })
      val scored = words.iterator.filter(_._1 != qid).map { case (vid, w) =>
        (vid, (0 until 4).map(sub => lut(sub)(labelIdx(sub)(w(sub)))).sum)
      }.toSeq
      val (nid, s) = scored.minBy { case (vid, s) => (s, vid) }
      qid -> (nid, s)
    }.toMap
    assert(got === want)
    // the query batch is the bounded side: the cap must be enforced
    val e = intercept[IllegalArgumentException] {
      VectorSearch.pqAdcTop1(emb, codes, cb, maxBatch = 10)
    }
    assert(e.getMessage.contains("maxBatch"))
  }

  test("ivfPqSearch probing ALL cells reduces to plain ADC, and the " +
      "IVF gate only ever narrows the candidate set") {
    val cents = VectorSearch.firstKCodebook(emb, 4)
    val cb = VectorSearch.firstKPqCodebook(emb, m = 4, codesPerSub = 16)
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val assigned = VectorSearch.assignWithCodebook(corpus, cents)
    val codes = VectorSearch.pqAssignWithCell(assigned, cb)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    // nprobe == numCentroids probes every cell → the cell gate is a
    // no-op and the composite must equal ADC over the same codes
    val all = VectorSearch.ivfPqSearch(batch, codes, cb, cents, nprobe = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val adc = VectorSearch.pqAdcTop1(batch,
        VectorSearch.pqAssignWith(corpus, cb), cb)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(all === adc)
    // narrow probing returns a (weakly) worse ADC distance per query —
    // the gate restricts candidates, never invents them
    val narrow = VectorSearch.ivfPqSearch(batch, codes, cb, cents,
        nprobe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    narrow.foreach { case (qid, d2) =>
      assert(d2 >= adc(qid)._2, s"query $qid: narrowed probe found a " +
        "better distance than full ADC — the gate is corrupt")
    }
  }

  test("ivf top-1 similarity is bounded by the brute-force top-1") {
    val sample = emb.limit(60).cache()
    val brute = VectorSearch.bruteForceCosineTop1(sample, sample)
      .select(col("vec_id"), col("cosim").as("brute_sim"))
    val ivf = VectorSearch.ivfCosineTop1(sample, numCentroids = 4)
      .select(col("vec_id"), col("cosim").as("ivf_sim"))
    // an in-cell neighbor can never beat the global nearest neighbor
    val violations = ivf.join(brute, "vec_id")
      .filter(col("ivf_sim") > col("brute_sim") + lit(1e-12)).count()
    assert(violations === 0)
    sample.unpersist()
  }

  test("bruteForceCosineTopK: rank 1 equals top-1, ranks are ordered, " +
      "and a window-function replay agrees exactly") {
    val k = 3
    val topk = VectorSearch.bruteForceCosineTopK(emb, emb, k)
    // rank 1 must reproduce the top-1 kernel exactly (id AND sim)
    val r1 = topk.filter(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id"), col("cosim"))
    val t1 = VectorSearch.bruteForceCosineTop1(emb, emb)
    assert(r1.except(t1).count() === 0 && t1.except(r1).count() === 0)
    // every probe emits exactly k rows (corpus > k) with ranks 1..k
    val counts = topk.groupBy("vec_id").agg(
      count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
    assert(counts.filter(col("n") =!= k || col("lo") =!= 1 ||
      col("hi") =!= k).count() === 0)
    // relational replay: row_number over the exact pairwise cosine
    VectorExpressions.register(spark)
    val pairs = emb.select(col("vec_id"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("nid"),
        col("embedding").as("eb")))
      .filter(col("vec_id") =!= col("nid"))
      .withColumn("cs", expr("cosine_sim(ea, eb)"))
    val want = pairs.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cs").desc, col("nid"))))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("rn").as("rank"),
        col("nid").as("neighbor_id"))
    val got = topk.select(col("vec_id"), col("rank"), col("neighbor_id"))
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("srpSignatures: per vector, `tables` integer signatures in " +
      "[0, 2^bits), deterministic across runs") {
    val sg = VectorSearch.srpSignatures(emb, bits = 6, tables = 8)
    val bad = sg.filter(size(col("sigs")) =!= 8 ||
      exists(col("sigs"), s => s < 0 || s >= 64)).count()
    assert(bad === 0)
    assert(sg.count() === emb.count())
    // signatures actually spread over the bucket space (not degenerate)
    assert(sg.select(explode(col("sigs"))).distinct().count() > 8)
    // md5-derived weights: a second run is bit-identical
    val sg2 = VectorSearch.srpSignatures(emb, bits = 6, tables = 8)
    assert(sg.except(sg2).count() === 0 && sg2.except(sg).count() === 0)
  }

  test("srpLshCandidatePairs generates each pair EXACTLY once across " +
      "the table union (keyed dedup aggregate over raw collisions)") {
    // identical vectors collide in EVERY table — the maximal stress on
    // the exactly-once contract
    val tiny = Seq(
      (1L, Array(0.5f, -0.25f, 0.75f, 0.1f)),
      (2L, Array(0.5f, -0.25f, 0.75f, 0.1f)), // == vec 1
      (3L, Array(0.5f, -0.25f, 0.75f, 0.1f)), // == vec 1
      (4L, Array(-0.9f, 0.8f, -0.7f, 0.6f))
    ).toDF("vec_id", "embedding")
    val cand = VectorSearch
      .srpLshCandidatePairs(tiny, bits = 4, tables = 6, dims = 4)
    val perPair = cand.groupBy("keep_id", "dup_id")
      .agg(count(lit(1)).as("n"))
    assert(perPair.filter(col("n") =!= 1).count() === 0,
      "a pair colliding in several tables must surface once")
    // identical vectors are GUARANTEED candidates (collide everywhere)
    val got = cand.as[(Long, Long)].collect().toSet
    assert(Set((1L, 2L), (1L, 3L), (2L, 3L)).subsetOf(got))
    // orientation: keep_id < dup_id always
    assert(cand.filter(col("keep_id") >= col("dup_id")).count() === 0)
    // and on the real corpus: no duplicates either
    val real = VectorSearch.srpLshCandidatePairs(emb, bits = 6, tables = 8)
    assert(real.groupBy("keep_id", "dup_id").agg(count(lit(1)).as("n"))
      .filter(col("n") =!= 1).count() === 0)
  }

  test("srpThresholdPairs = exact threshold pairs restricted to SRP " +
      "candidates; OR-amplification recalls more than one sign bucket") {
    VectorExpressions.register(spark)
    val minSim = 0.3
    val srp = VectorSearch
      .srpThresholdPairs(emb, minSim, bits = 6, tables = 16)
    // soundness: every reported pair really clears the exact cosine
    val exact = VectorSearch.cosineThresholdPairs(emb, emb, minSim)
      .select(col("keep_id"), col("dup_id"))
    val srpPairs = srp.select(col("keep_id"), col("dup_id"))
    assert(srpPairs.except(exact).count() === 0)
    // completeness relative to its own candidate tier: candidates that
    // clear the threshold are all reported
    val cand = VectorSearch.srpLshCandidatePairs(emb, bits = 6, tables = 16)
    val candTrue = cand.join(exact, Seq("keep_id", "dup_id"), "leftsemi")
    assert(candTrue.except(srpPairs).count() === 0)
    // OR-amplification: 16 independent tables recall at least as many
    // true pairs as the single all-bits-equal sign bucket
    val bucket = VectorSearch.bucketedThresholdPairs(emb, minSim)
    assert(srpPairs.count() >= bucket.count())
    // the scored funnel relation is consistent with both tiers: one
    // row per candidate, and its threshold slice IS srpThresholdPairs
    val scored = VectorSearch.srpScoredCandidatePairs(emb, bits = 6, tables = 16)
    assert(scored.count() === cand.count())
    val sliced = scored.filter(col("cosim") >= minSim)
      .select(col("keep_id"), col("dup_id"))
    assert(sliced.except(srpPairs).count() === 0 &&
      srpPairs.except(sliced).count() === 0)
  }

  test("srpFirstCollisionTable carries the whole OR-amplification " +
      "curve: mt < L reproduces the L-table candidate operator exactly") {
    // weights depend only on (t, j, d), so the first L tables of a
    // 8-table run ARE the L-table run — the cumulative identity the
    // emb_srp_curve query rests on
    val first = VectorSearch.srpFirstCollisionTable(emb, bits = 6, tables = 8)
    for (l <- Seq(2, 5, 8)) {
      val viaCurve = first.filter(col("mt") < l)
        .select(col("keep_id"), col("dup_id"))
      val direct = VectorSearch.srpLshCandidatePairs(emb, bits = 6, tables = l)
      assert(viaCurve.except(direct).count() === 0 &&
        direct.except(viaCurve).count() === 0, s"L=$l")
    }
  }

  test("incrementalEmbeddingDedup labels corpus_dup / batch_dup / new " +
      "with keep-first ids and corpus precedence") {
    val v = Array(0.5f, -0.25f, 0.75f, 0.1f)
    val u = Array(-0.9f, 0.8f, -0.7f, 0.6f)
    val w = Array(0.1f, 0.9f, 0.2f, -0.8f)
    val corpus = Seq((1L, v), (3L, u)).toDF("vec_id", "embedding")
    // batch: 10 dups corpus vec 1; 14 == 12 (batch dup, keep-first);
    // 16 matches nothing
    val batch = Seq((10L, v), (12L, u), (14L, u), (16L, w))
      .toDF("vec_id", "embedding")
    val out = VectorSearch.incrementalEmbeddingDedup(
        corpus, batch, batch.select(col("vec_id")),
        minSim = 0.99, bits = 4, tables = 6, dims = 4)
      .as[(Long, String, Long)].collect()
      .map { case (k, s, d) => k -> (s, d) }.toMap
    assert(out(10L) === ("corpus_dup", 1L))
    // 12 also duplicates corpus vec 3 — corpus takes precedence
    assert(out(12L) === ("corpus_dup", 3L))
    // 14 duplicates BOTH corpus 3 and batch 12: corpus precedence
    assert(out(14L) === ("corpus_dup", 3L))
    assert(out(16L) === ("new", -1L))
    // without the corpus match, 14 falls back to the earlier batch id
    val out2 = VectorSearch.incrementalEmbeddingDedup(
        Seq((1L, v)).toDF("vec_id", "embedding"), batch,
        batch.select(col("vec_id")),
        minSim = 0.99, bits = 4, tables = 6, dims = 4)
      .as[(Long, String, Long)].collect()
      .map { case (k, s, d) => k -> (s, d) }.toMap
    assert(out2(12L) === ("new", -1L))
    assert(out2(14L) === ("batch_dup", 12L))
  }
}
