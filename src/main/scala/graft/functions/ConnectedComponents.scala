package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label propagation —
  * the clustering step of near-duplicate detection (each doc keeps the
  * smallest doc_id reachable through the near-dup edge graph).
  *
  * Each round is one join + one aggregate over the (small, derived) edge
  * relation; the driver only ever sees a convergence scalar, never the
  * data. Labels are monotone non-increasing, so the label SUM strictly
  * decreases iff any node changed — convergence is a single aggregate
  * per round, with no old-vs-new join. Rounds are bounded by component
  * diameter; dedup graphs are near-cliques (diameter ≤ 2–3). A corpus
  * with genuinely long chains would switch to large-star/small-star
  * contraction for O(log n) rounds — measured here (BENCH_NOTES r1),
  * pointer-jumping costs more than it saves at shallow diameters.
  */
object ConnectedComponents {

  /** @param edges undirected edge list as columns (`src`, `dst`) — each
    *              pair needs to appear in ONE direction only; isolated
    *              nodes (no edges) are absent from the result, as they
    *              are from the input.
    * @return (`node`, `label`) where label = min node id reachable. */
  def run(spark: SparkSession, edges: DataFrame): DataFrame =
    runWithRounds(spark, edges)._1

  /** [[run]] plus the number of propagation rounds executed (including
    * the final confirmation round) — exposed so scale probes can show
    * that ROUNDS, not per-round cost, is the scaling term for the
    * constant-diameter graphs dedup produces. */
  def runWithRounds(spark: SparkSession, edges: DataFrame): (DataFrame, Int) = {
    val ed = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sym = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
    // head start: label_0 = min(node, min neighbor) — one aggregate
    // that already converges near-cliques (every node sees the
    // component minimum directly), so dedup graphs usually need just
    // the confirmation round instead of 2-3 propagation rounds
    var labels = sym.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("node"),
        least(col("src"), col("mn")).as("label"))
      .localCheckpoint()
    // Sum fits a long for any realistic id space at this scale; a
    // 100 TB id space would accumulate the convergence sum as decimal.
    var prevSum = Option.empty[Long]
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      val prop = labels.join(sym, col("node") === col("src"))
        .select(col("dst").as("node"), col("label"))
      // localCheckpoint (not persist): persist caches DATA but the
      // logical plan still nests one level per round, and a
      // high-diameter graph (long chain) then blows up planning —
      // iteration requires lineage TRUNCATION. A production cluster
      // job uses checkpoint(reliableDir) for the same reason plus
      // executor-loss recovery.
      // LAZY checkpoint: the convergence aggregate right below is the
      // materializing action, so each round runs ONE job, not an
      // eager-checkpoint job plus the aggregate job
      val next = labels.union(prop)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val sm = Option(next.agg(sum(col("label"))).first().get(0))
        .fold(0L)(_.asInstanceOf[Long])
      converged = prevSum.contains(sm)
      prevSum = Some(sm)
      labels = next
    }
    ed.unpersist(blocking = false)
    (labels, rounds)
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * O(log n)-round scale path for HIGH-DIAMETER graphs, where plain
    * min-label propagation needs O(diameter) rounds. Each round is two
    * grouped aggregates + joins over the (shrinking) edge relation;
    * lineage is truncated per round exactly as in [[run]].
    *
    *  - large-star: every node attaches its LARGER neighbors to the
    *    minimum of its neighborhood (incl. itself);
    *  - small-star: on canonical (u > v) edges, every node attaches its
    *    smaller neighbors and itself to their minimum.
    *
    * Both steps preserve connectivity; at the fixed point the edges form
    * stars (node → component minimum). Convergence is detected by an
    * (edge count, order-independent hash checksum) pair — at the fixed
    * point the edge SET is exactly stable, so checksum equality is the
    * set equality it stands for (64-bit collision odds negligible, and
    * a collision could only delay, not corrupt: we re-check next round).
    *
    * Same contract as [[run]]: undirected input (`src`, `dst`), one
    * direction per pair suffices; isolated nodes absent from output;
    * returns (`node`, `label`) with label = min reachable node id. */
  def runStar(spark: SparkSession, edges: DataFrame): DataFrame =
    runStarWithRounds(spark, edges)._1

  /** [[runStar]] plus the number of large+small rounds executed —
    * exposed so tests can pin the O(log n) round bound. */
  def runStarWithRounds(spark: SparkSession, edges: DataFrame): (DataFrame, Int) = {
    def canonical(df: DataFrame): DataFrame =
      df.where(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()

    var e = canonical(edges.select(col("src").cast("long").as("u"),
        col("dst").cast("long").as("v")))
      .localCheckpoint()
    var prev = Option.empty[(Long, Long)]
    var rounds = 0
    var converged = false
    while (!converged) {
      // large-star over the full symmetric neighborhood of each node
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // (v, m) for v > u: m ≤ u < v, so the emitted edge is already
      // canonical and never a self-loop
      val large = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star on canonical edges: each node u with its smaller
      // neighbors Γ(u); attach all of Γ(u) ∪ {u} to min(Γ(u))
      val minsS = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val withM = large.join(minsS, "u")
      // lazy: the checksum aggregate below materializes the checkpoint
      // in the same job (see [[run]])
      val small = canonical(
        withM.select(col("v").as("u"), col("m").as("v"))
          .union(minsS.select(col("u"), col("m").as("v"))))
        .localCheckpoint(false)
      rounds += 1
      // pmod bounds each term so the sum cannot overflow a long
      // (ANSI mode makes that an error, not a wrap)
      val chk = small.agg(count(lit(1)),
          sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L))))
        .first()
      val sig = (chk.getLong(0), if (chk.isNullAt(1)) 0L else chk.getLong(1))
      converged = prev.contains(sig)
      prev = Some(sig)
      e = small
    }
    val symF = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val labels = symF.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u").as("node"), least(col("u"), col("mn")).as("label"))
    (labels, rounds)
  }
}
