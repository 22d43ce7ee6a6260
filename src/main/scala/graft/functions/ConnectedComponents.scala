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
  def run(spark: SparkSession, edges: DataFrame): DataFrame = {
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
    while (!converged) {
      val prop = labels.join(sym, col("node") === col("src"))
        .select(col("dst").as("node"), col("label"))
      // localCheckpoint (not persist): persist caches DATA but the
      // logical plan still nests one level per round, and a
      // high-diameter graph (long chain) then blows up planning —
      // iteration requires lineage TRUNCATION. A production cluster
      // job uses checkpoint(reliableDir) for the same reason plus
      // executor-loss recovery.
      val next = labels.union(prop)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      val sm = Option(next.agg(sum(col("label"))).first().get(0))
        .fold(0L)(_.asInstanceOf[Long])
      converged = prevSum.contains(sm)
      prevSum = Some(sm)
      labels = next
    }
    ed.unpersist(blocking = false)
    labels
  }
}
