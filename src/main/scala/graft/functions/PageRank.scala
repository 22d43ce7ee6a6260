package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-point PageRank — the link-authority signal a web-corpus
  * curator feeds into quality weighting (domain authority, crawl
  * prioritization).
  *
  * All arithmetic is integer fixed-point (ranks scaled by 10^6,
  * per-edge contributions floored): the result is bit-identical
  * regardless of aggregation order or engine, so a SQL oracle can
  * pin it exactly — a float PageRank would drift with Spark's
  * non-deterministic sum order. Dangling-node mass is dropped (the
  * standard "no redistribution" variant); each iteration is one
  * broadcast-or-shuffle join of ranks onto edges plus one aggregate
  * keyed on the destination — the classic distributed PR round.
  * Lineage is truncated every round with localCheckpoint so the plan
  * does not nest across iterations (same discipline as
  * [[ConnectedComponents]]).
  */
object PageRank {

  val Scale = 1000000L

  /** `nodes`: single column `node: long`. `edges`: `src`, `dst`.
    * Returns (node, rank_fx) after `iters` rounds of
    * r ← floor((1-d)·10^6) + Σ floor(r_src · dampNum / dampDen / outdeg),
    * starting from r = 10^6. */
  def runFixedPoint(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      iters: Int, dampNum: Long = 17, dampDen: Long = 20): DataFrame = {
    val base = Scale - Scale * dampNum / dampDen
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = edges.join(outdeg, "src").localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(Scale).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contribs = ed
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          floor(col("r") * dampNum / dampDen / col("outdeg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("r"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("rank_fx"))
  }

  /** The same computation as portable ANSI SQL (DuckDB-compatible),
    * unrolled `iters` times over CTEs `nodes(node)` and
    * `edges(src, dst)` that the caller must define upstream. */
  def sqlUnrolled(iters: Int, dampNum: Long = 17, dampDen: Long = 20): String = {
    val base = Scale - Scale * dampNum / dampDen
    val deg = """od AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    // Each round is one left join + aggregate, mirroring the Spark
    // rounds one-to-one. The double division sequence ((r·n)/d)/deg is
    // written identically on both sides, so even sub-ulp rounding
    // agrees bit-for-bit.
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         SELECT n.node,
           CAST($base + coalesce(sum(CAST(floor(CAST(p.r * $dampNum AS DOUBLE) / $dampDen / p.outdeg) AS BIGINT)), 0) AS BIGINT) AS r
         FROM nodes n
         LEFT JOIN (
           SELECT ed.dst AS dst, od.outdeg AS outdeg, pr.r AS r
           FROM edges ed
           JOIN od ON od.src = ed.src
           JOIN r${i - 1} pr ON pr.node = ed.src) p ON p.dst = n.node
         GROUP BY n.node)"""
    }
    (Seq(deg) ++ rounds).mkString(",\n")
  }
}
