package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential document-quality filtering — the C4/Gopher-style rule
  * chain a training-data pipeline runs between ingestion and dedup
  * (cf. the reference's mapper-as-filter stage,
  * python/src/mapreduce/operation/__init__.py: a map-only job that
  * drops records; here the rules are declarative columns instead of
  * imperative mapper code).
  *
  * Rules are plain boolean `Column`s, so every rule stays inside
  * WholeStageCodegen and the whole funnel is ONE aggregate over one
  * scan — no per-rule pass, no shuffle of document rows. At 100 TB the
  * funnel costs exactly one map-side partial aggregation regardless of
  * how many rules are chained.
  *
  * Determinism: ratio-valued signals are floored integer basis points
  * (see QueryDef's oracle-parity notes) — no float boundaries.
  */
object QualityFilters {

  /** Mean token length in floored centi-chars (e.g. 512 = 5.12 chars):
    * `floor(total_token_chars * 100 / n_tokens)`. Codegen'd: token
    * chars come from concatenating the token array, not a per-token
    * interpreted lambda. Expects a token-array column `w`. */
  def meanTokenLenCentichars(w: Column): Column =
    floor(length(concat_ws("", w)) * 100.0 / greatest(size(w), lit(1)))
      .cast("long")

  /** Survival funnel over sequential rules: row i counts documents
    * passing rules 0..i. Returns (stage, rule, n_pass) with stage
    * 1-based. One aggregate: count_if(r0), count_if(r0 AND r1), … then
    * an unpivot of the single result row. */
  def funnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val cumulative = rules.scanLeft(lit(true)) { case (acc, (_, r)) => acc && r }
      .tail
    val aggs = cumulative.zipWithIndex.map { case (c, i) =>
      count_if(c).as(s"c$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) => s"${i + 1}, '$name', c$i" }
      .mkString(", ")
    one.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (stage, rule, n_pass)")
      .select(col("stage").cast("long"), col("rule"), col("n_pass"))
  }
}
