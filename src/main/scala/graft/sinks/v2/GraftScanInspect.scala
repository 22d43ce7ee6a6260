package graft.sinks.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** SCOPED scan observability: extract the catalog's OWN scan
  * instances from a DataFrame's executed plan, so every spec and
  * in-row check-query `require` reads evidence (planned/pruned file
  * counts, read schema, runtime-filter state) off the scan that
  * actually ran — never off process-wide mutable state, which
  * concurrent queries would interleave. Walks THROUGH the adaptive
  * wrappers (AQE finalizes plans inside [[AdaptiveSparkPlanExec]] and
  * hides materialized stages inside [[QueryStageExec]]) and reused
  * exchanges, so the accessors work under Spark's default AQE.
  *
  * Usage contract: EXECUTE the DataFrame first (collect /
  * localCheckpoint) when the evidence is runtime — AQE only finalizes
  * the plan at execution, and runtime filters only fire then. */
object GraftScanInspect {
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    p +: through.flatMap(walk)
  }

  /** Every DSv2 scan in the df's executed plan. */
  def scans(df: DataFrame)
      : Seq[org.apache.spark.sql.connector.read.Scan] =
    walk(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan
    }

  /** The catalog row scans of this plan. */
  def rowScans(df: DataFrame): Seq[GraftRowScan] =
    scans(df).collect { case s: GraftRowScan => s }

  /** The plan's single [[GraftRowScan]] — loud when absent or
    * ambiguous, so a require can never silently read the wrong
    * scan's evidence. */
  def rowScan(df: DataFrame): GraftRowScan = rowScans(df) match {
    case Seq(s) => s
    case ss => throw new IllegalStateException(
      s"expected exactly one GraftRowScan in the executed plan, " +
        s"found ${ss.size} — inspect the plan or disambiguate")
  }

  /** The metadata-only aggregate scans of this plan (empty when the
    * aggregate declined to the ordinary row scan). */
  def aggScans(df: DataFrame): Seq[GraftAggScan] =
    scans(df).collect { case s: GraftAggScan => s }

  /** The maintained-view serving scans of this plan (a grouped
    * aggregate answered from an incremental view's files — empty when
    * the aggregate ran against the base). */
  def viewAggScans(df: DataFrame): Seq[GraftViewAggScan] =
    scans(df).collect { case s: GraftViewAggScan => s }
}
