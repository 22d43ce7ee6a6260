package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Runtime-plan assertion for AQE skew handling — the complement of
  * `join_salted` (manual salting): Spark's OptimizeSkewedJoin splits an
  * oversized shuffle partition into parallel sub-reads AT RUNTIME, so
  * at 100× a moderately skewed equi join needs NO manual salting — the
  * rewrite proves itself here on a skewed fixture. Manual salting
  * remains the tool for the cases AQE cannot rescue: a single key too
  * large for any split to help with aggregation-side skew, or joins
  * the planner cannot split without an extra shuffle. This spec pins
  * the boundary: the skew split must actually FIRE (skew=true in the
  * adaptive final plan) under thresholds scaled to the fixture, so the
  * claim "AQE handles this shape" is executed, not assumed.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("OptimizeSkewedJoin fires on a skewed shuffle join: the adaptive " +
      "final plan carries skew=true sub-partition reads") {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds scaled to the fixture (defaults target 256 MB
      // partitions): skewed = > max(factor × median, threshold)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      // force a shuffled join: broadcast would dodge the skew entirely
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val old = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one pathological key (0) owning ~2/3 of the left side — the
      // shape a crawl corpus produces (one host, one template)
      val left = spark.range(0, 300000)
        .select(when(col("id") % 3 =!= 0, lit(0L))
          .otherwise(col("id")).as("k"), col("id").as("v"))
      val right = spark.range(0, 300000)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS query execution's adaptive plan (an action like
      // count() wraps the join in a new aggregate plan and leaves this
      // one un-finalized — isFinalPlan=false with no skew info)
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() === 300000L)
      // the ADAPTIVE final plan (only materialized after execution)
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the skewed partition; " +
          s"final plan:\n${finalPlan.take(2000)}")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
