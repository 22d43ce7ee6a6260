package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §4 row 3: the reference fights skew
  * by over-splitting property ranges with round-robin chaining; Spark's
  * first line of defense is AQE skew-join, these are the explicit forms
  * for when the skew is known).
  */
object Salting {

  /** Salted equi-join for a skewed build side: the large (skewed) side
    * gets a deterministic salt in [0, salts); the small side is
    * replicated `salts` times. The join key becomes (key, salt), so one
    * hot key spreads over `salts` shuffle partitions.
    *
    * Equivalent to `large.join(small, keys)` for any 1:N join where
    * `small` has unique keys. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic per-row salt: spread rows of a hot key by their
    // physical position, not rand() (reproducible under retry)
    val salted = large.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = small
      .withColumn("_salt", explode(lit((0 until salts).toArray)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-stage aggregation for skewed group keys: stage 1 aggregates on
    * (key, salt), stage 2 merges the partials. For algebraic aggregates
    * Spark's partial aggregation already does this — use this form for
    * non-algebraic per-key work (e.g. large collect_list-style state)
    * where a single reducer for a hot key would OOM. */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame = {
    require(salts > 0)
    df.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("k"))
      .agg(sum(col("_partial")).as("cnt"))
  }

  /** Two-stage salted SUM: stage 1 sums per (key, salt), stage 2 merges
    * the `salts` partials per key — a hot key's rows spread over `salts`
    * reducers instead of one. Decimal/integer sums are associative, so
    * the result is exactly the unsalted `sum`. Returns (k, total) with
    * the value's widened sum type (caller casts). */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      salts: Int): DataFrame = {
    require(salts > 0)
    df.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col("k"))
      .agg(sum(col("_partial")).as("total"))
  }
}
