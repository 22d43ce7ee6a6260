package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout operators for 100 TB table maintenance: Z-order
  * (Morton) clustering keys for multi-dimensional data skipping, a
  * distributed global row-number (the scalable zipWithIndex-on-sorted-
  * data), and cumulative-share compaction binning.
  *
  * The reference engine leaves physical layout to Datastore/GCS
  * (reference: java/.../outputs/GoogleCloudStorageFileOutput.java
  * writes whatever order arrives); at Spark scale the layout pass IS
  * an operator: a table clustered on `zkey(a, b)` gives parquet
  * row-group min/max pruning on BOTH columns at once, where a plain
  * sort only prunes its leading column.
  */
object Layout {

  /** Morton/Z-order interleave of the low `bits` bits of two
    * non-negative long columns — x occupies even bit positions, y odd.
    * Pure column arithmetic (shift/and/or) folded into one projection:
    * fully codegen'd, no UDF, stays inside WholeStageCodegen. */
  def zkey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same interleave as portable ANSI SQL over the expressions
    * `x` and `y` — the oracle side of the z-order checks. */
  def zkeySql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString("(", " | ", ")")

  /** Driver-side reference implementation for property tests. */
  def zkeyRef(x: Long, y: Long, bits: Int = 16): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Distributed global row-number (0-based) ordered by (`key`,
    * `tiebreak`): range-repartition on the order key, sort within
    * partitions, then `zipWithIndex` (one lightweight count job + a
    * per-partition offset attach). No single-partition window
    * anywhere — this is how a 100 TB corpus gets a global
    * training-shuffle order. The (key, tiebreak) pair must be unique
    * for the result to be deterministic; range boundaries come from
    * sampling and may vary, but the attached rank is the global order
    * rank regardless of where the boundaries land. */
  /** The parallel range-partitioned sort stage underneath
    * [[globalRowNumber]], exposed so plan tests can pin its shape:
    * the exchange must be `rangepartitioning(..., N)` with N > 1 —
    * never a single-partition sort. */
  def rangeSorted(df: DataFrame, key: Column, tiebreak: Column,
      partitions: Int = 0): DataFrame = {
    val sp = df.sparkSession
    val n = if (partitions > 0) partitions
      else sp.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartitionByRange(n, key, tiebreak).sortWithinPartitions(key, tiebreak)
  }

  def globalRowNumber(df: DataFrame, key: Column, tiebreak: Column,
      outCol: String = "rn", partitions: Int = 0): DataFrame = {
    val sp = df.sparkSession
    val sorted = rangeSorted(df, key, tiebreak, partitions)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    sp.createDataFrame(rdd, schema)
  }
}
