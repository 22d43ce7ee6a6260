package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row (by a time
  * column) with the same key at or before the left row's time.
  *
  * Spark has no built-in as-of join; per the extension preference order
  * this is (a) composition of built-ins — union the tagged sides and
  * carry the right side's payload forward with a running `max`/`last`
  * window over the preceding frame. One shuffle on (key), no custom
  * plan node needed. Cost is a single window pass over |L|+|R| rows —
  * the same partitioning a custom SortMergeAsOfExec would need, so a
  * (c)-tier LogicalPlan+SparkPlan implementation buys nothing here
  * (documented determination, COVERAGE.md §2.12).
  *
  * @param left      left rows (the "probe" side)
  * @param right     right rows (the "quote"/state side)
  * @param keyCol    equi-key column name (present on both sides)
  * @param timeCol   ordering column name (long/epoch, present on both)
  * @param valueCol  right-side column to carry to each left row
  * @param tolerance optional max allowed `timeCol` distance (same units
  *                  as the long time values): matches staler than this
  *                  are nulled out — pandas merge_asof's `tolerance`
  * @return left rows + `asof_<valueCol>` + `asof_<timeCol>` columns
  */
object AsOf {
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCol: String,
      tolerance: Option[Long] = None): DataFrame = {
    val lTag = left.withColumn("_side", F.lit(1))
      .withColumn("_rv", F.lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("_rt", F.lit(null).cast("long"))
    val rTag = right.select(
        F.col(keyCol), F.col(timeCol),
        F.col(valueCol).as("_rv"), F.col(timeCol).cast("long").as("_rt"))
      .withColumn("_side", F.lit(0))
    val cols = Seq(keyCol, timeCol, "_side", "_rv", "_rt")
    val unioned = lTag.select(
        (lTag.columns.filter(cols.contains).map(F.col) ++
          lTag.columns.filterNot(cols.contains).map(F.col)).toIndexedSeq: _*)
      .unionByName(rTag.select(cols.map(F.col): _*), allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal time: "at or
    // before" semantics
    val w = Window.partitionBy(F.col(keyCol))
      .orderBy(F.col(timeCol), F.col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = unioned
      .withColumn(s"asof_$valueCol", F.last(F.col("_rv"), ignoreNulls = true).over(w))
      .withColumn(s"asof_$timeCol", F.last(F.col("_rt"), ignoreNulls = true).over(w))
      .filter(F.col("_side") === 1)
      .drop("_side", "_rv", "_rt")
    tolerance.fold(base) { tol =>
      // tolerance is a post-window projection, not a join change: the
      // carry-forward already found the nearest prior row, so a stale
      // match simply nulls (exact long arithmetic, no float distance)
      val ok = F.col(s"asof_$timeCol").isNotNull &&
        F.col(timeCol).cast("long") - F.col(s"asof_$timeCol") <= tol
      base
        .withColumn(s"asof_$valueCol", F.when(ok, F.col(s"asof_$valueCol")))
        .withColumn(s"asof_$timeCol", F.when(ok, F.col(s"asof_$timeCol")))
    }
  }
}
