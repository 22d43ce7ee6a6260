package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's native bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the codegen'd
  * kernels behind runtime row-level filtering), surfaced as SQL
  * functions the way `cosine_sim` is. Spark keeps them out of the
  * public registry because the optimizer injects them itself; a
  * decontamination pipeline wants them EXPLICITLY: build a ~1 MB
  * sketch of the benchmark fingerprint set once, broadcast it as a
  * literal, and drop ~all clean rows map-side before any join — the
  * exact verify then touches only the suspected sliver.
  *
  *  - `graft_bloom_agg(fp, estimatedItems, numBits)` → BINARY sketch
  *    (input must be BIGINT — fingerprint with xxhash64 first);
  *  - `graft_might_contain(sketchLiteral, fp)` → BOOLEAN (the sketch
  *    argument must be foldable, e.g. an X'..' literal).
  */
object BloomFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", {
        case Seq(c) => new BloomFilterAggregate(c).toAggregateExpression()
        case Seq(c, n) =>
          new BloomFilterAggregate(c, n).toAggregateExpression()
        case Seq(c, n, b) =>
          new BloomFilterAggregate(c, n, b).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"graft_bloom_agg takes 1-3 arguments, got ${other.length}")
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
  }

  /** Hex literal for embedding a collected sketch into expr() text —
    * fine for SQL-surface use at modest sketch sizes; the Column form
    * below avoids re-parsing megabytes of hex when sketches grow. */
  def sketchLiteral(bytes: Array[Byte]): String =
    "X'" + bytes.map("%02x".format(_)).mkString + "'"

  /** Probe expression text with the sketch as a SCALAR SUBQUERY over a
    * temp view ("SELECT <col> FROM <view>") — `BloomFilterMightContain`
    * accepts a scalar subquery in the sketch slot, so the sketch never
    * round-trips through the driver or the SQL text at all: the
    * aggregate runs distributed and feeds the filter as a one-row
    * broadcast. The form a 100 TB decontamination pass uses when the
    * sketch is tens of MB. */
  def mightContainViaView(sketchView: String, sketchCol: String,
      valueExprText: String): String =
    s"graft_might_contain((SELECT $sketchCol FROM $sketchView), $valueExprText)"
}
