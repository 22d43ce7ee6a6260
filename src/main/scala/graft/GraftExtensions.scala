package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.CosineSimilarity

/** Session-extension wiring: load graft's native functions into any
  * SparkSession via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`),
  * making them available to pure-SQL users cluster-wide — the
  * deployment path a shared 1000-executor cluster uses, as opposed to
  * the per-session `VectorExpressions.register` convenience. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  /** The injected function descriptors (identifier, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_sim takes two ARRAY<FLOAT> args")
        CosineSimilarity(exprs(0), exprs(1))
      }),
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => new BloomFilterAggregate(c).toAggregateExpression()
        case Seq(c, n) =>
          new BloomFilterAggregate(c, n).toAggregateExpression()
        case Seq(c, n, b) =>
          new BloomFilterAggregate(c, n, b).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"graft_bloom_agg takes 1-3 arguments, got ${other.length}")
      }),
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "graft_might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "graft_might_contain takes (sketch, value)")
        BloomFilterMightContain(exprs(0), exprs(1))
      }))
}
