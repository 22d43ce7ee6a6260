package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as an algebraic aggregate.
  *
  * The window-rank form (`row_number over (partition by g order by s
  * desc) <= k`) must shuffle EVERY row to its group's partition and
  * sort the whole group. This operator keeps a k-bounded buffer
  * instead: Spark splits the Aggregator into partial/final around the
  * exchange, so each map task sends at most k rows per group across
  * the wire and nothing is ever globally sorted — O(n log k) work,
  * shuffle volume k·groups instead of n. At 100 TB with k=2 that is
  * the difference between shuffling the fact table and shuffling a
  * dimension-sized result.
  *
  * Ordering is (score desc, payload asc) — the payload doubles as the
  * deterministic tiebreak, same contract as the window-rank queries.
  */
object TopK {

  private def insert(buf: List[(Long, Long)], v: (Long, Long),
      k: Int): List[(Long, Long)] = {
    // descending score, ascending payload on ties
    val lt = (a: (Long, Long), b: (Long, Long)) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    val (pre, post) = buf.span(lt(_, v))
    val merged = pre ::: (v :: post)
    if (merged.length > k) merged.take(k) else merged
  }

  private final class TopKAgg(k: Int)
      extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {
    def zero: List[(Long, Long)] = Nil
    def reduce(b: List[(Long, Long)], in: (Long, Long)): List[(Long, Long)] =
      insert(b, in, k)
    def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
      b.foldLeft(a)((acc, v) => insert(acc, v, k))
    def finish(r: List[(Long, Long)]): Seq[(Long, Long)] = r
    def bufferEncoder: Encoder[List[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Top-k (payload, score) rows per group key.
    *
    * @param df       input
    * @param groupCol grouping column (any type; carried through)
    * @param scoreCol LONG score column (rank by score desc)
    * @param payloadCol LONG payload/id column (ascending tiebreak)
    * @param k        bound
    * @return (groupCol, payload, score, rn) — rn 1-based in rank order
    */
  def perGroup(df: DataFrame, groupCol: String, scoreCol: String,
      payloadCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(col(groupCol).cast("string").as("g"),
        col(scoreCol).cast("long").as("s"), col(payloadCol).cast("long").as("p"))
      .as[(String, Long, Long)]
    val agg = new TopKAgg(k)
    pairs
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (g, top) =>
        top.iterator.zipWithIndex.map { case ((s, p), i) =>
          (g, p, s, (i + 1).toLong)
        }
      }
      .toDF(groupCol, payloadCol, scoreCol, "rn")
  }
}
