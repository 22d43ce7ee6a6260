package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-induction step of
  * a training-data pipeline (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units").
  *
  * Scale architecture: BPE trains on the word-TYPE frequency table,
  * not the corpus — the only corpus-scale pass is the word-count
  * aggregate (one shuffle). Every merge round then runs over the
  * compact (symbols, count) relation: adjacent-pair counting is a
  * codegen'd `transform` + explode + one aggregate, the global argmax
  * is a 1-row `orderBy.limit(1)` (TakeOrderedAndProject — only the
  * winning pair ever reaches the driver), and the merge application
  * is a typed map over word types. Lineage is truncated per round
  * with localCheckpoint (same discipline as [[ConnectedComponents]]).
  * Determinism: ties break lexicographically on (left, right), so the
  * merge table is a pure function of the corpus.
  */
object Bpe {

  /** One learned rule: `rank`-th merge, joining `left`+`right`, which
    * had weighted adjacent-pair count `count` when chosen. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** (word, cnt) → (syms: array of 1-char symbols, cnt). */
  def symbolize(words: DataFrame): DataFrame =
    words.select(
      expr("filter(split(word, ''), x -> x <> '')").as("syms"),
      col("cnt"))

  /** Greedy left-to-right application of one merge to a symbol seq. */
  def mergeOnce(s: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  /** Unsigned UTF-8 byte order — Spark compares strings as UTF8String
    * binary (UTF-8 bytes), which differs from java.lang.String's
    * UTF-16 code-unit order for supplementary characters vs BMP chars
    * >= U+E000. The reference trainer must tie-break the same way the
    * distributed `orderBy` does or the two can learn different merge
    * tables on non-ASCII corpora. */
  def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private val argmaxOrder: Ordering[((String, String), Long)] =
    (p: ((String, String), Long), q: ((String, String), Long)) => {
      val c = java.lang.Long.compare(q._2, p._2) // higher count first
      if (c != 0) c
      else {
        val cl = utf8Compare(p._1._1, q._1._1)
        if (cl != 0) cl else utf8Compare(p._1._2, q._1._2)
      }
    }

  /** Driver-side reference trainer for specs: same argmax + tiebreak
    * (count desc, then left/right in UTF-8 byte order, matching the
    * distributed `orderBy`'s binary collation). */
  def trainRef(words: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var cur: Seq[(Seq[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString): Seq[String], c) }
    (1 to numMerges).flatMap { rank =>
      val counts = scala.collection.mutable.LinkedHashMap[(String, String), Long]()
      cur.foreach { case (s, c) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) None
      else {
        val ((l, r), c) = counts.toSeq.min(argmaxOrder)
        cur = cur.map { case (s, cn) => (mergeOnce(s, l, r), cn) }
        Some(Merge(rank, l, r, c))
      }
    }
  }

  /** Train `numMerges` merges over a (word, cnt) frequency table. */
  def trainMerges(spark: SparkSession, words: DataFrame,
      numMerges: Int): Seq[Merge] = {
    import spark.implicits._
    var cur = symbolize(words).as[(Seq[String], Long)].localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = cur.toDF("syms", "cnt")
        .where(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(syms) - 2)," +
            " i -> struct(syms[i] AS l, syms[i+1] AS r))")).as("p"),
          col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(rank, l, r, c)
        cur = cur.map { case (s, cn) => (mergeOnce(s, l, r), cn) }
          .localCheckpoint(true)
        rank += 1
      }
    }
    out.toSeq
  }

  /** Full application of a merge table (in rank order) to one word. */
  def applyMerges(word: String, merges: Seq[Merge]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) { (s, m) =>
      mergeOnce(s, m.left, m.right)
    }
}
