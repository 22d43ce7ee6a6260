package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates" — the SentencePiece unigram model),
  * completing the tokenizer family next to [[Bpe]]: where BPE builds
  * tokens bottom-up by greedy merges, the unigram model scores every
  * segmentation of a word under piece probabilities and takes the
  * Viterbi-best one.
  *
  * Engine-exact surrogate: true unigram training is float EM; this
  * operator fixes the vocabulary DETERMINISTICALLY (all single
  * characters for guaranteed coverage + the top-V multi-char
  * substrings by weighted occurrence count, count-desc / UTF-8-binary
  * tie-break — the same collation as the distributed `orderBy`) and
  * prices each piece with the floor-log2-bits integer surrogate of
  * `text_lm_surprisal`: bits(p) = floor(log2(total / cnt(p))), i.e.
  * the bit length of the integer quotient. Viterbi then minimizes
  * (total bits, piece count) — a totally ordered objective whose
  * minimum is unique, so the segmentation report is deterministic in
  * both engines with zero float boundaries.
  *
  * Scale architecture (the [[Bpe]] one): the only corpus-scale passes
  * are the word-count aggregate and the final join of per-TYPE piece
  * counts back onto the token stream, both keyed on the word. Vocab
  * candidates explode substrings of word TYPES (compact relation),
  * the top-V selection is a TakeOrderedAndProject (only V rows reach
  * the driver), and Viterbi runs once per word type with the
  * ≤ (V + alphabet)-entry bits table broadcast.
  */
object UnigramLm {

  val DefaultMaxLen = 4
  val DefaultTopV = 64

  /** Weighted substring occurrences over the word-TYPE table: every
    * (overlapping) substring of length 1..maxLen of each word type,
    * weighted by the type's corpus count. Compact-relation explode —
    * never corpus-scale. */
  def substringCounts(spark: SparkSession, words: DataFrame,
      maxLen: Int = DefaultMaxLen): DataFrame = {
    import spark.implicits._
    words.select(col("word"), col("cnt")).as[(String, Long)]
      .flatMap { case (w, c) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(maxLen, w.length - i)
        } yield (w.substring(i, i + l), l, c)
      }
      .toDF("s", "len", "c")
      .groupBy(col("s"), col("len"))
      .agg(sum(col("c")).as("cnt"))
  }

  /** The deterministic vocab: every single character (coverage
    * guarantee — any word over the corpus alphabet segments) plus the
    * top-V multi-char substrings by (cnt desc, piece asc in UTF-8
    * binary order). Returns (piece, cnt) pairs. */
  def vocab(spark: SparkSession, words: DataFrame,
      topV: Int = DefaultTopV, maxLen: Int = DefaultMaxLen)
      : Seq[(String, Long)] = {
    val sub = substringCounts(spark, words, maxLen).localCheckpoint(true)
    val chars = sub.filter(col("len") === 1)
      .select(col("s"), col("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val multi = sub.filter(col("len") >= 2)
      .orderBy(col("cnt").desc, col("s"))
      .limit(topV)
      .select(col("s"), col("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    (chars ++ multi).toSeq
  }

  /** Integer piece costs: bits(p) = bit_length(total / cnt(p)) - 1 =
    * floor(log2(total / cnt(p))), total = Σ cnt over the vocab — the
    * `length(bin(den // num)) - 1` trick, driver-side. */
  def bitsTable(pieces: Seq[(String, Long)]): Map[String, Long] = {
    require(pieces.nonEmpty, "empty vocabulary")
    val total = pieces.iterator.map(_._2).sum
    pieces.iterator.map { case (p, c) =>
      p -> (63L - java.lang.Long.numberOfLeadingZeros(total / c))
    }.toMap
  }

  /** Viterbi-best segmentation of one word: minimize total bits, then
    * piece count (both integer; the minimum is unique). Returns
    * (n_pieces, total_bits). Requires every character of the word in
    * the table (the vocab rule guarantees it for corpus words). */
  def viterbi(word: String, bits: Map[String, Long],
      maxLen: Int = DefaultMaxLen): (Int, Long) = {
    val n = word.length
    if (n == 0) return (0, 0L)
    // dp(i) = best (bits, pieces) for the prefix of length i
    val dpBits = Array.fill(n + 1)(Long.MaxValue)
    val dpPieces = Array.fill(n + 1)(Int.MaxValue)
    dpBits(0) = 0L; dpPieces(0) = 0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        val j = i - l
        if (dpBits(j) != Long.MaxValue) {
          bits.get(word.substring(j, i)) match {
            case Some(b) =>
              val nb = dpBits(j) + b
              val np = dpPieces(j) + 1
              if (nb < dpBits(i) || (nb == dpBits(i) && np < dpPieces(i))) {
                dpBits(i) = nb; dpPieces(i) = np
              }
            case None =>
          }
        }
        l += 1
      }
      i += 1
    }
    require(dpBits(n) != Long.MaxValue,
      s"unsegmentable word '$word' — vocab is missing a character")
    (dpPieces(n), dpBits(n))
  }

  /** Independent driver-side replay of the vocab + bits construction
    * for the verify-time oracle (the [[Bpe.trainRef]] pattern): pure
    * Scala loops over a (word, cnt) table, same top-V rule with the
    * UTF-8-binary tie-break the distributed `orderBy` uses. */
  def refVocabBits(wordCounts: Seq[(String, Long)],
      topV: Int = DefaultTopV, maxLen: Int = DefaultMaxLen)
      : Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap[String, Long]()
    wordCounts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val lMax = math.min(maxLen, w.length - i)
        while (l <= lMax) {
          val s = w.substring(i, i + l)
          counts(s) = counts.getOrElse(s, 0L) + c
          l += 1
        }
        i += 1
      }
    }
    val (chars, multi) = counts.toSeq.partition(_._1.length == 1)
    val top = multi.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2
      else Bpe.utf8Compare(a._1, b._1) < 0
    }.take(topV)
    bitsTable(chars ++ top)
  }
}
