package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece subword segmentation (Wu et al. 2016, "Google's Neural
  * Machine Translation System" — the BERT tokenizer): greedy
  * LONGEST-MATCH-FIRST against a fixed vocab whose continuation
  * pieces are namespaced apart from word-initial pieces (the "##"
  * convention). Completes the tokenizer family: BPE builds bottom-up
  * by merges, unigram-LM optimizes globally by Viterbi, WordPiece
  * scans greedily — three different inductive biases over the same
  * word-TYPE architecture.
  *
  * Deterministic vocab (no likelihood training, same spirit as
  * [[UnigramLm]]): every single character in BOTH namespaces
  * (coverage guarantee) + the top-V multi-char pieces per namespace
  * by weighted occurrence count (count desc, UTF-8-binary piece
  * tie-break — the distributed `orderBy` collation). A piece is
  * word-initial when its occurrence starts at offset 0 of the word,
  * continuation otherwise; the two counts are disjoint namespaces
  * exactly as in the published scheme.
  *
  * Greedy matching is a pure function of the vocab sets, so the
  * result is engine-exact with zero float anywhere. Scale shape: the
  * corpus-scale passes are the word-count aggregate and one join
  * keyed on the word; vocab selection explodes substrings of word
  * TYPES (compact); matching runs once per word type with the
  * bounded vocab broadcast.
  */
object Wordpiece {

  val DefaultMaxLen = 4
  val DefaultTopV = 64

  /** (piece, isInitial, weighted count) over the word-TYPE table. */
  def pieceCounts(spark: SparkSession, words: DataFrame,
      maxLen: Int = DefaultMaxLen): DataFrame = {
    import spark.implicits._
    words.select(col("word"), col("cnt")).as[(String, Long)]
      .flatMap { case (w, c) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(maxLen, w.length - i)
        } yield (w.substring(i, i + l), i == 0, c)
      }
      .toDF("p", "initial", "c")
      .groupBy(col("p"), col("initial"))
      .agg(sum(col("c")).as("cnt"))
  }

  /** The deterministic two-namespace vocab: (initialPieces,
    * continuationPieces), each = all its single chars + its top-V
    * multi-char pieces. */
  def vocab(spark: SparkSession, words: DataFrame,
      topV: Int = DefaultTopV, maxLen: Int = DefaultMaxLen)
      : (Set[String], Set[String]) = {
    val pc = pieceCounts(spark, words, maxLen).localCheckpoint(true)
    def side(initial: Boolean): Set[String] = {
      val base = pc.filter(col("initial") === initial)
      val chars = base.filter(length(col("p")) === 1)
        .select(col("p")).collect().map(_.getString(0))
      val multi = base.filter(length(col("p")) >= 2)
        .orderBy(col("cnt").desc, col("p"))
        .limit(topV)
        .select(col("p")).collect().map(_.getString(0))
      (chars ++ multi).toSet
    }
    (side(true), side(false))
  }

  /** Greedy longest-match-first segmentation: (n_pieces, longest piece
    * length used). Single-char coverage makes every corpus word
    * segmentable; fails fast otherwise. */
  def segment(word: String, initial: Set[String], cont: Set[String],
      maxLen: Int = DefaultMaxLen): (Int, Int) = {
    var i = 0
    var n = 0
    var longest = 0
    while (i < word.length) {
      val ns = if (i == 0) initial else cont
      var l = math.min(maxLen, word.length - i)
      while (l > 0 && !ns.contains(word.substring(i, i + l))) l -= 1
      require(l > 0,
        s"unsegmentable word '$word' at $i — vocab is missing a character")
      n += 1
      if (l > longest) longest = l
      i += l
    }
    (n, longest)
  }

  /** Independent pure-Scala replay of the vocab construction for the
    * verify-time oracle (the Bpe.trainRef pattern). */
  def refVocab(wordCounts: Seq[(String, Long)],
      topV: Int = DefaultTopV, maxLen: Int = DefaultMaxLen)
      : (Set[String], Set[String]) = {
    val counts =
      scala.collection.mutable.HashMap[(String, Boolean), Long]()
    wordCounts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val lMax = math.min(maxLen, w.length - i)
        while (l <= lMax) {
          val k = (w.substring(i, i + l), i == 0)
          counts(k) = counts.getOrElse(k, 0L) + c
          l += 1
        }
        i += 1
      }
    }
    def side(initial: Boolean): Set[String] = {
      val mine = counts.collect {
        case ((p, ini), c) if ini == initial => (p, c)
      }.toSeq
      val chars = mine.collect { case (p, _) if p.length == 1 => p }
      val multi = mine.filter(_._1.length >= 2).sortWith { (a, b) =>
        if (a._2 != b._2) a._2 > b._2
        else Bpe.utf8Compare(a._1, b._1) < 0
      }.take(topV).map(_._1)
      (chars ++ multi).toSet
    }
    (side(true), side(false))
  }
}
