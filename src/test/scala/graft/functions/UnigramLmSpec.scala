package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the unigram-LM segmentation: Viterbi against exhaustive
  * enumeration (the minimum of a totally ordered integer objective is
  * unique, so the DP and brute force must agree exactly), the
  * distributed vocab/bits construction against the pure-Scala replay
  * the verify-time oracle uses, and the coverage guarantee. */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Brute force: enumerate every segmentation into vocab pieces,
    * minimize (bits, pieces). */
  private def bruteBest(word: String, bits: Map[String, Long],
      maxLen: Int): Option[(Int, Long)] = {
    def segs(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to math.min(maxLen, s.length)).flatMap { l =>
        val h = s.substring(0, l)
        if (bits.contains(h)) segs(s.substring(l)).map(h :: _) else Nil
      }
    val all = segs(word)
    if (all.isEmpty) None
    else Some(all.map(p => (p.map(bits).sum, p.length))
      .min(Ordering.Tuple2[Long, Int])).map { case (b, n) => (n, b) }
  }

  test("viterbi matches exhaustive enumeration on random words") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 50) {
      val alphabet = "abcd"
      val word = (0 until (1 + rnd.nextInt(10)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // random vocab: all chars + random multi-char pieces, random bits
      val multis = (1 to 8).map { _ =>
        val len = 2 + rnd.nextInt(3)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val bits = (alphabet.map(_.toString) ++ multis).distinct
        .map(p => p -> (1L + rnd.nextInt(10))).toMap
      val got = UnigramLm.viterbi(word, bits, maxLen = 4)
      assert(Some(got) === bruteBest(word, bits, 4), s"trial $trial '$word'")
    }
  }

  test("distributed vocab + bitsTable equals the pure-Scala replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val words = (1 to 120).map { _ =>
      val w = (0 until (2 + rnd.nextInt(8)))
        .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      w
    }.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val df = words.toDF("word", "cnt")
    val distBits = UnigramLm.bitsTable(UnigramLm.vocab(spark, df))
    val refBits = UnigramLm.refVocabBits(words)
    assert(distBits === refBits)
  }

  test("coverage: every word over the vocab's alphabet segments, and " +
      "a frequent multi-char piece lowers the bit cost") {
    import spark.implicits._
    // 'ab' dominates: it must enter the vocab and win over a+b
    val words = Seq(("ababab", 50L), ("cd", 3L), ("abcd", 5L))
    val bits = UnigramLm.bitsTable(
      UnigramLm.vocab(spark, words.toDF("word", "cnt")))
    assert(bits.contains("ab"))
    assert(bits.contains("abab"), "maxLen-4 substrings are candidates too")
    val (npAb, _) = UnigramLm.viterbi("ababab", bits)
    assert(npAb === 2, "ababab must segment as abab|ab, never char-by-char")
    // any word over {a,b,c,d} segments (single-char coverage): 'dd'
    // is a substring of no corpus word, so this one goes char-by-char
    val (np, b) = UnigramLm.viterbi("dddd", bits)
    assert(np === 4 && b >= 0)
    assertThrows[IllegalArgumentException] {
      UnigramLm.viterbi("xyz", bits) // alphabet miss fails fast
    }
  }
}
