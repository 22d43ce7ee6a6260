package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins WordPiece greedy longest-match-first segmentation, the
  * two-namespace vocab (initial vs continuation), and the distributed
  * vocab against the pure-Scala replay the oracle uses. */
class WordpieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("greedy longest-match-first: the longest vocab piece at each " +
      "position wins, namespaces are separate") {
    val ini = Set("a", "b", "c", "ab", "abc")
    val cont = Set("a", "b", "c", "bc")
    // 'abcabc': initial 'abc' (longest), then continuation: 'a' ('abc'
    // not in cont), then 'bc' -> 3 pieces, longest 3
    assert(Wordpiece.segment("abcabc", ini, cont) === ((3, 3)))
    // initial namespace only applies at offset 0: 'ab' is initial-only
    assert(Wordpiece.segment("aab", ini, cont) === ((3, 1)))
    // single-char coverage fallback
    assert(Wordpiece.segment("cba", ini, cont) === ((3, 1)))
    assertThrows[IllegalArgumentException] {
      Wordpiece.segment("axb", ini, cont)
    }
  }

  test("distributed vocab equals the pure-Scala replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val words = (1 to 150).map { _ =>
      (0 until (2 + rnd.nextInt(7)))
        .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    }.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val (di, dc) = Wordpiece.vocab(spark, words.toDF("word", "cnt"))
    val (ri, rc) = Wordpiece.refVocab(words)
    assert(di === ri)
    assert(dc === rc)
  }

  test("namespacing matters: a piece frequent only word-internally " +
      "enters the continuation vocab, not the initial one") {
    import spark.implicits._
    // 'zz' occurs only at offsets > 0; 'yz' only at offset 0
    val words = Seq(("yzzz", 40L), ("yzz", 30L), ("x", 5L))
    val (ini, cont) = Wordpiece.vocab(spark, words.toDF("word", "cnt"))
    assert(cont.contains("zz") && cont.contains("zzz"))
    assert(!ini.contains("zz"), "zz never starts a word")
    assert(ini.contains("yz") && !cont.contains("yz"))
    // and segmentation uses them: yzzz = yz|zz (greedy: 'yzzz' len 4
    // in initial? yes — whole word is an initial substring)
    val (np, lg) = Wordpiece.segment("yzzz", ini, cont)
    assert(np === 1 && lg === 4, "whole word is itself a vocab piece")
    // a longer word forces the split into namespaced pieces
    val (np2, _) = Wordpiece.segment("yzzzzz", ini, cont)
    assert(np2 === 2, "yzzz + zz, both from their own namespaces")
  }
}
