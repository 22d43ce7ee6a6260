package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sfDir

  test("reference trainer reproduces the classic hand-checked merges") {
    // Hugging Face course example: corpus {hug:10, pug:5, pun:12,
    // bun:4, hugs:5}. Pair counts round 1: (u,g)=20, (u,n)=16,
    // (h,u)=15, (p,u)=17 ... → first merge (u,g); then (u,n)=16;
    // then (h,ug)=15.
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hugs", 5L))
    val m = Bpe.trainRef(words, 3)
    assert(m(0).left === "u" && m(0).right === "g" && m(0).count === 20L)
    assert(m(1).left === "u" && m(1).right === "n" && m(1).count === 16L)
    assert(m(2).left === "h" && m(2).right === "ug" && m(2).count === 15L)
  }

  test("distributed trainer matches the reference on the corpus") {
    import spark.implicits._
    val words = TextDedup.withTokens(graft.core.Tables.documents(spark, d))
      .select(explode(col("w")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val dist = Bpe.trainMerges(spark, words, numMerges = 6)
    val local = Bpe.trainRef(
      words.as[(String, Long)].collect().toSeq.sortBy(_._1), 6)
    assert(dist === local)
  }

  test("applying merges compresses and round-trips") {
    val words = Seq(("banana", 3L), ("bandana", 2L), ("cabana", 1L))
    val m = Bpe.trainRef(words, 4)
    words.foreach { case (w, _) =>
      val toks = Bpe.applyMerges(w, m)
      assert(toks.mkString === w, "concatenation must reconstruct the word")
      assert(toks.length <= w.length)
    }
    // at least one multi-char symbol must have been learned
    assert(Bpe.applyMerges("banana", m).exists(_.length > 1))
  }

  test("distributed tokenization totals match a driver-side replay") {
    import spark.implicits._
    val got = graft.queries.Registry.queries("bpe_tokenize")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = TextDedup.withTokens(graft.core.Tables.documents(spark, d))
      .select(col("source"), col("w")).as[(String, Seq[String])].collect()
    val wordCounts = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val merges = Bpe.trainRef(wordCounts.sortBy(_._1), 8)
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val ws = rows.flatMap(_._2)
      src -> (ws.length.toLong,
        ws.map(w => Bpe.applyMerges(w, merges).length.toLong).sum)
    }
    assert(got === want)
  }

  test("greedy left-to-right merge handles overlapping pairs") {
    assert(Bpe.mergeOnce(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.mergeOnce(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(Bpe.mergeOnce(Seq("x"), "a", "b") === Seq("x"))
    assert(Bpe.mergeOnce(Nil, "a", "b") === Nil)
  }
}
