package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val langs = Seq(
    "de" -> Seq("der", "und"), "en" -> Seq("the", "and"),
    "es" -> Seq("el", "y"))

  private def pred(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("text")
      .withColumn("w", TextDedup.tokens(col("text")))
      .select(TextStats.languageId("w", langs))
      .collect()(0).getString(0)
  }

  test("languageId: clear majority wins") {
    assert(pred("the cat and the dog and the bird") === "en")
    assert(pred("el gato y el perro") === "es")
  }

  test("languageId: ties resolve to the earlier precedence language") {
    // one de hit, one en hit — de is listed first
    assert(pred("der cat the") === "de")
    // en vs es tie — en precedes es
    assert(pred("the el") === "en")
  }

  test("languageId: no stopword hits is 'und'") {
    assert(pred("völlig unbekannte wörter") === "und")
  }

  test("normalize collapses spaces, lowercases, and trims") {
    import spark.implicits._
    val got = Seq("  A  b   C ").toDF("text")
      .select(TextStats.normalize(col("text"))).collect()(0).getString(0)
    assert(got === "a b c")
  }

  test("minFingerprint is identical for identical text, k-sensitive") {
    import spark.implicits._
    val df = Seq(("aaaaabbbbb"), ("aaaaabbbbb"), ("zzzzzyyyyy")).toDF("text")
      .select(TextStats.minFingerprint("text", 5).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }
}
