package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LinearClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (doc_id, y, b, cnt) rows incl. the required bias. */
  private def featRows(docs: Seq[(Long, Int, Map[String, Long])]) =
    docs.flatMap { case (d, y, fs) =>
      (fs + ("__bias__" -> 1L)).toSeq.map { case (b, c) => (d, y, b, c) }
    }.toDF("doc_id", "y", "b", "cnt")

  test("pocket perceptron separates a linearly separable task and the " +
      "distributed training matches a driver-side replay exactly") {
    // y = +1 iff feature 'hot' present — separable, and the batch
    // dynamics converge fast on it: after the all-misclassified cold
    // start, w_hot = +|hot| and w_bias = |hot| - |rest| < 0 already
    // separate (hot: w_hot + w_bias > 0; rest: w_bias < 0)
    val docs = (0L until 40L).map { d =>
      val hot = d % 3 == 0
      val fs =
        if (hot) Map("hot" -> 1L) else Map("cold" -> 1L)
      (d, if (hot) 1 else -1, fs)
    }
    val feats = featRows(docs)
    val w = LinearClassifier.trainPocketPerceptron(spark, feats, rounds = 8)
    // every doc correctly classified by the pocket weights
    val scored = LinearClassifier.score(spark, feats, w)
    assert(scored.filter(col("y") * col("margin") <= 0).count() === 0,
      s"separable task must reach zero training mistakes, w=$w")
    // independent driver-side replay of the identical integer rounds
    val full = docs.map { case (d, y, fs) =>
      (d, y, fs + ("__bias__" -> 1L))
    }
    var wr = Map.empty[String, Long]
    var best = wr
    var bestMis = Long.MaxValue
    for (k <- 0 to 8) {
      val mis = full.filter { case (_, y, fs) =>
        y * fs.map { case (b, c) => wr.getOrElse(b, 0L) * c }.sum <= 0
      }
      if (mis.length < bestMis) { bestMis = mis.length; best = wr }
      if (k < 8 && mis.nonEmpty)
        wr = mis.foldLeft(wr) { case (acc, (_, y, fs)) =>
          fs.foldLeft(acc) { case (a, (b, c)) =>
            a + (b -> (a.getOrElse(b, 0L) + y * c))
          }
        }.filter(_._2 != 0L)
    }
    assert(w === best, "distributed pocket weights must equal the replay")
  }

  test("the bias feature is enforced") {
    val noBias = Seq((1L, 1, "f", 2L), (2L, -1, "f", 1L))
      .toDF("doc_id", "y", "b", "cnt")
    val e = intercept[IllegalArgumentException] {
      LinearClassifier.trainPocketPerceptron(spark, noBias, rounds = 2)
    }
    assert(e.getMessage.contains("__bias__"))
  }

  test("pocket beats the final round on an oscillating task") {
    // two identical docs with opposite labels: never separable, the
    // weight vector oscillates; pocket must still return SOME w with
    // at most half the docs wrong (the all-zero w_0 has all wrong
    // because margin 0 counts as a mistake)
    val feats = featRows(Seq(
      (1L, 1, Map("x" -> 3L)), (2L, -1, Map("x" -> 3L)),
      (3L, 1, Map("z" -> 2L))))
    val w = LinearClassifier.trainPocketPerceptron(spark, feats, rounds = 6)
    val mis = LinearClassifier.score(spark, feats, w)
      .filter(col("y") * col("margin") <= 0).count()
    assert(mis <= 1, s"pocket should keep the best round, mis=$mis w=$w")
  }
}
