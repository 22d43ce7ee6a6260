package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Topology tests for the iterative min-label CC operator — the dedup
  * corpus only produces shallow near-clique components, so the long
  * chain (diameter ≫ 1, many propagation rounds) and mixed topologies
  * are pinned here instead. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("long chain converges to the minimum end label") {
    // path 0-1-2-...-19: diameter 19 forces many propagation rounds
    val labels = cc((0L until 19L).map(i => (i, i + 1)))
    assert(labels.keySet === (0L to 19L).toSet)
    assert(labels.values.toSet === Set(0L))
  }

  test("mixed topologies resolve independently in one run") {
    val star = (101L to 110L).map(leaf => (100L, leaf))
    val cliqueA = for {
      x <- 200L to 203L; y <- 200L to 203L if x < y } yield (x, y)
    val cliqueB = for {
      x <- 300L to 302L; y <- 300L to 302L if x < y } yield (x, y)
    val chain = Seq((400L, 401L), (401L, 402L), (402L, 403L))
    val labels = cc(star ++ cliqueA ++ cliqueB ++ chain)
    assert((101L to 110L).forall(labels(_) == 100L) && labels(100L) == 100L)
    assert((200L to 203L).forall(labels(_) == 200L))
    assert((300L to 302L).forall(labels(_) == 300L))
    assert((400L to 403L).forall(labels(_) == 400L))
  }

  test("edge direction does not matter") {
    assert(cc(Seq((5L, 3L), (3L, 9L))) === Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }

  private def ccStar(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (df, rounds) =
      ConnectedComponents.runStarWithRounds(spark, edges.toDF("src", "dst"))
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("star contraction matches propagation on mixed topologies") {
    val star = (101L to 110L).map(leaf => (100L, leaf))
    val cliqueA = for {
      x <- 200L to 203L; y <- 200L to 203L if x < y } yield (x, y)
    val chain = Seq((400L, 401L), (401L, 402L), (402L, 403L))
    val edges = star ++ cliqueA ++ chain
    assert(ccStar(edges)._1 === cc(edges))
  }

  test("star contraction needs O(log n) rounds on a long chain") {
    // path of 257 nodes: diameter 256. Propagation would need ~256
    // rounds; star contraction halves component height per round pair.
    val (labels, rounds) = ccStar((0L until 256L).map(i => (i, i + 1)))
    assert(labels.keySet === (0L to 256L).toSet)
    assert(labels.values.toSet === Set(0L))
    assert(rounds <= 12, s"expected O(log n) rounds, took $rounds")
  }

  test("star contraction handles single edges and reversed input") {
    assert(ccStar(Seq((5L, 3L), (3L, 9L)))._1 ===
      Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
    assert(ccStar(Seq((7L, 2L)))._1 === Map(2L -> 2L, 7L -> 2L))
  }
}
