package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

class ShardersSpec extends AnyFunSuite {

  private def holds(p: Prop): Unit =
    assert(check(Parameters.default.withMinSuccessfulTests(200), p).passed)

  test("divisionShard maps every hash into [0, n)") {
    holds(Prop.forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue)) { h =>
      Seq(1, 2, 3, 7, 32, 100).forall { n =>
        val s = Sharders.divisionShard(h, n); s >= 0 && s < n
      }
    })
  }

  test("divisionShard is range-division, not modulo: contiguous hash " +
    "ranges map to the same shard") {
    // reference semantics (HashingSharder.java:33-39): the 2^32 hash space
    // is divided into n contiguous spans
    val n = 4
    assert(Sharders.divisionShard(Int.MinValue, n) === 0)
    assert(Sharders.divisionShard(-1, n) === 1)
    assert(Sharders.divisionShard(0, n) === 2)
    assert(Sharders.divisionShard(Int.MaxValue, n) === 3)
  }

  test("divisionShard is monotone in the hash") {
    val g = Gen.chooseNum(Int.MinValue, Int.MaxValue)
    holds(Prop.forAll(g, g) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      Sharders.divisionShard(lo, 16) <= Sharders.divisionShard(hi, 16)
    })
  }

  test("HashingSharder partitions keys stably and in range") {
    val p = new Sharders.HashingSharder(8)
    assert(p.numPartitions === 8)
    for (k <- Seq("a", "b", "key-123", 42L.asInstanceOf[AnyRef], "")) {
      val s1 = p.getPartition(k)
      val s2 = p.getPartition(k)
      assert(s1 === s2)
      assert(s1 >= 0 && s1 < 8)
    }
  }

  test("HashingSharder spreads distinct keys over shards") {
    val p = new Sharders.HashingSharder(8)
    val used = (0 until 1000).map(i => p.getPartition(s"key-$i")).toSet
    assert(used.size >= 6) // all-but-degenerate spread
  }
}
