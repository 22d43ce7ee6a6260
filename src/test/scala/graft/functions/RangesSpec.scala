package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import java.sql.Timestamp

class RangesSpec extends AnyFunSuite {
  private def holds(p: Prop): Unit =
    assert(check(Parameters.default.withMinSuccessfulTests(300), p).passed)

  test("splitLong is contiguous, exhaustive, non-overlapping") {
    val lohi = for {
      lo <- Gen.chooseNum(-100000L, 100000L)
      span <- Gen.chooseNum(0L, 100000L)
      n <- Gen.chooseNum(1, 64)
    } yield (lo, lo + span, n)
    holds(Prop.forAll(lohi) { case (lo, hi, n) =>
      val rs = Ranges.splitLong(lo, hi, n)
      val contiguous = rs.zip(rs.drop(1)).forall { case (a, b) => a._2 == b._1 }
      val covers = rs.isEmpty && lo == hi ||
        (rs.nonEmpty && rs.head._1 == lo && rs.last._2 == hi)
      val balanced = rs.isEmpty ||
        rs.map(r => r._2 - r._1).max - rs.map(r => r._2 - r._1).min <= 1
      contiguous && covers && balanced
    })
  }

  test("splitTimestamp lands on whole seconds and covers the range") {
    val lo = Timestamp.valueOf("2024-01-01 00:00:00")
    val hi = Timestamp.valueOf("2024-01-31 00:00:00")
    val rs = Ranges.splitTimestamp(lo, hi, 7)
    assert(rs.head._1 === lo && rs.last._2 === hi)
    assert(rs.forall { case (a, b) =>
      a.getTime % 1000 == 0 && b.getTime % 1000 == 0 })
    assert(rs.zip(rs.drop(1)).forall { case (a, b) => a._2 == b._1 })
  }

  test("splitString bounds are monotone and preserve endpoints") {
    val rs = Ranges.splitString("aaa", "zzz", 8)
    assert(rs.head._1 === "aaa" && rs.last._2 === "zzz")
    val bounds = rs.map(_._1) :+ rs.last._2
    assert(bounds === bounds.sorted)
    assert(rs.size === 8)
  }

  test("oversplitRoundRobin deals every subrange exactly once") {
    val dealt = Ranges.oversplitRoundRobin(0, 1000, shards = 5, oversplitFactor = 4)
    assert(dealt.size === 5)
    val all = dealt.flatten.sortBy(_._1)
    assert(all === Ranges.splitLong(0, 1000, 20))
    // each shard got non-adjacent subranges (the skew-spreading property)
    dealt.foreach { shard =>
      shard.zip(shard.drop(1)).foreach { case (a, b) =>
        assert(a._2 < b._1, "round-robin must interleave, not chunk")
      }
    }
  }

  test("splitDouble covers endpoints") {
    val rs = Ranges.splitDouble(0.0, 1.0, 4)
    assert(rs.head._1 === 0.0 && rs.last._2 === 1.0)
    assert(rs.size === 4)
  }
}
