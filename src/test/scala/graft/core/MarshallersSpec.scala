package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

case class MarshalP(a: Long, b: String)

class MarshallersSpec extends AnyFunSuite {
  private def holds(p: Prop): Unit =
    assert(check(Parameters.default.withMinSuccessfulTests(500), p).passed)

  private val anyLong = Gen.chooseNum(Long.MinValue, Long.MaxValue)

  test("ordered-bytes long encoding round-trips") {
    holds(Prop.forAll(anyLong) { x =>
      Marshallers.orderedBytesToLong(Marshallers.longToOrderedBytes(x)) == x
    })
  }

  test("byte-lexicographic order equals numeric order (the sign-flip trick)") {
    holds(Prop.forAll(anyLong, anyLong) { (a, b) =>
      val cmp = Marshallers.compareUnsignedLex(
        Marshallers.longToOrderedBytes(a), Marshallers.longToOrderedBytes(b))
      math.signum(cmp.toLong) == math.signum(java.lang.Long.compare(a, b).toLong)
    })
  }

  test("known boundary encodings") {
    assert(Marshallers.longToOrderedBytes(Long.MinValue).forall(_ == 0))
    assert(Marshallers.longToOrderedBytes(-1L) ===
      Array[Byte](0x7f, -1, -1, -1, -1, -1, -1, -1))
    assert(Marshallers.longToOrderedBytes(0L) ===
      Array[Byte](Byte.MinValue, 0, 0, 0, 0, 0, 0, 0))
  }

  test("encoders cover the reference's marshaller surface") {
    assert(Marshallers.string.schema.fields.length === 1)
    assert(Marshallers.long.clsTag.runtimeClass === classOf[Long])
    // product encoder reflects the case-class schema (BigQuery-style)
    assert(graft.sinks.Outputs.derivedSchema[MarshalP].fieldNames === Array("a", "b"))
  }
}
