package graft.core

import org.apache.spark.sql.{Encoder, Encoders}
import scala.reflect.ClassTag
import scala.reflect.runtime.universe.TypeTag

/** Marshaller → Encoder parity (reference Marshaller.java /
  * Marshallers.java:33-285; SURVEY.md §1.2-1.3).
  *
  * The reference's typed serde surface maps onto Spark Encoders:
  *  - built-in primitives → Encoders.scalaX (Tungsten-native)
  *  - POJO/Jackson JSON marshaller → Encoders.product (case classes)
  *  - Java-serialization fallback → Encoders.kryo / javaSerialization
  *
  * The reference's one clever trick — sign-flipped big-endian numeric
  * encoding so byte-lexicographic order equals numeric order
  * (Marshallers.java:86-145, "xor … to get an unsigned representation
  * that sorts lexicographically") — is unnecessary in Spark (typed sort,
  * UnsafeRow prefix comparators), but provided here for byte-level
  * parity with reference-written data.
  */
object Marshallers {
  def string: Encoder[String] = Encoders.STRING
  def long: Encoder[Long] = Encoders.scalaLong
  def int: Encoder[Int] = Encoders.scalaInt
  def double: Encoder[Double] = Encoders.scalaDouble
  def bytes: Encoder[Array[Byte]] = Encoders.BINARY
  def product[T <: Product: TypeTag]: Encoder[T] = Encoders.product[T]
  def fallback[T: ClassTag]: Encoder[T] = Encoders.kryo[T]

  /** Order-preserving long encoding: big-endian bytes of (x XOR MinValue)
    * — unsigned byte-lexicographic comparison equals numeric order
    * (Marshallers.java:92). */
  def longToOrderedBytes(x: Long): Array[Byte] = {
    val flipped = x ^ Long.MinValue
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (flipped >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  def orderedBytesToLong(b: Array[Byte]): Long = {
    require(b.length == 8, s"expected 8 bytes, got ${b.length}")
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (b(i) & 0xffL); i += 1 }
    acc ^ Long.MinValue
  }

  /** Unsigned lexicographic byte comparison — the ordering the
    * reference's whole sort/merge pipeline uses
    * (impl/sort/LexicographicalComparator.java, Shuffling.java:40-44). */
  def compareUnsignedLex(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }
}
