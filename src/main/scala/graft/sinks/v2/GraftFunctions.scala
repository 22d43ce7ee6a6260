package graft.sinks.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The store's BUCKET function, served through the catalog's
  * `FunctionCatalog` face so Catalyst can reason about the store's
  * physical layout: when [[GraftRowScan]] reports
  * `KeyGroupedPartitioning(bucket(n, key))`, Spark resolves the
  * transform by loading THIS function from the table's catalog and
  * compares both join sides by its `canonicalName` — two store tables
  * with the same bucket count cluster identically, so a key equi join
  * between them needs NO shuffle (the storage-partitioned join,
  * Spark's v2 evolution of bucketed joins; the same contract Iceberg's
  * function catalog serves).
  *
  * The semantics ARE the store's placement rule
  * (`KeyedTable.scala:29`): `pmod(xxhash64(key), n)` with xxhash64's
  * default seed, hashed under the KEY COLUMN'S OWN physical type —
  * `produceResult` must agree with the layout on disk or a
  * partition-aware plan would read the wrong buckets. A spec pins this
  * function against the store's own `bucketOf` column for every
  * supported key type. */
class GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): the versioned store's placement rule — " +
      "pmod(xxhash64(key), n) under the key's own type"

  /** Bound against `(numBuckets: int, key: <keyType>)` — the argument
    * shape of the `bucket(n, col)` transform. */
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket(n, key) takes 2 arguments, got ${inputType.length}")
    val nType = inputType.fields(0).dataType
    require(nType == IntegerType || nType == LongType,
      s"bucket count must be integral, got $nType")
    inputType.fields(1).dataType match {
      case t @ (LongType | IntegerType | ShortType | ByteType |
          StringType | DateType | TimestampType) =>
        new GraftBucketBound(t)
      case other => throw new UnsupportedOperationException(
        s"the store does not bucket by $other keys")
    }
  }
}

class GraftBucketBound(keyType: DataType) extends ScalarFunction[Integer] {
  override def name(): String = "bucket"

  /** The compatibility token: EnsureRequirements treats two
    * TransformExpressions as the same function iff their
    * canonicalNames match. The key type is part of the identity
    * because xxhash64 is physical-type-sensitive — hash(5: Int) !=
    * hash(5: Long), so an Int-keyed and a Long-keyed table do NOT
    * cluster identically even at equal bucket counts. */
  override def canonicalName(): String =
    s"graft.bucket(xxhash64, ${keyType.typeName})"

  override def inputTypes(): Array[DataType] =
    Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // hash under the key's OWN type — exactly what the SQL
    // xxhash64(col) in the store's bucketOf computes
    val h = keyType match {
      case LongType => XxHash64Function.hash(input.getLong(1), LongType, 42L)
      case IntegerType =>
        XxHash64Function.hash(input.getInt(1), IntegerType, 42L)
      case ShortType =>
        XxHash64Function.hash(input.getShort(1), ShortType, 42L)
      case ByteType => XxHash64Function.hash(input.getByte(1), ByteType, 42L)
      case StringType =>
        XxHash64Function.hash(input.getUTF8String(1), StringType, 42L)
      case DateType => XxHash64Function.hash(input.getInt(1), DateType, 42L)
      case TimestampType =>
        XxHash64Function.hash(input.getLong(1), TimestampType, 42L)
      case other => throw new IllegalStateException(s"unbindable $other")
    }
    (((h % n) + n) % n).toInt
  }
}
