package graft.sinks.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared executor-side parquet → [[InternalRow]] reader over the
  * parquet-hadoop Group API, used by every custom DSv2 surface that
  * reads the store's immutable files ([[CdfSource]] partitions,
  * [[GraftCatalog]] scans). Fields resolve BY NAME — absent fields
  * (pre-evolution files) and unset cells read as null; `virtual`
  * columns are constants injected per partition (a commit version, a
  * file provenance tag). Supported types are the keyed store's own:
  * integral, floating, boolean, string, date (INT32 days), timestamp
  * (INT64 micros — Spark's non-legacy writer encoding, which wrote
  * these very files). */
class GroupParquetPartitionReader(path: String, schema: StructType,
    virtual: Map[String, Any] = Map.empty)
    extends PartitionReader[InternalRow] {

  private val reader = org.apache.parquet.hadoop.ParquetReader
    .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
      new org.apache.hadoop.fs.Path(path))
    .withConf(new org.apache.hadoop.conf.Configuration())
    .build()

  private var cur: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = {
    cur = reader.read()
    cur != null
  }

  private def value(g: org.apache.parquet.example.data.Group,
      name: String, dt: DataType): Any = {
    val gt = g.getType
    if (!gt.containsField(name)) return null
    val idx = gt.getFieldIndex(name)
    if (g.getFieldRepetitionCount(idx) == 0) return null // null cell
    dt match {
      case LongType | TimestampType => g.getLong(idx, 0)
      case IntegerType | DateType => g.getInteger(idx, 0)
      case ShortType => g.getInteger(idx, 0).toShort
      case ByteType => g.getInteger(idx, 0).toByte
      case DoubleType => g.getDouble(idx, 0)
      case FloatType => g.getFloat(idx, 0)
      case BooleanType => g.getBoolean(idx, 0)
      case StringType => UTF8String.fromString(g.getString(idx, 0))
      case other => throw new UnsupportedOperationException(
        s"graft group reader: unsupported column type $other for " +
          s"'$name'")
    }
  }

  override def get(): InternalRow = {
    val vals = schema.fields.map { f =>
      virtual.get(f.name) match {
        case Some(v) => v
        case None => value(cur, f.name, f.dataType)
      }
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
